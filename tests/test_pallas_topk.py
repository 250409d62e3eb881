"""Pallas TopK kernels vs the XLA reference implementations.

Interpret-mode on CPU (Mosaic compilation is exercised on the TPU by
tools/probe_topk.py and the kernel benchmark harness).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand
from maxk_tpu.ops.maxk import maxk, maxk_mask
from maxk_tpu.ops.pallas_topk import (cbsr_topk_pallas, maxk_pallas,
                                      pallas_topk_supported)


def _rand(v, d, seed=0, ties=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(v, d)).astype(np.float32)
    if ties:
        # heavy ties incl. at the k boundary: quantize to few levels
        x = np.round(x * 2.0) / 2.0
    return jnp.asarray(x)


@pytest.mark.parametrize("k", [1, 8, 19, 32, 64, 128])
def test_cbsr_topk_pallas_matches_reference(k):
    x = _rand(700, 256, seed=k)
    v_ref, s_ref = cbsr_topk(x, k)
    v_p, s_p = cbsr_topk_pallas(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_p))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_p))


@pytest.mark.parametrize("k", [8, 32])
def test_cbsr_topk_pallas_ties(k):
    # quantized values force ties at the threshold; the expanded dense
    # result must match exactly (first-index tie breaking)
    x = _rand(600, 256, seed=7 + k, ties=True)
    v_ref, s_ref = cbsr_topk(x, k)
    v_p, s_p = cbsr_topk_pallas(x, k, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(cbsr_expand(v_ref, s_ref, 256)),
        np.asarray(cbsr_expand(v_p, s_p, 256)))
    # with first-index tie breaking the selectors themselves must agree
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_p))


def test_cbsr_topk_pallas_k_equals_d():
    x = _rand(300, 128, seed=3)
    v_p, s_p = cbsr_topk_pallas(x, 128, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_p),
                                  np.tile(np.arange(128), (300, 1)))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(x))


def test_cbsr_topk_pallas_negative_and_zero_rows():
    x = _rand(520, 256, seed=11)
    x = x.at[0].set(0.0)                      # all-zero row
    x = x.at[1].set(-jnp.abs(x[1]) - 1.0)     # all-negative row
    v_ref, s_ref = cbsr_topk(x, 16)
    v_p, s_p = cbsr_topk_pallas(x, 16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(cbsr_expand(v_ref, s_ref, 256)),
        np.asarray(cbsr_expand(v_p, s_p, 256)))


@pytest.mark.parametrize("k", [8, 32, 64])
def test_maxk_pallas_matches_reference(k):
    x = _rand(700, 256, seed=20 + k)
    y_ref = maxk(x, k)
    m_ref = maxk_mask(x, k)
    y_p, m_p = maxk_pallas(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_p))
    np.testing.assert_array_equal(np.asarray(m_ref),
                                  np.asarray(m_p).astype(np.float32))


def test_maxk_pallas_ties():
    x = _rand(600, 256, seed=77, ties=True)
    y_ref = maxk(x, 32)
    y_p, _ = maxk_pallas(x, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_p))


def test_supported_gate():
    x = _rand(64, 256)
    assert not pallas_topk_supported(x.astype(jnp.bfloat16), 32)
    assert not pallas_topk_supported(_rand(64, 200), 32)
    assert not pallas_topk_supported(x, 0)
    assert not pallas_topk_supported(x, 257)
    # on CPU test runs the backend gate is off unless forced
