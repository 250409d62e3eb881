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


# ---------------------------------------------------------------------------
# Pallas CBSR sampling (gather) kernel — ops.pallas_gather
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("v,d,k", [(500, 256, 64), (513, 128, 8),
                                   (1024, 256, 33), (100, 256, 96)])
def test_cbsr_gather_pallas_matches_take_along_axis(v, d, k):
    from maxk_tpu.ops.pallas_gather import cbsr_gather_pallas
    rng = np.random.default_rng(k)
    ds = rng.normal(size=(v, d)).astype(np.float32)
    sel = np.sort(rng.integers(0, d, size=(v, k)), axis=1).astype(np.int32)
    out = np.asarray(cbsr_gather_pallas(jnp.asarray(ds), jnp.asarray(sel),
                                        interpret=True))
    ref = np.take_along_axis(ds, sel.astype(np.int64), axis=1)
    np.testing.assert_array_equal(out, ref)


def test_cbsr_gather_pallas_matches_xla_formulation():
    """The TPU dispatch target must agree bit-for-bit with cbsr_gather's
    XLA formulation on real top-k selectors (unique per row)."""
    from maxk_tpu.ops.cbsr import cbsr_gather
    from maxk_tpu.ops.pallas_gather import cbsr_gather_pallas
    x = _rand(300, 256, seed=7)
    _, sel = cbsr_topk(x, 64)
    ds = _rand(300, 256, seed=8)
    out_x = np.asarray(cbsr_gather(ds, sel))
    out_p = np.asarray(cbsr_gather_pallas(ds, sel, interpret=True))
    np.testing.assert_array_equal(out_x, out_p)


def test_pallas_gather_supported_gate():
    from maxk_tpu.ops.pallas_gather import pallas_gather_supported
    ds = jnp.zeros((10, 256), jnp.float32)
    sel = jnp.zeros((10, 32), jnp.int32)
    on_tpu = jax.default_backend() == "tpu"
    assert pallas_gather_supported(ds, sel) == on_tpu
    assert not pallas_gather_supported(ds[:, :100], sel)      # D % 128
    assert not pallas_gather_supported(ds, sel.astype(jnp.int16))
    assert not pallas_gather_supported(ds.astype(jnp.float64), sel)
