#!/usr/bin/env python
"""Mosaic-compilation experiments for the tile-reduce kernel.

Round-1 blocker: broadcasting a dynamically-selected (1, C) VMEM row
across sublanes ("Invalid relayout ... replicated in destination but not
in source"). Candidates here avoid that op:

A. vals/lrow delivered as (1, C//128, 128) BlockSpec blocks (one tile per
   grid step — no dynamic row select), one-hot built by broadcasting the
   (C//128, 128) block across a NEW LEADING dim (not across sublanes),
   contracted with dot_general over the two minor dims.
B. Same layout, but the one-hot matmul runs per 128-edge lane group with
   a (R, 128) compare (lrow lane-group broadcast across sublanes from a
   (8, 128)-aligned block).

Run from /root/repo on the TPU. Prints per-candidate compile/validate
results.
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_data(t_tiles=8, c=1024, r=128, d=256, v=4096, seed=0):
    rng = np.random.default_rng(seed)
    lrow = rng.integers(0, r + 1, size=(t_tiles, c)).astype(np.int32)
    vals = rng.uniform(0, 1, size=(t_tiles, c)).astype(np.float32)
    block = np.sort(rng.integers(0, 4, size=t_tiles)).astype(np.int32)
    xg = rng.normal(size=(t_tiles * c, d)).astype(np.float32)
    return (jnp.asarray(lrow), jnp.asarray(vals), jnp.asarray(block),
            jnp.asarray(xg))


def ref_out(lrow, vals, block, xg, r, n_blocks):
    t_tiles, c = lrow.shape
    d = xg.shape[1]
    out = np.zeros((n_blocks * r, d), np.float64)
    ln = np.asarray(lrow)
    vn = np.asarray(vals)
    bn = np.asarray(block)
    xn = np.asarray(xg, np.float64).reshape(t_tiles, c, d)
    for t in range(t_tiles):
        for e in range(c):
            if ln[t, e] < r:
                out[bn[t] * r + ln[t, e]] += vn[t, e] * xn[t, e]
    return out


def candidate_a(lrow, vals, block, xg, r, n_blocks, interpret=False):
    t_tiles, c = lrow.shape
    d = xg.shape[1]
    lrow3 = lrow.reshape(t_tiles, c // 128, 128)
    vals3 = vals.reshape(t_tiles, c // 128, 128)
    xg3 = xg.reshape(t_tiles, c, d)

    def kernel(blk_ref, lrow_ref, vals_ref, xg_ref, out_ref):
        t = pl.program_id(0)
        lr = lrow_ref[0]                       # (C//128, 128)
        vl = vals_ref[0].astype(jnp.bfloat16)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (r, c // 128, 128), 0)
        p = jnp.where(lr[None, :, :] == r_ids, vl[None, :, :],
                      jnp.zeros((), jnp.bfloat16))
        x = xg_ref[0].reshape(c // 128, 128, d).astype(jnp.bfloat16)
        t_out = jax.lax.dot_general(
            p, x, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)

        first = jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1])

        @pl.when(first)
        def _():
            out_ref[:] = t_out

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + t_out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, c // 128, 128), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c // 128, 128), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c, d), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda t, blk: (blk[t], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, d), jnp.float32),
        interpret=interpret,
    )(block, lrow3, vals3, xg3)


def candidate_b(lrow, vals, block, xg, r, n_blocks, interpret=False):
    t_tiles, c = lrow.shape
    d = xg.shape[1]
    lrow3 = lrow.reshape(t_tiles, c // 128, 128)
    vals3 = vals.reshape(t_tiles, c // 128, 128)
    xg3 = xg.reshape(t_tiles, c, d)

    def kernel(blk_ref, lrow_ref, vals_ref, xg_ref, out_ref):
        t = pl.program_id(0)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 0)

        def body(i, acc):
            lr = lrow_ref[0, i]                # (128,) lane vector
            vl = vals_ref[0, i].astype(jnp.bfloat16)
            p = jnp.where(lr[None, :] == r_ids, vl[None, :],
                          jnp.zeros((), jnp.bfloat16))     # (R, 128)
            x = xg_ref[0, pl.ds(i * 128, 128), :].astype(jnp.bfloat16)
            return acc + jnp.dot(p, x, preferred_element_type=jnp.float32)

        t_out = jax.lax.fori_loop(0, c // 128, body,
                                  jnp.zeros((r, d), jnp.float32))

        first = jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1])

        @pl.when(first)
        def _():
            out_ref[:] = t_out

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + t_out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, c // 128, 128), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c // 128, 128), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c, d), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda t, blk: (blk[t], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, d), jnp.float32),
        interpret=interpret,
    )(block, lrow3, vals3, xg3)


def candidate_c(lrow, vals, block, xg, r, n_blocks, interpret=False,
                transpose_in_kernel=False, sub=256):
    """Transposed one-hot: edge dim in SUBLANES throughout.

    Tile metadata is delivered pre-transposed as (C, T) so the per-tile
    column lrow_t[:, t] is a natural (C, 1) sublane-major VMEM block —
    broadcasting it across LANES to (C_sub, R) is the supported relayout
    direction (the round-1/2 blockers all replicated lanes into
    sublanes). The one-hot P is built transposed (E, R) and contracted
    with xg (E, D) over the sublane dim:
      - transpose_in_kernel=False: dot_general contracting dim 0 of both;
      - transpose_in_kernel=True: explicit transpose to (R, E) + plain dot.
    """
    t_tiles, c = lrow.shape
    d = xg.shape[1]
    lrow_t = lrow.T.reshape(c, t_tiles)        # (C, T) sublane-major edges
    vals_t = vals.T.reshape(c, t_tiles)
    xg3 = xg.reshape(t_tiles, c, d)

    def kernel(blk_ref, lrow_ref, vals_ref, xg_ref, out_ref):
        t = pl.program_id(0)

        def body(i, acc):
            sl = pl.ds(i * sub, sub)
            lr = lrow_ref[sl, :]               # (sub, 1)
            vl = vals_ref[sl, :].astype(jnp.bfloat16)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (sub, r), 1)
            p_t = jnp.where(jnp.broadcast_to(lr, (sub, r)) == r_ids,
                            jnp.broadcast_to(vl, (sub, r)),
                            jnp.zeros((), jnp.bfloat16))      # (sub, R)
            x = xg_ref[0, sl, :].astype(jnp.bfloat16)          # (sub, D)
            if transpose_in_kernel:
                p = jax.lax.transpose(p_t, (1, 0))             # (R, sub)
                return acc + jnp.dot(p, x,
                                     preferred_element_type=jnp.float32)
            return acc + jax.lax.dot_general(
                p_t, x, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        t_out = jax.lax.fori_loop(0, c // sub, body,
                                  jnp.zeros((r, d), jnp.float32))

        first = jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1])

        @pl.when(first)
        def _():
            out_ref[:] = t_out

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + t_out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((c, 1), lambda t, blk: (0, t)),
            pl.BlockSpec((c, 1), lambda t, blk: (0, t)),
            pl.BlockSpec((1, c, d), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda t, blk: (blk[t], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, d), jnp.float32),
        interpret=interpret,
    )(block, lrow_t, vals_t, xg3)


def candidate_d(lrow, vals, block, xg, r, n_blocks, interpret=False,
                sub=256):
    """3-D metadata blocks: (T, C, 1) arrays with (1, c, 1) BlockSpecs.

    Candidate C's (c, 1) block over a (C, T) array violates the Mosaic
    block rule (last dim must be 128-divisible or equal the full array
    dim). Storing the metadata as (T, C, 1) makes the trailing dim of the
    BLOCK equal the trailing dim of the ARRAY (both 1), so the block is
    legal, and lrow_ref[0] is natively a (C, 1) sublane-major column —
    the broadcast to (sub, R) is in the LANE direction, the relayout
    every prior failure avoided. Costs a 128x lane-padding blowup on the
    metadata streams (HBM tiling pads the size-1 lane dim), so this is a
    compile-feasibility probe, not a production layout.
    """
    t_tiles, c = lrow.shape
    d = xg.shape[1]
    lrow3 = lrow.reshape(t_tiles, c, 1)
    vals3 = vals.reshape(t_tiles, c, 1)
    xg3 = xg.reshape(t_tiles, c, d)

    def kernel(blk_ref, lrow_ref, vals_ref, xg_ref, out_ref):
        t = pl.program_id(0)

        def body(i, acc):
            sl = pl.ds(i * sub, sub)
            lr = lrow_ref[0, sl, :]                        # (sub, 1)
            vl = vals_ref[0, sl, :].astype(jnp.bfloat16)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (sub, r), 1)
            p_t = jnp.where(jnp.broadcast_to(lr, (sub, r)) == r_ids,
                            jnp.broadcast_to(vl, (sub, r)),
                            jnp.zeros((), jnp.bfloat16))   # (sub, R)
            x = xg_ref[0, sl, :].astype(jnp.bfloat16)      # (sub, D)
            return acc + jax.lax.dot_general(
                p_t, x, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        t_out = jax.lax.fori_loop(0, c // sub, body,
                                  jnp.zeros((r, d), jnp.float32))

        first = jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1])

        @pl.when(first)
        def _():
            out_ref[:] = t_out

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + t_out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, c, 1), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c, 1), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c, d), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda t, blk: (blk[t], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, d), jnp.float32),
        interpret=interpret,
    )(block, lrow3, vals3, xg3)


def candidate_e(lrow, vals, block, xg, r, n_blocks, interpret=False):
    """Scalar-compare one-hot assembly: no broadcast relayout at all.

    P is built row by row — P[q, :] = where(lrow == q, vals, 0), a lane-
    wise compare of the (1, C) metadata row against the SCALAR loop index
    (scalar broadcasts are always legal), written into a VMEM (R, C)
    scratch with a dynamic SUBLANE update (the supported slice direction).
    Then one natural (R, C) @ (C, D) MXU matmul per tile. Construction is
    R vector-op iterations per tile; the matmul orientation and every
    operand layout are native, so nothing relayouts.
    """
    t_tiles, c = lrow.shape
    d = xg.shape[1]

    def kernel(blk_ref, lrow_ref, vals_ref, xg_ref, out_ref, p_ref):
        t = pl.program_id(0)
        lr = lrow_ref[pl.ds(t, 1), :]                      # (1, C)
        vl = vals_ref[pl.ds(t, 1), :].astype(jnp.bfloat16)

        def fill(q, _):
            row = jnp.where(lr == q, vl, jnp.zeros((), jnp.bfloat16))
            p_ref[pl.ds(q, 1), :] = row
            return 0

        jax.lax.fori_loop(0, r, fill, 0)
        x = xg_ref[0].astype(jnp.bfloat16)                 # (C, D)
        t_out = jnp.dot(p_ref[:, :], x,
                        preferred_element_type=jnp.float32)

        first = jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1])

        @pl.when(first)
        def _():
            out_ref[:] = t_out

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + t_out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((t_tiles, c), lambda t, blk: (0, 0)),
            pl.BlockSpec((t_tiles, c), lambda t, blk: (0, 0)),
            pl.BlockSpec((1, c, d), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda t, blk: (blk[t], 0)),
        scratch_shapes=[pltpu.VMEM((r, c), jnp.bfloat16)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, d), jnp.float32),
        interpret=interpret,
    )(block, lrow, vals, xg.reshape(t_tiles, c, d))


def candidate_f(lrow, vals, block, xg, r, n_blocks, interpret=False,
                sub=256):
    """Lane-8 metadata replication: (T, C, 8) arrays, (1, c, 8) blocks.

    Candidate D's (.., 1) trailing block dim crashed the remote compiler
    (tpu_compile_helper exit 1, diagnostic swallowed by the tunnel); 8 is
    the native sublane count, so (sub, 8) slices may avoid whatever the
    size-1 lane tiling hit. Metadata is host-replicated 8x across lanes
    (compile-feasibility probe only — the 8x metadata HBM traffic rules
    it out for production regardless).
    """
    t_tiles, c = lrow.shape
    d = xg.shape[1]
    lrow8 = jnp.broadcast_to(lrow[:, :, None], (t_tiles, c, 8))
    vals8 = jnp.broadcast_to(vals[:, :, None], (t_tiles, c, 8))
    xg3 = xg.reshape(t_tiles, c, d)

    def kernel(blk_ref, lrow_ref, vals_ref, xg_ref, out_ref):
        t = pl.program_id(0)

        def body(i, acc):
            sl = pl.ds(i * sub, sub)
            lr = lrow_ref[0, sl, 0:1]                      # (sub, 1)
            vl = vals_ref[0, sl, 0:1].astype(jnp.bfloat16)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (sub, r), 1)
            p_t = jnp.where(jnp.broadcast_to(lr, (sub, r)) == r_ids,
                            jnp.broadcast_to(vl, (sub, r)),
                            jnp.zeros((), jnp.bfloat16))   # (sub, R)
            x = xg_ref[0, sl, :].astype(jnp.bfloat16)      # (sub, D)
            return acc + jax.lax.dot_general(
                p_t, x, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        t_out = jax.lax.fori_loop(0, c // sub, body,
                                  jnp.zeros((r, d), jnp.float32))

        first = jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1])

        @pl.when(first)
        def _():
            out_ref[:] = t_out

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + t_out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, c, 8), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c, 8), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((1, c, d), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda t, blk: (blk[t], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, d), jnp.float32),
        interpret=interpret,
    )(block, jnp.asarray(lrow8), jnp.asarray(vals8), xg3)


def candidate_g(lrow, vals, block, xg, r, n_blocks, interpret=False,
                sub=256):
    """Candidate C with a LEGAL full-array metadata block: (C, T) arrays
    delivered whole ((c, t_tiles) block == array dims), the tile column
    selected in-kernel by a dynamic LANE slice pl.ds(t, 1). Probes
    whether Mosaic accepts dynamic lane-dim indexing where the dynamic
    SUBLANE row select of round 1 relayout-failed."""
    t_tiles, c = lrow.shape
    d = xg.shape[1]
    lrow_t = lrow.T.reshape(c, t_tiles)
    vals_t = vals.T.reshape(c, t_tiles)
    xg3 = xg.reshape(t_tiles, c, d)

    def kernel(blk_ref, lrow_ref, vals_ref, xg_ref, out_ref):
        t = pl.program_id(0)

        def body(i, acc):
            sl = pl.ds(i * sub, sub)
            lr = lrow_ref[sl, pl.ds(t, 1)]                 # (sub, 1) dyn lane
            vl = vals_ref[sl, pl.ds(t, 1)].astype(jnp.bfloat16)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (sub, r), 1)
            p_t = jnp.where(jnp.broadcast_to(lr, (sub, r)) == r_ids,
                            jnp.broadcast_to(vl, (sub, r)),
                            jnp.zeros((), jnp.bfloat16))
            x = xg_ref[0, sl, :].astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(
                p_t, x, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        t_out = jax.lax.fori_loop(0, c // sub, body,
                                  jnp.zeros((r, d), jnp.float32))

        first = jnp.logical_or(t == 0, blk_ref[t] != blk_ref[t - 1])

        @pl.when(first)
        def _():
            out_ref[:] = t_out

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + t_out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((c, t_tiles), lambda t, blk: (0, 0)),
            pl.BlockSpec((c, t_tiles), lambda t, blk: (0, 0)),
            pl.BlockSpec((1, c, d), lambda t, blk: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda t, blk: (blk[t], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, d), jnp.float32),
        interpret=interpret,
    )(block, jnp.asarray(lrow_t), jnp.asarray(vals_t), xg3)


def main():
    import signal

    r, n_blocks = 128, 4
    lrow, vals, block, xg = make_data(r=r)
    ref = ref_out(lrow, vals, block, xg, r, n_blocks)

    def handler(signum, frame):
        raise TimeoutError("compile/run exceeded 150s")

    signal.signal(signal.SIGALRM, handler)
    for name, fn in (("F_lane8_metadata", candidate_f),
                     ("G_dynamic_lane_slice", candidate_g),
                     ("E_scalar_onehot_rows", candidate_e),
                     ("D_3d_metadata_lanebcast", candidate_d),
                     ("C_transposed_dotgen", candidate_c),
                     ("C_transposed_explicitT", functools.partial(
                         candidate_c, transpose_in_kernel=True)),
                     ("B_lanegroup_128", candidate_b),
                     ("A_lead_bcast_dotgen", candidate_a)):
        signal.alarm(150)
        try:
            out = np.asarray(
                jax.jit(functools.partial(fn, r=r, n_blocks=n_blocks))(
                    lrow, vals, block, xg))
            err = np.abs(out - ref).max() / max(1.0, np.abs(ref).mean())
            print(f"{name}: COMPILES, max_rel_err={err:.2e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAILS — {type(e).__name__}: {msg}", flush=True)
        finally:
            signal.alarm(0)


if __name__ == "__main__":
    main()
