"""Probe: TopK->CBSR formulations on TPU v5e.

The round-2 record has topk->cbsr (lax.top_k + co-sort) at 6.0 ms for
V=131k, D=256, k=32 — a 134 MB input, i.e. ~37x off the HBM streaming
bound. lax.top_k lowers to a full per-row sort on TPU. Candidates:

  A. lax.top_k + co-sort             (production today, cbsr_topk)
  B. lax.approx_max_k(recall=1.0) + co-sort
     TPU PartialReduce op; recall_target=1.0 requests exact results.
  C. threshold via f32-bitspace binary search (pure XLA)
     key = monotone int32 remap of f32; 32 iterations of
     count(key > thr) per row; mask = (key > t) | first-(k-cnt) ties.
     Produces the MASK (maxk nonlinearity) without any sort.
  D. C + compaction to CBSR via cumsum-position compare-reduce.

Each candidate is validated against A (exact match required on the
expanded dense result; tie sets may differ between A and B/C only when
equal values straddle the k boundary — counted separately).

Run: python tools/probe_topk.py [--v 131072] [--d 256]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=131072)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--ks", type=int, nargs="*", default=[8, 16, 32, 64])
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import os
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from maxk_tpu.bench.timing import time_fn
    from maxk_tpu.ops.cbsr import cbsr_topk, cbsr_expand

    rng = np.random.default_rng(123)
    x = jnp.asarray(rng.uniform(0, 1, (args.v, args.d)).astype(np.float32))
    print(f"x: {x.shape} on {jax.devices()[0].platform}", flush=True)

    # --- candidates -------------------------------------------------------
    def topk_a(x, k):
        return cbsr_topk(x, k)

    def topk_b(x, k):
        vals, idx = jax.lax.approx_max_k(x, k, recall_target=1.0,
                                         aggregate_to_topk=True)
        selector, values = jax.lax.sort((idx.astype(jnp.int32), vals),
                                        dimension=1, num_keys=1)
        return values, selector

    def _sortable(x):
        b = jax.lax.bitcast_convert_type(x, jnp.uint32)
        # standard radix-sort float key: order-exact monotone uint32 remap
        return jnp.where(b >= jnp.uint32(0x80000000), ~b,
                         b | jnp.uint32(0x80000000))

    def thresh_mask(x, k):
        """Exact top-k mask via 32-step bitwise descent for the k-th
        largest key + first-m tie selection."""
        key = _sortable(x)                              # (V, D) uint32
        t = jnp.zeros((x.shape[0], 1), jnp.uint32)

        # greedy MSB-first: largest t with count(key >= t) >= k == a_k
        def body(i, t):
            cand = t | (jnp.uint32(1) << (jnp.uint32(31) - i))
            cnt = jnp.sum((key >= cand).astype(jnp.int32), axis=1,
                          keepdims=True)
            return jnp.where(cnt >= k, cand, t)
        t = jax.lax.fori_loop(jnp.uint32(0), jnp.uint32(32), body, t)
        gt = key > t
        n_gt = jnp.sum(gt.astype(jnp.int32), axis=1, keepdims=True)
        tie = key == t
        # first (k - n_gt) ties by column index: inclusive cumsum along D
        cum = jnp.cumsum(tie.astype(jnp.int32), axis=1)
        mask = gt | (tie & (cum <= (k - n_gt)))
        return mask

    def topk_c_mask(x, k):
        return thresh_mask(x, k).astype(x.dtype) * x

    def topk_d(x, k):
        mask = thresh_mask(x, k)
        pos = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # 1..k at kept
        lidx = jnp.arange(1, k + 1, dtype=jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
        vals = []
        sels = []
        pk = jnp.where(mask, pos, jnp.int32(0))
        for l in range(k):
            hit = pk == (l + 1)
            vals.append(jnp.sum(jnp.where(hit, x, 0.0), axis=1))
            sels.append(jnp.sum(jnp.where(hit, iota, 0), axis=1))
        return jnp.stack(vals, 1), jnp.stack(sels, 1)

    def mask_a(x, k):
        from maxk_tpu.ops.maxk import maxk
        return maxk(x, k)

    from maxk_tpu.ops.pallas_topk import cbsr_topk_pallas, maxk_pallas

    for k in args.ks:
        ja = jax.jit(topk_a, static_argnames="k")
        jb = jax.jit(topk_b, static_argnames="k")
        jc = jax.jit(topk_c_mask, static_argnames="k")
        jd = jax.jit(topk_d, static_argnames="k")
        jm = jax.jit(mask_a, static_argnames="k")
        # Validation runs inside ONE jit per candidate: eager expand would
        # dispatch k distinct ops over the remote tunnel (minutes of
        # compile round-trips).
        @jax.jit
        def _err_cbsr(va, sa, vb, sb):
            return jnp.max(jnp.abs(cbsr_expand(va, sa, args.d)
                                   - cbsr_expand(vb, sb, args.d)))

        @jax.jit
        def _err_dense(va, sa, y):
            return jnp.max(jnp.abs(cbsr_expand(va, sa, args.d) - y))

        va, sa = jax.block_until_ready(ja(x, k=k))
        print(f"k={k}: A done", flush=True)
        vb, sb = jax.block_until_ready(jb(x, k=k))
        xc = jax.block_until_ready(jc(x, k=k))
        vd, sd = jax.block_until_ready(jd(x, k=k))
        xm = jax.block_until_ready(jm(x, k=k))
        print(f"k={k}: all XLA candidates compiled", flush=True)
        errs = dict(
            b=float(_err_cbsr(va, sa, vb, sb)),
            c=float(_err_dense(va, sa, xc)),
            d=float(_err_cbsr(va, sa, vd, sd)),
            m=float(_err_dense(va, sa, xm)),
        )
        ta = time_fn(lambda: ja(x, k=k))
        tb = time_fn(lambda: jb(x, k=k))
        tc = time_fn(lambda: jc(x, k=k))
        td = time_fn(lambda: jd(x, k=k))
        tm = time_fn(lambda: jm(x, k=k))
        print(f"k={k:3d}  A top_k+sort {ta.mean_ms:7.2f} ms | "
              f"B approx_max_k {tb.mean_ms:7.2f} ms | "
              f"C thresh-mask {tc.mean_ms:7.2f} ms | "
              f"D thresh-cbsr {td.mean_ms:7.2f} ms | "
              f"maxk(prod) {tm.mean_ms:7.2f} ms | errs {errs}",
              flush=True)

        # Pallas kernels (Mosaic compile attempt; errors reported, not fatal)
        for name, fn in (("E pallas-cbsr", lambda: cbsr_topk_pallas(x, k)),
                         ("F pallas-maxk", lambda: maxk_pallas(x, k))):
            try:
                out = jax.block_until_ready(fn())
                if name.startswith("E"):
                    err = float(_err_cbsr(va, sa, out[0], out[1]))
                else:
                    err = float(_err_dense(va, sa, out[0]))
                te = time_fn(fn)
                print(f"        {name} {te.mean_ms:7.2f} ms | err {err}",
                      flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:200]
                print(f"        {name} FAILED: {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
