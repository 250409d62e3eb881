"""Trace the composed backward at k=64 and print the top device ops.

All structural hypotheses for the products k=64 composed cliff are
measured dead (probe_bwd_cliff2/4/5/6: chunking, barriers, padding,
output grouping, single opaque Pallas consumer). This captures a
jax.profiler trace of one composed execution and aggregates device-
plane event durations from the raw xplane proto — no tensorboard UI.

Usage: python tools/probe_bwd_trace.py [graph=s24_ogbn_products] [k=64]
"""

import collections
import glob
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from maxk_tpu.bench.harness import synthetic_by_name
from maxk_tpu.ops.graph import build_tiled_graph
from maxk_tpu.ops.spgemm import sspmm_sampled


def dump_top_ops(trace_dir, top=25):
    from xprof.protobuf import xplane_pb2
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print(f"xplane files: {paths}", flush=True)
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            agg = collections.Counter()
            cnt = collections.Counter()
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name] += ev.duration_ps / 1e9   # -> ms
                    cnt[name] += 1
            total = sum(agg.values())
            print(f"\n== plane {plane.name}: total {total:.1f} ms "
                  f"(sum over lines; overlap double-counts)", flush=True)
            for name, ms in agg.most_common(top):
                print(f"  {ms:10.2f} ms  x{cnt[name]:<6d} {name[:110]}")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "s24_ogbn_products"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim = 256
    csr = synthetic_by_name(name)
    rng = np.random.default_rng(123)
    csr = csr.with_values(
        rng.uniform(0.0, 1.0, size=csr.n_edges).astype(np.float32))
    print(f"{name}: V={csr.n_nodes} E={csr.n_edges} k={k}", flush=True)
    t0 = time.time()
    g_t = build_tiled_graph(csr.transpose())
    print(f"tile g_t: {time.time() - t0:.1f} s", flush=True)
    dy = jnp.asarray(rng.uniform(size=(csr.n_nodes, dim)).astype(np.float32))
    sel = jnp.asarray(np.sort(
        rng.integers(0, dim, size=(csr.n_nodes, k)), axis=1).astype(np.int32))

    jit_bwd = jax.jit(sspmm_sampled)
    jax.block_until_ready(jit_bwd(g_t, dy, sel))     # compile + warm
    t0 = time.time()
    jax.block_until_ready(jit_bwd(g_t, dy, sel))
    print(f"warm run: {(time.time() - t0) * 1e3:.1f} ms", flush=True)

    trace_dir = f"/tmp/bwd_trace_{name}_{k}"
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(jit_bwd(g_t, dy, sel))
    print("trace captured", flush=True)
    dump_top_ops(trace_dir)


if __name__ == "__main__":
    main()
