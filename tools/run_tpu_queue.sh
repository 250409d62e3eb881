#!/bin/bash
# Round-2c TPU measurement queue (BASELINE.md "queued TPU measurements").
# Run from /root/repo once the axon tunnel is back:
#   bash tools/run_tpu_queue.sh [outdir]
# One TPU process at a time (the tunnel serializes concurrent processes
# and corrupts timings); each step is timeout-capped and logs to outdir.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_queue}
mkdir -p "$OUT"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name (cap ${cap}s) ==="
  timeout "$cap" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "--- exit=$rc; tail:"; tail -5 "$OUT/$name.out"
  [ $rc -ne 0 ] && tail -3 "$OUT/$name.err"
  return 0
}

# 0. Tunnel sanity (fast fail if still down).
if ! timeout 300 python -c "import jax; assert jax.devices()[0].platform=='tpu'"; then
  echo "TPU still unreachable — aborting queue."; exit 1
fi

# 1. Scan-unroll sweep (the main remaining single-chip lever: phase
#    overlap; roofline floor is ~2x under serial).
run unroll 1800 python tools/probe_unroll.py --unrolls 1,2,4 --fused-k 32

# 2. Mosaic candidates incl. the new transposed-one-hot formulation C.
run pallas 1200 python tools/probe_pallas.py

# 3. Machine-model datapoint: 1 KiB paired gather rows.
run pair 1500 python tools/probe_pair.py

# 4. Headline bench (the driver's metric; records the honest vs-dense ratio).
run bench 1800 python bench.py --verbose

# 5. Targeted reruns of the graphs whose parted tile sizes changed
#    (gated exact chooser): yelp + proteins shapes.
run yelp 3600 python kernel_bench.py syn_yelp_shape --no-gnna --json "$OUT/yelp.json"
run proteins 3600 python kernel_bench.py syn_proteins_shape --no-gnna --json "$OUT/proteins.json"

# 6. Products shape (forward-heavy; validates the low-fill regime at scale).
run products 5400 python kernel_bench.py syn_products_shape --no-gnna --no-validate --json "$OUT/products.json"

echo "=== queue done; results under $OUT ==="
