#!/bin/bash
# TPU measurement queue (round 2e). Run from /root/repo when the axon
# tunnel is up:
#   bash tools/run_tpu_queue.sh [outdir]
# One TPU process at a time (the tunnel serializes concurrent processes
# and corrupts timings); each step is timeout-capped and logs to outdir.
#
# Round-2c/2d queue: DRAINED (results in BASELINE.md — unroll sweep,
# pallas candidates incl. C-F/G round 2e, headline bench, yelp/proteins
# reruns, products shape). Remaining items below.
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

# 1. suite24 traversal continuation: BENCH_SUITE24.json is written
#    incrementally smallest-first; a rerun re-measures from the start, so
#    raise the cap as wall-clock allows and keep the longest run's file.
run suite24 14400 python kernel_bench.py --suite24 --no-gnna --json BENCH_SUITE24.json

# 2. Headline bench (the driver's metric; honest vs-dense ratio).
run bench 1800 python bench.py --verbose

echo "=== queue done; results under $OUT ==="
