#!/bin/bash
# Full bench matrix on the real chip — the rows perf/RESULTS.md records.
# One python process per config, sequential (one chip session at a time;
# see the tunnel rules in perf/RESULTS.md).
#
# Usage: bash perf/chipbench.sh [quick]
#   quick = headline scenes only (cornell + terrain8k + terrain100k)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
export JAX_PLATFORMS=axon

run() { echo "=== $* ==="; env "$@" python -u bench.py 2>&1; }

run BENCH_SCENE=cornell
run BENCH_SCENE=terrain8k
run BENCH_SCENE=terrain100k
if [ "${1:-}" = "quick" ]; then exit 0; fi
run BENCH_SCENE=blob82k
run BENCH_SCENE=terrain330k                         # capacity: chunked sweep
run BENCH_SCENE=terrain500k
run BENCH_SCENE=terrain330k BENCH_BACKEND=cluster_streamed  # capacity A/B
run BENCH_SCENE=terrain8k   BENCH_SORT=1            # sort A/B (auto=off here)
run BENCH_SCENE=terrain100k BENCH_SORT=0            # sort A/B (auto=on here)
run BENCH_SCENE=terrain100k BENCH_WATERTIGHT=0      # leaky-MT A/B (auto=watertight here)
run BENCH_SCENE=cornell     BENCH_ESTIMATOR=pbrt    # physically-based rows
run BENCH_SCENE=terrain100k BENCH_ESTIMATOR=pbrt
run BENCH_SCENE=spheres     BENCH_ESTIMATOR=pbrt    # metal/dielectric scene
run BENCH_SCENE=terrain100k PYRENDERER_CLUSTER_IMPL=binned  # opt-in traversal A/B
