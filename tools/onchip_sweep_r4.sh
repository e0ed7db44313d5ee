#!/bin/bash
# Round-4 on-chip battery: og re-sweep (env host cost dropped ~5x since the
# og=8 choice) + async chunk tuning toward the ~435 fps ceiling (VERDICT r3
# items 2 and 4). Run on an idle box — host/tunnel contention invalidates
# readings. Writes /tmp/r4_<name>.json + .log per stage.
cd "$(dirname "$0")/.." || exit 1
set -x
run() { name=$1; shift; timeout 2400 env "$@" python bench.py >/tmp/r4_${name}.json 2>/tmp/r4_${name}.log; echo "${name}: $(cat /tmp/r4_${name}.json)"; }

run og8    BENCH_OVERLAP_GROUPS=8
run og4    BENCH_OVERLAP_GROUPS=4
run og2    BENCH_OVERLAP_GROUPS=2
run og16   BENCH_OVERLAP_GROUPS=16
run async128 BENCH_ASYNC=1
run async64  BENCH_ASYNC=1 BENCH_ASYNC_CHUNK=64
run async32  BENCH_ASYNC=1 BENCH_ASYNC_CHUNK=32
echo DONE
