#!/bin/bash
# Round-3/4 on-chip measurement battery for the landed-but-unmeasured levers
# (PERFORMANCE.md "Round 3 tail"). Run on an idle box — host/tunnel contention
# invalidates readings (see memory note axon-bench-variance).
#
# Each stage writes /tmp/sweep_<name>.json (the bench JSON line) and
# /tmp/sweep_<name>.log (full stderr incl. the per-window breakdown).
cd "$(dirname "$0")/.." || exit 1
set -x
run() { name=$1; shift; timeout 2400 env "$@" python bench.py >/tmp/sweep_${name}.json 2>/tmp/sweep_${name}.log; echo "${name}: $(cat /tmp/sweep_${name}.json)"; }

# 0. baseline of the new tree (scan-stacked towers, pad-once layouts, median fps)
run base_og8 BENCH_OVERLAP_GROUPS=8

# 1. dispatch-overhead model on axon (leaf-count marshaling cost)
timeout 900 python tools/prof_dispatch.py --calls 150 >/tmp/sweep_dispatch.log 2>&1

# 2. merged fetch A/B at og=8
run mf1_og8 SAFEVLA_MERGED_FETCH=1 BENCH_OVERLAP_GROUPS=8
# 3. og=4 with and without merged fetch (leaf fix may shift the og optimum)
run mf1_og4 SAFEVLA_MERGED_FETCH=1 BENCH_OVERLAP_GROUPS=4
run mf0_og4 SAFEVLA_MERGED_FETCH=0 BENCH_OVERLAP_GROUPS=4
# 4. scan vs unrolled lowering for the stacked layers (device-time A/B)
run unroll_both SAFEVLA_VIT_UNROLL=1 SAFEVLA_TOWER_UNROLL=1 SAFEVLA_MERGED_FETCH=1
# 5. async re-check: default chunk, then finer async chunk
run async128 BENCH_ASYNC=1 SAFEVLA_MERGED_FETCH=1
run async32  BENCH_ASYNC=1 SAFEVLA_MERGED_FETCH=1 BENCH_ASYNC_CHUNK=32
# 6. device traces for the NEXT lever hunt (update op table + rollout/ViT)
timeout 1800 python tools/prof_update_trace.py  >/tmp/sweep_update_trace.log 2>&1
timeout 1800 python tools/prof_vit.py           >/tmp/sweep_vit.log 2>&1
# 7. offline BC number for the round record
timeout 2400 python bench_offline.py >/tmp/sweep_offline.json 2>/tmp/sweep_offline.log
echo DONE
