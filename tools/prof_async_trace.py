"""Trace ONE steady-state async window (acts + woven update chunk programs)
and print the device-program composition: device busy vs window wall, and
per-program-class totals. This is the artifact behind the "headline is at
the device floor" claim: if busy% ~= 100 and the composition is act+update,
the remaining fps levers are device-time reductions only (PERFORMANCE.md
round-5 tail).

Run on the real chip (do not run concurrently with pytest on this 1-core box):

    python tools/prof_async_trace.py             # B=32 T=64 og=2 (half window)
    PROF_T=128 python tools/prof_async_trace.py  # full bench window
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

from safevla_tpu.config import Config
from safevla_tpu.algo.learner import Learner
from safevla_tpu.models.actor_critic import SafeVLAPolicy
from safevla_tpu.rollout.env_pool import EnvPool
from safevla_tpu.rollout.runner import RolloutRunner
from tests.test_rollout_training import make_sampler_factory

B = int(os.environ.get("PROF_B", "32"))
T = int(os.environ.get("PROF_T", "64"))
OG = int(os.environ.get("PROF_OG", "2"))

cfg = Config()
cfg.train.num_train_processes = B
cfg.ppo.num_steps = T
cfg.train.max_steps = 500
cfg.model.fusion_chunk = 128

policy = SafeVLAPolicy(cfg.model)
learner = Learner(policy, cfg)
ts = learner.init(jax.random.PRNGKey(0))
factory = make_sampler_factory(max_steps=100, image_hw=(224, 384))
pool = EnvPool(factory, num_streams=B, num_workers=0)
runner = RolloutRunner(policy, cfg, pool, seed=0, overlap_groups=OG)

state = {"it": None, "ts": ts, "result": None, "metrics": None}


def pump(it) -> bool:
    try:
        next(it)
        return False
    except StopIteration as stop:
        state["result"] = stop.value
        return True


pump_k = max(1, -(-learner.chunked_program_count(B, T) // T))


def iteration():
    tsl = state["ts"]
    it = state["it"]
    done = {"v": it is None}

    def interleave(t):
        for _ in range(pump_k):
            if done["v"]:
                break
            done["v"] = pump(it)

    params = {"towers": tsl.tower_params, **tsl.frozen_params}
    batch, stats = runner.collect(params, T, interleave_fn=interleave)
    if it is not None:
        while not done["v"]:
            done["v"] = pump(it)
        state["ts"], state["metrics"] = state["result"]
    state["it"] = learner.iter_chunked_update(
        state["ts"], batch, stats["mean_episode_cost"], 1
    )
    return stats


print("warmup (2 windows: compiles rollout, splice, chunk programs)...", flush=True)
iteration()
iteration()
if state["metrics"] is not None:
    float(state["metrics"]["total"])  # settle

t0 = time.time()
stats = iteration()
wall = time.time() - t0
print(f"steady window wall {wall:.2f}s -> {B*T/wall:.1f} fps", flush=True)

os.system("rm -rf /tmp/tr_async")
with jax.profiler.trace("/tmp/tr_async"):
    t0 = time.time()
    stats = iteration()
    # force the window's tail (the in-flight update drains NEXT window; the
    # trace covers this window's acts + the PREVIOUS window's woven update —
    # exactly the steady-state composition)
    float(state["metrics"]["total"]) if state["metrics"] is not None else None
    wall = time.time() - t0
print(f"traced window wall {wall:.2f}s -> {B*T/wall:.1f} fps", flush=True)

fns = glob.glob("/tmp/tr_async/plugins/profile/*/*.trace.json.gz")
with gzip.open(fns[0]) as f:
    tr = json.load(f)
ev = tr["traceEvents"]
tpu_pids = {
    e["pid"]
    for e in ev
    if e.get("ph") == "M"
    and e.get("name") == "process_name"
    and "TPU" in str(e.get("args", {}).get("name", ""))
}
agg = collections.defaultdict(lambda: [0.0, 0])
spans = []
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        nm = e.get("name", "?")
        dur = e.get("dur", 0)
        ts_ = e.get("ts", 0)
        spans.append((ts_, ts_ + dur, nm))
        a = agg[nm]
        a[0] += dur
        a[1] += 1

spans.sort()
busy = 0.0
t_end = 0.0
t_start = spans[0][0] if spans else 0.0
for s, e_, nm in spans:
    if e_ <= t_end:
        continue
    busy += e_ - max(s, t_end)
    t_end = e_
span_wall = (t_end - t_start) / 1e6 if spans else 0.0
print(
    f"\ndevice busy {busy/1e6:.2f}s over {span_wall:.2f}s device span, "
    f"{wall:.2f}s host wall ({100*busy/1e6/max(wall,1e-9):.0f}% of host wall)"
)
print("\ntop programs by device time:")
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]
for nm, (us, cnt) in rows:
    print(f"{us/1e3:9.1f} ms x{cnt:5d}  ({us/1e3/max(cnt,1):6.2f} ms/call)  {nm[:70]}")
pool.close()
