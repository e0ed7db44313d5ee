"""Trace a short pipelined rollout window with jax.profiler and print the
device-program composition: per-program totals (ViT+act group-step program,
text encoder, splice) plus device busy vs wall. Run on the real chip:

    python tools/prof_rollout_trace.py           # T=32 steps, og=8
    PROF_T=64 PROF_OG=4 python tools/prof_rollout_trace.py
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

from safevla_tpu.config import Config
from safevla_tpu.models.actor_critic import SafeVLAPolicy
from safevla_tpu.rollout.env_pool import EnvPool
from safevla_tpu.rollout.runner import RolloutRunner
from tests.test_rollout_training import make_sampler_factory

B = int(os.environ.get("PROF_B", "32"))
T = int(os.environ.get("PROF_T", "32"))
OG = int(os.environ.get("PROF_OG", "8"))

cfg = Config()
cfg.train.num_train_processes = B
cfg.ppo.num_steps = T
cfg.model.fusion_chunk = 128

policy = SafeVLAPolicy(cfg.model)
params = policy.init_params(jax.random.PRNGKey(0))
factory = make_sampler_factory(max_steps=100, image_hw=(224, 384))
pool = EnvPool(factory, num_streams=B, num_workers=0)
runner = RolloutRunner(policy, cfg, pool, seed=0, overlap_groups=OG)

print("warmup window...", flush=True)
import time

batch, stats = runner.collect(params, T)
t0 = time.time()
batch, stats = runner.collect(params, T)
wall = time.time() - t0
print(f"window wall {wall:.2f}s rollout fps {stats['frames_per_second']:.0f}", flush=True)

os.system("rm -rf /tmp/tr_roll")
with jax.profiler.trace("/tmp/tr_roll"):
    batch, stats = runner.collect(params, T)
    # force the last act's results so the trace includes the tail
    float(batch["old_log_probs"][0, 0])

fns = glob.glob("/tmp/tr_roll/plugins/profile/*/*.trace.json.gz")
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

# device busy time: union of top-level spans (programs don't overlap on a chip)
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
print(f"\ndevice busy {busy/1e6:.2f}s over {span_wall:.2f}s span "
      f"({100*busy/1e6/max(span_wall,1e-9):.0f}% busy)")
print("\ntop programs by device time:")
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]
for nm, (us, cnt) in rows:
    print(f"{us/1e3:9.1f} ms x{cnt:5d}  ({us/1e3/max(cnt,1):6.2f} ms/call)  {nm[:70]}")
pool.close()
