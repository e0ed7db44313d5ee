"""Trace one monolithic update with jax.profiler and print the top device
ops with HLO metadata - the tool behind the wgrad-spill and attention
findings (PERFORMANCE.md). Works over the axon tunnel (device timeline
included)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import collections
import glob
import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()
from safevla_tpu.config import Config
from safevla_tpu.algo.learner import Learner
from safevla_tpu.models.actor_critic import SafeVLAPolicy

B, T = 32, 128
cfg = Config()
cfg.train.num_train_processes = B
cfg.ppo.num_steps = T
cfg.model.fusion_chunk = 128
policy = SafeVLAPolicy(cfg.model)
learner = Learner(policy, cfg)
ts = learner.init(jax.random.PRNGKey(0))

gh, gw = cfg.model.vision_grid
rng = np.random.default_rng(0)
L = cfg.model.text_max_tokens
batch = {
    "dino_nav": jnp.asarray(rng.normal(size=(B, T, gh, gw, cfg.model.vision_feature_dim)), jnp.bfloat16),
    "dino_manip": jnp.asarray(rng.normal(size=(B, T, gh, gw, cfg.model.vision_feature_dim)), jnp.bfloat16),
    "text_hidden": jnp.asarray(rng.normal(size=(B, L, cfg.model.text_embed_size)), jnp.float32),
    "text_mask": jnp.ones((B, L), bool),
    "prev_actions": jnp.zeros((B, T), jnp.int32),
    "not_reset": jnp.ones((B, T), jnp.int32),
    "object_in_hand": jnp.zeros((B, T), jnp.int32),
    "time_step": jnp.tile(jnp.arange(T), (B, 1)),
    "traj_idx": jnp.zeros((B, T), jnp.int32),
    "actions": jnp.asarray(rng.integers(0, cfg.model.num_actions, (B, T)), jnp.int32),
    "old_log_probs": jnp.full((B, T), -3.0),
    "rewards": jnp.asarray(rng.normal(size=(B, T)), jnp.float32),
    "costs": jnp.asarray(rng.integers(0, 2, (B, T)), jnp.float32),
    "values": jnp.zeros((B, T + 1)),
    "c_values": jnp.zeros((B, T + 1)),
    "masks": jnp.ones((B, T + 1)),
}
print("warmup...", flush=True)
ts2, m = learner.update(ts, batch, 1.0, 1)
print("total:", float(m["total"]), flush=True)

os.system("rm -rf /tmp/tr_u2")
with jax.profiler.trace("/tmp/tr_u2"):
    ts3, m = learner.update(ts2, batch, 1.0, 1)
    float(m["total"])

fns = glob.glob("/tmp/tr_u2/plugins/profile/*/*.trace.json.gz")
with gzip.open(fns[0]) as f:
    tr = json.load(f)
ev = tr["traceEvents"]
tpu_pids = {e["pid"] for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
agg = collections.defaultdict(lambda: [0.0, 0, None])
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        nm = e.get("name", "?")
        if nm.startswith(("while", "jit_", "1")):  # skip nesting parents
            continue
        a = agg[nm]
        a[0] += e.get("dur", 0)
        a[1] += 1
        if a[2] is None:
            a[2] = e.get("args", {})
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]
for nm, (us, cnt, args) in rows:
    extra = ""
    if args:
        keys = [k for k in ("long_name", "shape", "tf_op") if k in args]
        extra = " | " + "; ".join(str(args[k])[:140] for k in keys)
    print(f"{us/1e3:9.1f} ms x{cnt:4d}  {nm[:60]}{extra}")
