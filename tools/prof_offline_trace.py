"""Trace one offline BC step with jax.profiler and print the top device ops.

Round-4 probe behind the offline-MFU question (PERFORMANCE.md): bench_offline
reads ~21% of peak from XLA cost analysis, but the frozen-ViT study measured
the ViT forward itself at ~104 TFLOP/s — so either the step carries large
non-ViT time (augment? towers bwd? layout) or the accounting undercounts
(pallas custom calls report zero flops to XLA cost analysis). The kernel
table answers which. Reference workload: offline BC at 16 episodes x 50-step
windows, 2 cameras (reference training/offline/train_pl.py run config).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()
from safevla_tpu.config import Config
from safevla_tpu.training.offline import OfflineTrainer

B = int(os.environ.get("BENCH_BC_BATCH", "16"))
T = int(os.environ.get("BENCH_BC_WINDOW", "50"))

cfg = Config()
cfg.offline.per_device_batch_size = B
cfg.offline.sliding_window = T
trainer = OfflineTrainer(cfg)
state = trainer.init_state(jax.random.PRNGKey(0))

h, w = cfg.model.image_size
L = cfg.model.text_max_tokens
rng = np.random.default_rng(0)
batch = {
    "rgb_nav": jnp.asarray(rng.integers(0, 255, (B, T, h, w, 3)), jnp.uint8),
    "rgb_manip": jnp.asarray(rng.integers(0, 255, (B, T, h, w, 3)), jnp.uint8),
    "text_hidden": jnp.asarray(
        rng.normal(size=(B, L, cfg.model.text_embed_size)), jnp.float32
    ),
    "text_mask": jnp.ones((B, L), bool),
    "last_actions": jnp.zeros((B, T), jnp.int32),
    "an_object_is_in_hand": jnp.zeros((B, T), jnp.int32),
    "time_ids": jnp.tile(jnp.arange(T), (B, 1)),
    "actions": jnp.asarray(rng.integers(0, cfg.model.num_actions, (B, T)), jnp.int32),
}
from safevla_tpu.preprocessing.augment import identity_augment_params

aug = identity_augment_params()

print("warmup...", flush=True)
state, m = trainer._jit_step(state, batch, aug)
jax.block_until_ready(m["bc_loss"])
import time

t0 = time.perf_counter()
state, m = trainer._jit_step(state, batch, aug)
jax.block_until_ready(m["bc_loss"])
print(f"step: {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

os.system("rm -rf /tmp/tr_bc")
with jax.profiler.trace("/tmp/tr_bc"):
    state, m = trainer._jit_step(state, batch, aug)
    jax.block_until_ready(m["bc_loss"])

fns = glob.glob("/tmp/tr_bc/plugins/profile/*/*.trace.json.gz")
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
agg = collections.defaultdict(lambda: [0.0, 0, None])
total = 0.0
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        nm = e.get("name", "?")
        if nm.startswith(("while", "jit_", "1")):  # skip nesting parents
            continue
        a = agg[nm]
        a[0] += e.get("dur", 0)
        a[1] += 1
        total += e.get("dur", 0)
        if a[2] is None:
            a[2] = e.get("args", {})
print(f"device total: {total / 1e6:.3f} s")
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:35]
for nm, (us, cnt, args) in rows:
    extra = ""
    if args:
        keys = [k for k in ("long_name", "shape", "tf_op") if k in args]
        extra = " | " + "; ".join(str(args[k])[:130] for k in keys)
    print(f"{us / 1e3:9.1f} ms x{cnt:4d}  {nm[:60]}{extra}")
