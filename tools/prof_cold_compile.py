"""Cold-start compile breakdown (VERDICT r2 item 9).

Times each production program's lowering+compilation with the persistent
cache DISABLED, to show where the bench's multi-minute cold warmup goes and
which programs dominate. Run on the real chip (compiles are server-side over
the axon tunnel).

Programs timed (the training path's full set):
  rollout_step   — frame gather + augment + ViT(2 cams) + 3-tower act + scatter
  encode_text    — frozen T5 over one stream group
  splice         — window-boundary scratch row splice
  update         — monolithic 4-epoch PPO update (stage 1)
  update_stage0  — critic-warmup variant (second compile of the same tree)
  chunk programs — the async pipeline's split set (prepare/fusion/decoder/...)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

# NO persistent cache: we want true cold numbers
from safevla_tpu.config import Config
from safevla_tpu.algo.learner import Learner
from safevla_tpu.models.actor_critic import SafeVLAPolicy


def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt:7.1f} s", flush=True)
    return out


B = int(os.environ.get("BENCH_STREAMS", "32"))
T = int(os.environ.get("BENCH_NUM_STEPS", "128"))
G = B // int(os.environ.get("BENCH_OVERLAP_GROUPS", "8"))

cfg = Config()
cfg.train.num_train_processes = B
cfg.ppo.num_steps = T
cfg.train.max_steps = 500

policy = SafeVLAPolicy(cfg.model)
learner = Learner(policy, cfg)
ts = t("init_params (jit+run)", lambda: learner.init(jax.random.PRNGKey(0)))

gh, gw = cfg.model.vision_grid
h, w = cfg.model.image_size
L = cfg.model.text_max_tokens
Dv = cfg.model.vision_feature_dim

# rollout act program at the bench's group width
from safevla_tpu.rollout.env_pool import EnvPool
from safevla_tpu.rollout.runner import RolloutRunner, _N_COLS, _N_META
from tests.test_rollout_training import make_sampler_factory

pool = EnvPool(
    make_sampler_factory(max_steps=100, image_hw=(h, w)), num_streams=B, num_workers=0
)
runner = RolloutRunner(policy, cfg, pool, seed=0, overlap_groups=B // G)
params = {"towers": ts.tower_params, **ts.frozen_params}
runner._params_cache = params

state = runner.states[0]
storage = runner._alloc_storage(T)
bank = jnp.zeros((runner.frame_bank_slots, h, w, 3), jnp.uint8)
packed = jnp.zeros((G * _N_COLS + _N_META,), jnp.int32)
from safevla_tpu.preprocessing.augment import identity_augment_params

aug = identity_augment_params()

t(
    "rollout_step (lower+compile)",
    lambda: runner._jit_rollout_step.lower(
        params, state, storage, bank, packed, aug
    ).compile(),
)
tokens = jnp.zeros((G, L), jnp.int32)
mask = jnp.ones((G, L), bool)
t(
    "encode_text (lower+compile)",
    lambda: runner._jit_encode_text.lower(params, tokens, mask).compile(),
)
scratch = runner._alloc_storage(1, width=G)
t(
    "splice (lower+compile)",
    lambda: runner._jit_splice.lower(storage, scratch, 0).compile(),
)

rng = np.random.default_rng(0)
batch = {
    "dino_nav": jnp.zeros((B, T, gh, gw, Dv), jnp.bfloat16),
    "dino_manip": jnp.zeros((B, T, gh, gw, Dv), jnp.bfloat16),
    "text_hidden": jnp.zeros((B, runner.E, L, cfg.model.text_embed_size), jnp.bfloat16),
    "text_mask": jnp.ones((B, runner.E, L), bool),
    "text_idx": jnp.zeros((B, T), jnp.int32),
    "prev_actions": jnp.zeros((B, T), jnp.int32),
    "not_reset": jnp.ones((B, T), jnp.int32),
    "object_in_hand": jnp.zeros((B, T), jnp.int32),
    "time_step": jnp.tile(jnp.arange(T), (B, 1)),
    "traj_idx": jnp.zeros((B, T), jnp.int32),
    "actions": jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32),
    "old_log_probs": jnp.full((B, T), -3.0, jnp.float32),
    "expert_pickupable": jnp.zeros((B, T), jnp.int32),
    "rewards": jnp.zeros((B, T), jnp.float32),
    "costs": jnp.zeros((B, T), jnp.float32),
    "values": jnp.zeros((B, T + 1), jnp.float32),
    "c_values": jnp.zeros((B, T + 1), jnp.float32),
    "masks": jnp.ones((B, T + 1), jnp.float32),
}
cost = jnp.asarray(2.0, jnp.float32)

for stage, label in [(1, "update stage1"), (0, "update stage0")]:
    key = min(stage, len(learner.stage_specs) - 1)
    fn = learner._update_fns.get(key)
    if fn is None:
        fn = learner._make_update(key)
        learner._update_fns[key] = fn
    t(f"{label} (lower+compile)", lambda fn=fn: fn.lower(ts, batch, cost).compile())

# async chunk programs: count + compile wall for the whole set
t0 = time.perf_counter()
it = learner.iter_chunked_update(ts, batch, cost, 1)
n = 0
try:
    while True:
        next(it)
        n += 1
except StopIteration as stop:
    ts2, metrics = stop.value
float(metrics["total"])
print(f"{'async chunk set (' + str(n) + ' programs)':28s} {time.perf_counter()-t0:7.1f} s", flush=True)
pool.close()
print("done")
