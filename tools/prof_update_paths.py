"""Compare the monolithic scan update vs the chunked-program update on the
real chip, across (fwd_chunk, bwd_chunk) combinations. The chunked path
accumulates weight grads in donated buffers across programs instead of scan
carries, so it cannot hit the wgrad-spill that pinned fusion_chunk to 128.

    python tools/prof_update_paths.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

from safevla_tpu.config import Config
from safevla_tpu.algo.learner import Learner
from safevla_tpu.models.actor_critic import SafeVLAPolicy

B, T = 32, 128


def make_batch(cfg, rng):
    gh, gw = cfg.model.vision_grid
    L = cfg.model.text_max_tokens
    return {
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


def time_update(fn, iters=3):
    m = fn()  # warmup/compile
    float(m["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = fn()
    float(m["total"])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    only = os.environ.get("PROF_ONLY", "")

    if only in ("", "mono"):
        cfg = Config()
        cfg.train.num_train_processes = B
        cfg.ppo.num_steps = T
        cfg.model.fusion_chunk = 128
        policy = SafeVLAPolicy(cfg.model)
        learner = Learner(policy, cfg)
        ts = learner.init(jax.random.PRNGKey(0))
        batch = make_batch(cfg, rng)
        dt = time_update(lambda: learner.update(ts, batch, 1.0, 1)[1])
        print(f"monolithic fusion_chunk=128          {dt:7.3f} s", flush=True)

    for fwd_c, bwd_c in [(128, 64), (256, 128), (512, 128), (512, 256), (1024, 256)]:
        if only and only != f"{fwd_c},{bwd_c}":
            continue
        cfg = Config()
        cfg.train.num_train_processes = B
        cfg.ppo.num_steps = T
        cfg.model.fusion_chunk = fwd_c
        policy = SafeVLAPolicy(cfg.model)
        learner = Learner(policy, cfg)
        # override the derived chunking (flat-sample knobs -> time steps)
        learner.chunk_sizes = lambda bb, tt, f=fwd_c, b=bwd_c: (
            max(1, f // bb), max(1, b // bb),
        )
        ts = learner.init(jax.random.PRNGKey(0))
        batch = make_batch(cfg, rng)
        try:
            dt = time_update(lambda: learner.chunked_update(ts, batch, 1.0, 1)[1])
            print(f"chunked fwd={fwd_c:4d} bwd={bwd_c:4d}          {dt:7.3f} s", flush=True)
        except Exception as e:  # noqa: BLE001 - OOM probing
            print(f"chunked fwd={fwd_c:4d} bwd={bwd_c:4d}          FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
