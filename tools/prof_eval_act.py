"""Decompose the eval act step (bench_eval.py): upload vs compute vs fetch.

Run on the real chip: python tools/prof_eval_act.py
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
from safevla_tpu.evaluation.agent import InferenceAgent

B = int(os.environ.get("PROF_STREAMS", "8"))
STEPS = int(os.environ.get("PROF_STEPS", "32"))
cfg = Config()
agent = InferenceAgent.build(cfg, None, num_streams=B, mode="greedy")
agent.set_instructions(["locate a vase and go to it"] * B)

h, w = cfg.model.image_size
rng = np.random.default_rng(0)
nav = rng.integers(0, 255, (B, h, w, 3), dtype=np.uint8)
manip = rng.integers(0, 255, (B, h, w, 3), dtype=np.uint8)
packed = np.concatenate([nav, manip], axis=0)
not_reset = np.ones(B, np.int32)
oih = np.zeros(B, np.int32)

# warm everything
agent.act(nav, manip, not_reset, oih)


def timeit(name, fn, iters=STEPS):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


timeit("full act()", lambda: agent.act(nav, manip, not_reset, oih))

# upload alone (force materialization with a scalar fetch)
sum_jit = jax.jit(lambda x: x.astype(jnp.int32).sum())
probe = jax.jit(lambda x: x[0, 0, 0, 0].astype(jnp.int32))


def upload_only():
    d = jnp.asarray(packed)
    int(probe(d))


timeit("frame upload (4.1 MB) + probe fetch", upload_only)

dev_frames = jnp.asarray(packed)
int(sum_jit(dev_frames))

# compute alone: frames resident on device
ints = np.stack([agent.prev_action, not_reset, oih]).astype(np.int32)
dev_ints = jnp.asarray(ints)
rngk = jax.random.PRNGKey(0)


def compute_only():
    a, p, v, cv, st = agent._step_impl(
        agent.params, agent.state, agent._aug_params, dev_frames, dev_ints, rngk
    )
    np.asarray(a)


timeit("act compute (resident frames) + fetch", compute_only)

# pure RTT: fetch a tiny resident value
tiny = jax.jit(lambda x: x.sum())(jnp.ones(8))
timeit("tiny fetch (tunnel RTT)", lambda: np.asarray(tiny))
print("done")
