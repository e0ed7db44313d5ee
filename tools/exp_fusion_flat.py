"""A/B the flat-rows LN+MLP fusion layout (SAFEVLA_FUSION_FLAT) at the real
update chunk shape (chunk x 3 towers, vmapped, jax.checkpoint like the
learner's remat structure).

Run on the real chip: SAFEVLA_FUSION_FLAT={0,1} python tools/exp_fusion_flat.py
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
from safevla_tpu.models.actor_critic import PolicyTower, SafeVLAPolicy

CHUNK = int(os.environ.get("PROF_CHUNK", "128"))
ITERS = int(os.environ.get("PROF_ITERS", "32"))

cfg = Config()
m = cfg.model
gh, gw = m.vision_grid
L = m.text_max_tokens

policy = SafeVLAPolicy(m)
params = policy.init_params(jax.random.PRNGKey(0))
towers = params["towers"]
tower = PolicyTower(m)

rng = np.random.RandomState(0)
dn = jnp.asarray(rng.randn(CHUNK, gh, gw, m.vision_feature_dim), jnp.bfloat16)
dm = jnp.asarray(rng.randn(CHUNK, gh, gw, m.vision_feature_dim), jnp.bfloat16)
th = jnp.asarray(rng.randn(CHUNK, L, m.text_embed_size), jnp.bfloat16)
tm = jnp.ones((CHUNK, L), bool)


def embed(tp, dn, dm, th, tm):
    return tower.apply(tp, dn, dm, th, tm, method=PolicyTower.embed_obs)


vembed = jax.vmap(embed, in_axes=(0, None, None, None, None))


def timeit(name, fn, *args, iters=ITERS):
    float(fn(*args))
    t0 = time.perf_counter()
    s = None
    for _ in range(iters):
        s = fn(*args)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


flag = os.environ.get("SAFEVLA_FUSION_FLAT", "1")
fwd = jax.jit(lambda tp, *a: vembed(tp, *a).astype(jnp.float32).sum())
timeit(f"fwd  chunk={CHUNK} flat={flag}", fwd, towers, dn, dm, th, tm)


def loss(tp, dn, dm, th, tm):
    ck = jax.checkpoint(lambda a: vembed(tp, *a))
    return ck((dn, dm, th, tm)).astype(jnp.float32).sum()


g = jax.jit(lambda *a: jax.tree.reduce(
    lambda x, y: x + y,
    jax.tree.map(lambda z: jnp.sum(z.astype(jnp.float32)), jax.grad(loss)(*a)),
))
timeit(f"fwd+bwd (remat) chunk={CHUNK} flat={flag}", g, towers, dn, dm, th, tm)
print("done")
