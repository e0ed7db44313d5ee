"""Knock-out attribution microbench for the fusion embed forward/backward.

Run on the real chip: `python tools/prof_fusion.py` (PROF_CHUNK=512 default).

Times the real PolicyTower.embed_obs at update shapes (chunk x 3 towers,
vmapped) on the real chip, then variants with components disabled, to
attribute where the epoch time actually goes.
"""
import functools
import os
import sys
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

from safevla_tpu.config import Config
from safevla_tpu.models.actor_critic import PolicyTower, SafeVLAPolicy

CHUNK = int(os.environ.get("PROF_CHUNK", "512"))
TOWERS = 3

cfg = Config()
m = cfg.model
gh, gw = m.vision_grid
L = m.text_max_tokens

policy = SafeVLAPolicy(m)
params = policy.init_params(jax.random.PRNGKey(0))
towers = params["towers"]

rng = np.random.RandomState(0)
dn = jnp.asarray(rng.randn(CHUNK, gh, gw, m.vision_feature_dim), jnp.bfloat16)
dm = jnp.asarray(rng.randn(CHUNK, gh, gw, m.vision_feature_dim), jnp.bfloat16)
th = jnp.asarray(rng.randn(CHUNK, L, m.text_embed_size), jnp.bfloat16)
tm = jnp.ones((CHUNK, L), bool)

tower = PolicyTower(m)


def embed(tp, dn, dm, th, tm):
    return tower.apply(tp, dn, dm, th, tm, method=PolicyTower.embed_obs)


def vmapped(fn):
    return jax.vmap(fn, in_axes=(0, None, None, None, None))


def scalarize(fn):
    """Wrap fn so the jitted program ends in one f32 scalar: block_until_ready
    is lazy over the axon tunnel, so timing must force a real scalar fetch."""
    def wrapped(*args):
        out = fn(*args)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out),
        )
    return wrapped


def timeit(name, fn, *args, iters=8):
    float(fn(*args))  # compile + materialize
    t0 = time.perf_counter()
    s = None
    for _ in range(iters):
        s = fn(*args)
    float(s)  # device executes in order: last-done => all done
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


# --- forward ---
fwd = jax.jit(scalarize(vmapped(embed)))
base_fwd = timeit(f"fwd chunk={CHUNK} x{TOWERS} towers", fwd, towers, dn, dm, th, tm)

# fwd with pallas attention: the key_mask forces the XLA path, but the mask is
# all-true here (identical math) -> route straight to the pallas kernel
import safevla_tpu.ops.flash_attention as fa

orig_attention = fa.attention_qkv


def pallas_attention(qkv, heads, use_pallas=None, interpret=False, key_mask=None, key_lens=None):
    return fa._attention_diff_qkv(qkv, key_lens, heads, False)


fa.attention_qkv = pallas_attention
fwd_p = jax.jit(scalarize(vmapped(embed)))
pallas_fwd = timeit("fwd pallas attention", fwd_p, towers, dn, dm, th, tm)
fa.attention_qkv = orig_attention


# --- fwd+bwd (like one remat replay + grad) ---
def loss(tp, dn, dm, th, tm):
    return vmapped(embed)(tp, dn, dm, th, tm).astype(jnp.float32).sum()


g = jax.jit(scalarize(jax.grad(loss)))
timeit("fwd+bwd", g, towers, dn, dm, th, tm)

fa.attention_qkv = pallas_attention
g_p = jax.jit(scalarize(jax.grad(loss)))
timeit("fwd+bwd pallas attention", g_p, towers, dn, dm, th, tm)
fa.attention_qkv = orig_attention


# --- knock-outs (monkeypatched) ---
def no_attention(qkv, heads, use_pallas=None, interpret=False, key_mask=None, key_lens=None):
    lanes = qkv.shape[-1] // 3
    return qkv[:, :, 2 * lanes:]


fa.attention_qkv = no_attention
f_noattn = jax.jit(scalarize(vmapped(embed)))
timeit("fwd attention->identity", f_noattn, towers, dn, dm, th, tm)
g_noattn = jax.jit(scalarize(jax.grad(loss)))
timeit("fwd+bwd attention->identity", g_noattn, towers, dn, dm, th, tm)
fa.attention_qkv = orig_attention

# LN knock-out: monkeypatch flax LayerNorm to identity is invasive; instead
# time a pure-FFN matmul chain with the same FLOPs for reference
d = m.hidden_size
ffn = m.combiner_ffn_dim
n_tok = 1 + 2 * gh * gw + L
rows = CHUNK * n_tok
w1 = jnp.asarray(rng.randn(TOWERS, d, ffn), jnp.bfloat16) * 0.02
w2 = jnp.asarray(rng.randn(TOWERS, ffn, d), jnp.bfloat16) * 0.02
wq = jnp.asarray(rng.randn(TOWERS, d, 3 * d), jnp.bfloat16) * 0.02
wo = jnp.asarray(rng.randn(TOWERS, d, d), jnp.bfloat16) * 0.02
x0 = jnp.asarray(rng.randn(TOWERS, rows, d), jnp.bfloat16)


def ffn_chain(x, w1, w2, wq, wo):
    for _ in range(m.combiner_layers):
        qkv = jnp.einsum("trd,tde->tre", x, wq)
        x = jnp.einsum("trd,tde->tre", qkv[..., :d], wo)
        h = jnp.einsum("trd,tdf->trf", x, w1)
        h = jax.nn.relu(h)
        x = jnp.einsum("trf,tfd->trd", h, w2)
    return x


chain = jax.jit(scalarize(ffn_chain))
dt = timeit("pure matmul chain (same dense FLOPs)", chain, x0, w1, w2, wq, wo)
flops = TOWERS * m.combiner_layers * rows * 2 * (d * 3 * d + d * d + 2 * d * ffn)
print(f"  chain: {flops/1e9:.0f} GFLOP -> {flops/dt/1e9:.0f} TFLOP/s "
      f"({100*flops/dt/1e9/197:.0f}% of peak)")

# compressor-only knockout: time fusion without text/compressor by feeding
# precomputed tokens directly is structural; skip — attention + chain covers it.
print("done")
