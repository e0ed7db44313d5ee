"""Knock-out attribution microbench for the DINOv2-S ViT forward (rollout).

Run on the real chip: `python tools/prof_vit.py` (PROF_FRAMES=64 default)."""
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

from safevla_tpu.models.vit import DinoViT, VIT_CONFIGS
import safevla_tpu.ops.flash_attention as fa
import safevla_tpu.models.vit as vit_mod

B = int(os.environ.get("PROF_FRAMES", "64"))
cfg = VIT_CONFIGS["dinov2_vits14"]
model = DinoViT(cfg)
x = jnp.asarray(np.random.RandomState(0).rand(B, 224, 384, 3), jnp.float32)
params = model.init(jax.random.PRNGKey(0), x[:1])


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


fwd = jax.jit(scalarize(lambda p, x: model.apply(p, x)))
base = timeit(f"vit fwd {B} frames", fwd, params, x)

# chained x4 in one jit: isolates dispatch/tunnel overhead from device time
def multi(p, x):
    o = model.apply(p, x)
    for _ in range(3):
        # feed a perturbed input to defeat CSE; same shapes/compute
        x = x + o.mean() * 1e-6
        o = model.apply(p, x)
    return o


fwd_m = jax.jit(scalarize(multi))
dt4 = timeit(f"vit fwd x4 chained (per-call)", fwd_m, params, x, iters=4)
print(f"  -> per forward: {dt4/4:.2f} ms (dispatch-free estimate)")

orig = fa.attention_qkv


def pallas_attention(qkv, heads, use_pallas=None, interpret=False, key_mask=None, key_lens=None):
    return fa._attention_diff_qkv(qkv, key_lens, heads, False)


fa.attention_qkv = pallas_attention
fwd_p = jax.jit(scalarize(lambda p, x: model.apply(p, x)))
timeit("vit fwd pallas attention", fwd_p, params, x)
fa.attention_qkv = orig


def no_attention(qkv, heads, use_pallas=None, interpret=False, key_mask=None, key_lens=None):
    lanes = qkv.shape[-1] // 3
    return qkv[:, :, 2 * lanes:]


fa.attention_qkv = no_attention
fwd_na = jax.jit(scalarize(lambda p, x: model.apply(p, x)))
timeit("vit fwd attention->identity", fwd_na, params, x)
fa.attention_qkv = orig

# gelu approx variant
import flax.linen as nn

orig_gelu = nn.gelu
try:
    vit_mod.nn.gelu = lambda x, approximate=False: orig_gelu(x, approximate=True)
    fwd_g = jax.jit(scalarize(lambda p, x: model.apply(p, x)))
    timeit("vit fwd tanh-approx gelu", fwd_g, params, x)
finally:
    vit_mod.nn.gelu = orig_gelu

# f32 everything (what does bf16 buy)
cfg32 = VIT_CONFIGS["dinov2_vits14"].__class__(**{**VIT_CONFIGS["dinov2_vits14"].__dict__, "dtype": jnp.float32})
model32 = DinoViT(cfg32)
fwd32 = jax.jit(scalarize(lambda p, x: model32.apply(p, x)))
timeit("vit fwd f32", fwd32, params, x)

# pure matmul chain at ViT shapes for reference
d, ffn, t = 384, 1536, 337
w1 = jnp.asarray(np.random.randn(d, ffn), jnp.bfloat16) * 0.02
w2 = jnp.asarray(np.random.randn(ffn, d), jnp.bfloat16) * 0.02
wq = jnp.asarray(np.random.randn(d, 3 * d), jnp.bfloat16) * 0.02
wo = jnp.asarray(np.random.randn(d, d), jnp.bfloat16) * 0.02
x0 = jnp.asarray(np.random.randn(B * t, d), jnp.bfloat16)


def chain(x, w1, w2, wq, wo):
    for _ in range(12):
        q = jnp.dot(x, wq)
        x = jnp.dot(q[:, :d], wo)
        h = jax.nn.relu(jnp.dot(x, w1))
        x = jnp.dot(h, w2)
    return x


c = jax.jit(scalarize(chain))
dt = timeit("pure matmul chain (12 layers, same dims)", c, x0, w1, w2, wq, wo)
flops = 12 * B * t * 2 * (d * 3 * d + d * d + 2 * d * ffn)
print(f"  chain: {flops/1e9:.0f} GFLOP -> {flops/dt/1e9:.0f} TFLOP/s "
      f"({100*flops/dt/1e9/197:.0f}% of peak)")
print("done")
