"""Native-compile numerics check + timing for the batched flash attention
kernels vs the XLA attention path, at the fusion and ViT shapes."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()
from safevla_tpu.ops.flash_attention import (
    _attention_diff,
    _xla_attention,
    flash_attention,
)

# fusion shape (per tower chunk)
for (b, s, h, d, kl_spec) in [
    (512, 201, 8, 64, "full"),
    (512, 201, 8, 64, "ragged"),
    (64, 337, 6, 64, "full"),
]:
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = [jax.random.normal(kk, (b, s, h, d), jnp.float32).astype(jnp.bfloat16) for kk in ks]
    if kl_spec == "ragged":
        kl = jnp.asarray(np.random.RandomState(0).randint(170, s + 1, (b,)), jnp.int32)
    else:
        kl = None
    key_mask = None if kl is None else (jnp.arange(s)[None, :] < kl[:, None])

    f_pal = jax.jit(lambda q, k, v: jnp.sum(flash_attention(q, k, v, key_lens=kl).astype(jnp.float32)))
    f_xla = jax.jit(lambda q, k, v: jnp.sum(_xla_attention(q, k, v, key_mask=key_mask).astype(jnp.float32)))
    # numerics: compare full outputs (fetch via sum of abs diff)
    f_diff = jax.jit(
        lambda q, k, v: jnp.max(
            jnp.abs(
                flash_attention(q, k, v, key_lens=kl).astype(jnp.float32)
                - _xla_attention(q, k, v, key_mask=key_mask).astype(jnp.float32)
            )
        )
    )
    print(f"shape b={b} s={s} h={h} d={d} {kl_spec}: max|pal-xla| = {float(f_diff(q, k, v)):.2e}", flush=True)

    def timeit(name, fn, iters=10):
        float(fn(q, k, v))
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn(q, k, v)
        float(r)
        print(f"  {name:24s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

    timeit("pallas fwd", f_pal)
    timeit("xla fwd", f_xla)

    # grads
    def loss_pal(q, k, v):
        return jnp.sum(_attention_diff(q, k, v, kl, False).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, key_mask=key_mask).astype(jnp.float32) ** 2)

    g_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))
    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
    gp = g_pal(q, k, v)
    gx = g_xla(q, k, v)
    gdiff = jax.jit(
        lambda q, k, v: jnp.max(
            jnp.stack([
                jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32)))
                for a, b_ in zip(g_pal(q, k, v), g_xla(q, k, v))
            ])
        )
    )
    print(f"  max grad diff = {float(gdiff(q, k, v)):.2e}", flush=True)

    def timeg(name, fn, iters=10):
        jax.tree.map(lambda x: x.block_until_ready(), fn(q, k, v))
        s0 = jax.jit(lambda q, k, v: jax.tree.reduce(lambda a, b_: a + b_, [jnp.sum(x.astype(jnp.float32)) for x in fn(q, k, v)]))
        float(s0(q, k, v))
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = s0(q, k, v)
        float(r)
        print(f"  {name:24s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

    timeg("pallas fwd+bwd", g_pal)
    timeg("xla fwd+bwd", g_xla)
print("done")
