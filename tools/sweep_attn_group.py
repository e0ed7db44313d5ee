"""Sweep SAFEVLA_ATTN_GROUP_BWD (rows per grid step) for the flash-attention
backward kernel at the update-time fusion shape, on the real chip.

The VMEM budget model (7 double-buffered lane blocks + 5 f32 (G,S,S)
transients) forces G=2 at s_pad=208/lanes=512; actual liveness at the peak
(`ds` computation) is ~3 f32 transients, so G=4 may fit and halve the grid.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()
import safevla_tpu.ops.flash_attention as fa

B, S, H, D = 384, 201, 8, 64  # 3 towers x fusion_chunk=128, fusion tokens
ks = jax.random.split(jax.random.PRNGKey(0), 1)
qkv = jax.random.normal(ks[0], (B, S, 3 * H * D), jnp.float32).astype(jnp.bfloat16)
kl = jnp.asarray(np.random.RandomState(0).randint(170, S + 1, (B,)), jnp.int32)

ref = None
for g in [None, 2, 4, 8]:
    if g is None:
        os.environ.pop("SAFEVLA_ATTN_GROUP_BWD", None)
        os.environ.pop("SAFEVLA_ATTN_GROUP_FWD", None)
    else:
        os.environ["SAFEVLA_ATTN_GROUP_BWD"] = str(g)
        os.environ["SAFEVLA_ATTN_GROUP_FWD"] = str(g)
    jax.clear_caches()

    def loss(qkv):
        return jnp.sum(fa._attention_diff_qkv(qkv, kl, H, False).astype(jnp.float32) ** 2)

    gfn = jax.jit(lambda qkv: jnp.sum(jax.grad(loss)(qkv).astype(jnp.float32)))
    try:
        v = float(gfn(qkv))  # compile + run
    except Exception as e:  # noqa: BLE001
        print(f"group={g}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        continue
    if ref is None:
        ref = v
    t0 = time.perf_counter()
    r = None
    for _ in range(20):
        r = gfn(qkv)
    float(r)
    dt = (time.perf_counter() - t0) / 20 * 1000
    print(f"group={g!s:4s} bwd(full grad-sum) {dt:7.2f} ms  val={v:.3f} (ref {ref:.3f})", flush=True)
print("done")
