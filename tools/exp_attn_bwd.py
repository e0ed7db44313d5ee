"""Experiment: flash-attention BWD kernel variants at the update fusion shape.

Variants:
  cur      — in-tree kernel (f32 p/dp/ds transients)
  bf16p    — probabilities and ds in bf16 (s/m in f32 for stability, like the
             encoder's bf16-logits XLA path); halves transient VMEM
  mmonly   — matmuls only, softmax replaced by cheap scaling (FLOP floor)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safevla_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()
import safevla_tpu.ops.flash_attention as fa

B, S, H, D = 384, 201, 8, 64
LANES = H * D
ks = jax.random.split(jax.random.PRNGKey(0), 2)
qkv = jax.random.normal(ks[0], (B, S, 3 * LANES), jnp.float32).astype(jnp.bfloat16)
g = jax.random.normal(ks[1], (B, S, LANES), jnp.float32).astype(jnp.bfloat16)
kl = jnp.asarray(np.random.RandomState(0).randint(170, S + 1, (B,)), jnp.int32)


def bwd_kernel_v(kl_ref, qkv_ref, g_ref, dqkv_ref, *, heads, dh, scale, variant):
    group, s_pad, _ = qkv_ref.shape
    lanes = heads * dh
    i = pl.program_id(0)
    bias = fa._kernel_bias(kl_ref, i * group, group, s_pad)[:, None, :]
    for h in range(heads):
        qh = qkv_ref[:, :, h * dh : (h + 1) * dh]
        kh = qkv_ref[:, :, lanes + h * dh : lanes + (h + 1) * dh]
        vh = qkv_ref[:, :, 2 * lanes + h * dh : 2 * lanes + (h + 1) * dh]
        gh = g_ref[:, :, h * dh : (h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if variant == "mmonly":
            pb = (s * 0.001).astype(qkv_ref.dtype)
            gb = gh
            dv = jax.lax.dot_general(pb, gb, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(gb, vh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            dsb = (dp * 0.001).astype(qkv_ref.dtype)
            dq = jax.lax.dot_general(dsb, kh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(dsb, qh, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        elif variant == "bf16p":
            s = s * scale + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            pb = (e / denom).astype(qkv_ref.dtype)  # bf16 probabilities
            gb = gh
            dv = jax.lax.dot_general(pb, gb, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(gb, vh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            pf = pb.astype(jnp.float32)
            ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
            dsb = ds.astype(qkv_ref.dtype)
            dq = jax.lax.dot_general(dsb, kh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(dsb, qh, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        else:
            raise ValueError(variant)
        dqkv_ref[:, :, h * dh : (h + 1) * dh] = (dq * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, lanes + h * dh : lanes + (h + 1) * dh] = (dk * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * lanes + h * dh : 2 * lanes + (h + 1) * dh] = dv.astype(dqkv_ref.dtype)


def run_variant(variant, group):
    s_pad = max(128, -(-S // 16) * 16)
    b_pad = -(-B // group) * group
    qkv_f = jnp.pad(qkv, ((0, b_pad - B), (0, s_pad - S), (0, 0)))
    gf = jnp.pad(g, ((0, b_pad - B), (0, s_pad - S), (0, 0)))
    klf = jnp.pad(kl, (0, b_pad - B), constant_values=S)
    grid = (b_pad // group,)
    in_blk = pl.BlockSpec((group, s_pad, 3 * LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    g_blk = pl.BlockSpec((group, s_pad, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(bwd_kernel_v, heads=H, dh=D, scale=1.0 / math.sqrt(D), variant=variant),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), in_blk, g_blk],
        out_specs=in_blk,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, 3 * LANES), qkv.dtype),
    )
    jfn = jax.jit(lambda kl_, q_, g_: jnp.sum(fn(kl_, q_, g_).astype(jnp.float32)))
    try:
        v = float(jfn(klf, qkv_f, gf))
    except Exception as e:  # noqa: BLE001
        print(f"{variant} G={group}: FAILED {str(e)[:120]}", flush=True)
        return
    t0 = time.perf_counter()
    r = None
    for _ in range(30):
        r = jfn(klf, qkv_f, gf)
    float(r)
    dt = (time.perf_counter() - t0) / 30 * 1000
    flop = 5 * 2 * S * S * D * H * B
    print(f"{variant:7s} G={group}: {dt:6.2f} ms  ({flop/dt/1e9:5.1f} TFLOP/s)  val={v:.1f}", flush=True)


# reference timing of the in-tree bwd via its private entry
for gg in [2, 4]:
    os.environ["SAFEVLA_ATTN_GROUP_BWD"] = str(gg)
    jax.clear_caches()
    jb = jax.jit(lambda q_, g_: jnp.sum(fa._flash_attention_qkv_bwd(q_, H, kl, g_).astype(jnp.float32)))
    v = float(jb(qkv, g))
    t0 = time.perf_counter()
    r = None
    for _ in range(30):
        r = jb(qkv, g)
    float(r)
    dt = (time.perf_counter() - t0) / 30 * 1000
    flop = 5 * 2 * S * S * D * H * B
    print(f"cur     G={gg}: {dt:6.2f} ms  ({flop/dt/1e9:5.1f} TFLOP/s)  val={v:.1f}", flush=True)
os.environ.pop("SAFEVLA_ATTN_GROUP_BWD", None)

for variant in ["bf16p", "mmonly"]:
    for group in [2, 4, 8]:
        run_variant(variant, group)
print("done")
