"""Pallas TPU attention kernel for the policy's encoder hot paths.

Used by the fusion transformer and ViT trunks (safevla_tpu.models.fusion /
vit) on TPU: per-row attention logits live only in VMEM tiles instead of
materializing (batch, heads, S, S) in HBM. These encoders run over the
flattened (B*T [* cameras]) rollout batch, so the batch axis is large and the
sequence short (201 fusion tokens, 433 ViT patches): the kernel tiles over
(batch*heads, q-blocks) and keeps each row's full K/V resident in VMEM —
the right regime for seq < ~2k, where a K/V-streaming online-softmax loop
would only add DMA churn.

Sequences are padded to the 128-lane boundary; padded KEY columns are masked
to -inf inside the kernel (the true length is static), padded QUERY rows are
sliced away after the call. Numerics: f32 logits/softmax accumulation, tile
IO in the caller's dtype — identical math to the XLA path it replaces.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, true_len: int
):
    """One (batch*head, q-block) tile: q (1, blk_q, d); k/v (1, s_pad, d)."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk_q, s_pad)
    if true_len < logits.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < true_len, logits, jnp.float32(-1e30))
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (out / denom).astype(o_ref.dtype)


def _attn_kernel_lens(
    kl_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float
):
    """Like _attn_kernel, but key columns >= kl_ref[row] are masked out.

    kl_ref is the per-(batch*head) valid key count in SMEM — prefix masks
    only (right-padded text), which is what the tokenizer produces."""
    row = pl.program_id(0)
    kl = kl_ref[row]
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < kl, logits, jnp.float32(-1e30))
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (out / denom).astype(o_ref.dtype)


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    blk_q: int = 256,
    interpret: bool = False,
    key_lens: jax.Array | None = None,
) -> jax.Array:
    """Multi-head attention: q/k/v (B, S, H, D) -> (B, S, H, D).

    key_lens (B,) int32 (optional): per-sample count of valid keys; columns
    >= key_lens[b] are excluded from the softmax. Prefix masks only — the
    fusion encoder's right-padded text produces exactly this shape of mask."""
    b, s, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s_pad = max(128, -(-s // 128) * 128)
    d_pad = max(128, -(-d // 128) * 128)
    blk_q = min(blk_q, s_pad)
    while s_pad % blk_q:
        blk_q //= 2

    def fold(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, s, d)
        return _pad_axis(_pad_axis(x, s_pad, 1), d_pad, 2)

    qf, kf, vf = fold(q), fold(k), fold(v)
    grid = (b * h, s_pad // blk_q)
    qkv_specs = [
        pl.BlockSpec((1, blk_q, d_pad), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, s_pad, d_pad), lambda i, j: (i, 0, 0)),
    ]
    out_spec = pl.BlockSpec((1, blk_q, d_pad), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype)
    if key_lens is None:
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale, true_len=s),
            grid=grid,
            in_specs=qkv_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qf, kf, vf)
    else:
        kl = jnp.repeat(key_lens.astype(jnp.int32), h)  # (b*h,)
        out = pl.pallas_call(
            functools.partial(_attn_kernel_lens, scale=scale),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + qkv_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(kl, qf, kf, vf)
    out = out[:, :s, :d].reshape(b, h, s, d)
    return jnp.swapaxes(out, 1, 2)


def _f32_logits() -> bool:
    import os

    return os.environ.get("SAFEVLA_ATTN_F32_LOGITS", "0") == "1"


def _xla_attention(q, k, v, key_mask=None):
    """Encoder attention via XLA einsums.

    Default stores the pre-softmax logits in the compute dtype (bf16 on TPU;
    MXU still accumulates in f32 internally, softmax normalization runs in
    f32) — measured ~11% faster per PPO epoch at the policy's shapes. Set
    SAFEVLA_ATTN_F32_LOGITS=1 for full-f32 logits when running golden-parity
    comparisons against the torch reference.

    key_mask (B, S) bool: False keys are excluded from the softmax (torch
    key_padding_mask semantics). Padded positions must not merely carry zero
    values — a zero key still shifts the softmax normalization.
    """
    d = q.shape[-1]
    if _f32_logits() or q.dtype == jnp.float32:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(d))
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, jnp.float32(-1e30))
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=q.dtype)
        logits = logits / jnp.sqrt(jnp.asarray(d, q.dtype))
        if key_mask is not None:
            logits = jnp.where(
                key_mask[:, None, None, :], logits, jnp.asarray(-1e9, q.dtype)
            )
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_diff(q, k, v, key_lens, interpret=False):
    return flash_attention(q, k, v, interpret=interpret, key_lens=key_lens)


def _attention_fwd(q, k, v, key_lens, interpret=False):
    out = flash_attention(q, k, v, interpret=interpret, key_lens=key_lens)
    return out, (q, k, v, key_lens)


def _attention_bwd(interpret, res, g):
    """Recompute-based backward in plain XLA (softmax VJP), f32 accumulation.

    The encoders call this inside rematerialized chunks, so the recomputed
    (blk, S, S) probabilities are bounded by the chunk size."""
    q, k, v, key_lens = res
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if key_lens is not None:
        col = jnp.arange(s.shape[-1])
        s = jnp.where(
            col[None, None, None, :] < key_lens[:, None, None, None],
            s,
            jnp.float32(-1e30),
        )
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dkl = (
        None
        if key_lens is None
        else np.zeros(key_lens.shape, jax.dtypes.float0)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dkl


_attention_diff.defvjp(_attention_fwd, _attention_bwd)


def _pallas_default() -> bool:
    import os

    return os.environ.get("SAFEVLA_PALLAS_ATTN", "0") == "1"


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    use_pallas: bool | None = None,
    interpret: bool = False,
    key_mask: jax.Array | None = None,
    key_lens: jax.Array | None = None,
) -> jax.Array:
    """Dispatcher: pallas kernel (differentiable via a recompute backward) or
    XLA attention.

    q/k/v (B, S, H, D) -> (B, S, H, D); bidirectional encoder attention (the
    decoder paths keep their own masked attention). Key padding can come in
    two equivalent forms:
      * key_mask (B, S) bool — arbitrary mask; forces the XLA path
      * key_lens (B,) int32 — prefix mask (right-padded text); both paths
        support it, so pallas stays eligible

    Default is XLA: measured on v5e, XLA's fused attention beats this kernel
    at the encoder shapes in play (seq 201-433, head dim 48-64 — the d<128
    lane padding and per-q-block K/V reloads cost more than HBM logits save).
    Set SAFEVLA_PALLAS_ATTN=1 to flip the default — the kernel pays off when
    sequences grow past ~1k (bigger fusion token sets, higher-res cameras).
    """
    if key_mask is not None and key_lens is not None:
        raise ValueError("pass key_mask or key_lens, not both")
    if use_pallas is None:
        use_pallas = _pallas_default()
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas and (on_tpu or interpret) and key_mask is None:
        return _attention_diff(q, k, v, key_lens, interpret)
    if key_lens is not None:
        key_mask = jnp.arange(k.shape[1])[None, :] < key_lens[:, None]
    return _xla_attention(q, k, v, key_mask)
