"""Pallas TPU attention kernels for the policy's encoder hot paths.

Used by the fusion transformer and ViT trunks (safevla_tpu.models.fusion /
vit). These encoders run attention over the flattened (B*T [* cameras])
rollout/update batch: batch is huge (hundreds to thousands of rows), the
sequence is short (201 fusion tokens, 337-433 ViT patches), and head_dim is
64. Profiling on v5e (PERFORMANCE.md round 2) showed the XLA attention at
these shapes spends ~50% of the whole fusion-encoder forward in attention
that is ~2% of its FLOPs: the (B, H, S, S) logits make 5+ HBM round trips
(QK^T write, mask, softmax passes, P read).

Kernel design (v5e, ~16 MB VMEM, double-buffered blocks):
  * Layout (B, S, H*Dh): the natural reshape of (B, S, H, Dh) — no
    transposes, no padding of head_dim to 128 lanes (H*Dh is 384/512, a
    lane multiple). Heads are static lane slices inside the kernel.
  * Grid over groups of G=4 batch rows; per grid step the kernel loops
    over heads, computing f32 logits + softmax + PV entirely in VMEM —
    logits never touch HBM.
  * Key padding: per-sample valid-key counts (prefix masks — right-padded
    text) come in as an SMEM int32 array; columns >= key_lens[b] get -1e30.
    Sequence padding to the 128 boundary is masked the same way.
  * Backward is a second kernel with the same tiling that recomputes the
    softmax per tile and emits dq/dk/dv in one pass (flash-attention VJP),
    so training never materializes probabilities in HBM either.

Numerics: f32 logits/softmax accumulation, tile IO in the caller's dtype —
the same math as the XLA path it replaces (scale applied to f32 logits).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


_NEG_INF = -1e30


def _kernel_bias(kl_ref, base: int, group: int, s_pad: int):
    """(G, s_pad) f32 additive bias from per-row valid-key counts in SMEM."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    rows = []
    for g in range(group):
        kl = kl_ref[base + g]
        rows.append(jnp.where(col < kl, 0.0, _NEG_INF))
    return jnp.concatenate(rows, axis=0)  # (G, s_pad)


def _fwd_kernel(kl_ref, qkv_ref, o_ref, *, heads: int, dh: int, scale: float):
    """qkv_ref (G, S, 3*H*Dh) packed [q|k|v] on lanes — the raw in_proj
    output, so the caller never splits/copies; o_ref (G, S, H*Dh)."""
    group, s_pad, _ = qkv_ref.shape
    lanes = heads * dh
    i = pl.program_id(0)
    bias = _kernel_bias(kl_ref, i * group, group, s_pad)[:, None, :]  # (G,1,S)
    for h in range(heads):
        qh = qkv_ref[:, :, h * dh : (h + 1) * dh]
        kh = qkv_ref[:, :, lanes + h * dh : lanes + (h + 1) * dh]
        vh = qkv_ref[:, :, 2 * lanes + h * dh : 2 * lanes + (h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (G, S, S)
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(qkv_ref.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * dh : (h + 1) * dh] = (out / denom).astype(o_ref.dtype)


def _bwd_kernel(
    kl_ref, qkv_ref, g_ref, dqkv_ref, *, heads: int, dh: int, scale: float
):
    group, s_pad, _ = qkv_ref.shape
    lanes = heads * dh
    i = pl.program_id(0)
    bias = _kernel_bias(kl_ref, i * group, group, s_pad)[:, None, :]
    for h in range(heads):
        qh = qkv_ref[:, :, h * dh : (h + 1) * dh]
        kh = qkv_ref[:, :, lanes + h * dh : lanes + (h + 1) * dh]
        vh = qkv_ref[:, :, 2 * lanes + h * dh : 2 * lanes + (h + 1) * dh]
        gh = g_ref[:, :, h * dh : (h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # probabilities in the tile dtype (bf16): matches the FORWARD kernel,
        # whose PV matmul consumes p.astype(dtype) — and cuts the kernel from
        # 5.4 to 3.4 ms at the fusion update shape (G=4, B=384, S=208; the
        # matmul-only floor is 2.6 ms). f32 is kept where it matters: logits,
        # softmax normalization, and the ds row-sum correction.
        pb = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv_ref.dtype)
        gb = gh.astype(qkv_ref.dtype)
        # dv = p^T g : contract over q rows
        dv = jax.lax.dot_general(
            pb, gb, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dp = g v^T : (G, Sq, Sk)
        dp = jax.lax.dot_general(
            gb, vh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        pf = pb.astype(jnp.float32)
        ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))  # (G, Sq, Sk)
        dsb = ds.astype(qkv_ref.dtype)
        dq = jax.lax.dot_general(
            dsb, kh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            dsb, qh, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dqkv_ref[:, :, h * dh : (h + 1) * dh] = (dq * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, lanes + h * dh : lanes + (h + 1) * dh] = (
            dk * scale
        ).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * lanes + h * dh : 2 * lanes + (h + 1) * dh] = dv.astype(
            dqkv_ref.dtype
        )


_VMEM_BUDGET = 14 * 1024 * 1024  # stay under the 16 MB scoped-vmem limit


def _group_override(kind: str) -> int | None:
    """SAFEVLA_ATTN_GROUP_FWD / _BWD: explicit rows-per-grid-step override
    (experiments / per-topology tuning); unset -> VMEM budget model."""
    import os

    v = os.environ.get(f"SAFEVLA_ATTN_GROUP_{kind}")
    return int(v) if v else None


def _pick_group(
    s_pad: int, lanes: int, n_blocks: int, n_transients: int, itemsize: int = 2
) -> int:
    """Largest rows-per-grid-step whose VMEM high-water fits the budget:
    double-buffered (G, S, lanes) blocks + f32 (G, S, S) softmax transients.
    `itemsize` is the block dtype's bytes (f32 inputs double the block cost)."""
    group = 8
    while group > 1:
        est = (
            n_blocks * group * s_pad * lanes * itemsize * 2
            + n_transients * group * s_pad * s_pad * 4
        )
        if est <= _VMEM_BUDGET:
            break
        group //= 2
    return group


def _prep_qkv(qkv, heads, key_lens, lane_widths, n_transients, kind="FWD"):
    """qkv (B, S, 3*H*Dh) -> padded + SMEM key-count vector + tile geometry."""
    b, s, three_lanes = qkv.shape
    lanes = three_lanes // 3
    if lanes % 128 or lanes % heads:
        raise ValueError(f"H*Dh = {lanes} must be a lane multiple divisible by heads")
    # sublane (second-minor) alignment is 16 for bf16 — padding to 16 instead
    # of 128 keeps the (S, S) logits work ~35% smaller at S=201
    s_pad = max(128, _cdiv(s, 16) * 16)
    group = _group_override(kind) or _pick_group(
        s_pad, lanes, lane_widths, n_transients, qkv.dtype.itemsize
    )
    group = min(group, b)
    b_pad = _cdiv(b, group) * group
    qkv_f = jnp.pad(qkv, ((0, b_pad - b), (0, s_pad - s), (0, 0)))
    if key_lens is None:
        kl = jnp.full((b_pad,), s, jnp.int32)
    else:
        kl = jnp.pad(key_lens.astype(jnp.int32), (0, b_pad - b), constant_values=s)
    return qkv_f, kl, lanes, s_pad, b_pad, group


def flash_attention_qkv(
    qkv: jax.Array,
    heads: int,
    interpret: bool = False,
    key_lens: jax.Array | None = None,
) -> jax.Array:
    """Packed-projection attention: qkv (B, S, 3*H*Dh) with [q|k|v] on the
    lane axis (the raw in_proj layout) -> (B, S, H*Dh).

    key_lens (B,) int32 (optional): per-sample count of valid keys; columns
    >= key_lens[b] are excluded from the softmax (prefix masks only —
    right-padded text)."""
    b, s, _ = qkv.shape
    qkv_f, kl, lanes, s_pad, b_pad, group = _prep_qkv(qkv, heads, key_lens, 4, 3)
    dh = lanes // heads
    scale = 1.0 / math.sqrt(dh)
    grid = (b_pad // group,)
    in_blk = pl.BlockSpec((group, s_pad, 3 * lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((group, s_pad, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, dh=dh, scale=scale),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), in_blk],
        out_specs=out_blk,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, lanes), qkv.dtype),
        interpret=interpret,
    )(kl, qkv_f)
    return out[:b, :s, :]


def _flash_attention_qkv_bwd(qkv, heads, key_lens, g, interpret=False):
    """g (B, S, H*Dh) cotangent -> dqkv (B, S, 3*H*Dh)."""
    b, s, _ = qkv.shape
    # 7 double-buffered lane blocks (qkv in, g in, dqkv out); peak f32
    # transient liveness is ~3 (G,S,S) buffers (pf/dp/ds at the ds row-sum —
    # s and e die earlier, pb/dsb are half-width): measured on v5e, the
    # resulting G=4 compiles and runs 6% faster than G=2, while G=8 exceeds
    # scoped VMEM (tools/exp_attn_bwd.py).
    qkv_f, kl, lanes, s_pad, b_pad, group = _prep_qkv(
        qkv, heads, key_lens, 7, 3, kind="BWD"
    )
    dh = lanes // heads
    scale = 1.0 / math.sqrt(dh)
    gf = jnp.pad(g, ((0, b_pad - b), (0, s_pad - s), (0, 0)))
    grid = (b_pad // group,)
    in_blk = pl.BlockSpec((group, s_pad, 3 * lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    g_blk = pl.BlockSpec((group, s_pad, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, dh=dh, scale=scale),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), in_blk, g_blk],
        out_specs=in_blk,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, 3 * lanes), qkv.dtype),
        interpret=interpret,
    )(kl, qkv_f, gf)
    return dqkv[:b, :s, :]


def _pack_qkv(q, k, v):
    b, s, h, d = q.shape
    return jnp.concatenate([x.reshape(b, s, h * d) for x in (q, k, v)], axis=-1)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    key_lens: jax.Array | None = None,
) -> jax.Array:
    """Batched short-sequence multi-head attention over separate q/k/v.

    q/k/v (B, S, H, D) -> (B, S, H, D). Packs into the kernel's [q|k|v]
    lane layout (one concat copy — call flash_attention_qkv with the raw
    in_proj output to avoid it)."""
    b, s, h, d = q.shape
    out = flash_attention_qkv(
        _pack_qkv(q, k, v), h, interpret=interpret, key_lens=key_lens
    )
    return out.reshape(b, s, h, d)


def _flash_attention_bwd(q, k, v, key_lens, g, interpret=False):
    b, s, h, d = q.shape
    dqkv = _flash_attention_qkv_bwd(
        _pack_qkv(q, k, v), h, key_lens, g.reshape(b, s, h * d), interpret=interpret
    )
    lanes = h * d
    unfold = lambda x: x.reshape(b, s, h, d)
    return (
        unfold(dqkv[:, :, :lanes]),
        unfold(dqkv[:, :, lanes : 2 * lanes]),
        unfold(dqkv[:, :, 2 * lanes :]),
    )


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _attention_diff_qkv(qkv, key_lens, heads, interpret=False):
    return flash_attention_qkv(qkv, heads, interpret=interpret, key_lens=key_lens)


def _attention_qkv_fwd(qkv, key_lens, heads, interpret=False):
    out = flash_attention_qkv(qkv, heads, interpret=interpret, key_lens=key_lens)
    return out, (qkv, key_lens)


def _attention_qkv_bwd(heads, interpret, res, g):
    qkv, key_lens = res
    dqkv = _flash_attention_qkv_bwd(qkv, heads, key_lens, g, interpret=interpret)
    dkl = (
        None
        if key_lens is None
        else np.zeros(key_lens.shape, jax.dtypes.float0)
    )
    return dqkv, dkl


_attention_diff_qkv.defvjp(_attention_qkv_fwd, _attention_qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_diff(q, k, v, key_lens, interpret=False):
    return flash_attention(q, k, v, interpret=interpret, key_lens=key_lens)


def _attention_fwd(q, k, v, key_lens, interpret=False):
    out = flash_attention(q, k, v, interpret=interpret, key_lens=key_lens)
    return out, (q, k, v, key_lens)


def _attention_bwd(interpret, res, g):
    """Flash-attention backward: one fused kernel pass recomputes the
    softmax per VMEM tile and emits dq/dk/dv — probabilities never hit HBM."""
    q, k, v, key_lens = res
    dq, dk, dv = _flash_attention_bwd(q, k, v, key_lens, g, interpret=interpret)
    dkl = (
        None
        if key_lens is None
        else np.zeros(key_lens.shape, jax.dtypes.float0)
    )
    return dq, dk, dv, dkl


_attention_diff.defvjp(_attention_fwd, _attention_bwd)


def _pallas_default() -> bool:
    import os

    return os.environ.get("SAFEVLA_PALLAS_ATTN", "1") == "1"


def _on_tpu() -> bool:
    """True when ops dispatch to a TPU-like backend (shared util)."""
    from safevla_tpu.utils.platform import on_tpu

    return on_tpu()


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    use_pallas: bool | None = None,
    interpret: bool = False,
    key_mask: jax.Array | None = None,
    key_lens: jax.Array | None = None,
) -> jax.Array:
    """Dispatcher: pallas flash kernels (fwd + VJP) or XLA attention.

    q/k/v (B, S, H, D) -> (B, S, H, D); bidirectional encoder attention (the
    decoder paths keep their own masked attention). Key padding can come in
    two equivalent forms:
      * key_mask (B, S) bool — arbitrary mask; forces the XLA path
      * key_lens (B,) int32 — prefix mask (right-padded text); both paths
        support it, so pallas stays eligible

    Default is the pallas kernel whenever its layout preconditions hold
    (H*Dh a lane multiple, no arbitrary mask): measured on v5e at the
    encoder shapes (seq 201-433, head_dim 64, batch 64-1536) the fused
    kernel removes the (B, H, S, S) logits HBM round-trips that make XLA
    attention ~50% of fusion-forward time. SAFEVLA_PALLAS_ATTN=0 restores
    the XLA path everywhere (golden-parity comparisons use it together
    with SAFEVLA_ATTN_F32_LOGITS=1).
    """
    if key_mask is not None and key_lens is not None:
        raise ValueError("pass key_mask or key_lens, not both")
    if use_pallas is None:
        use_pallas = _pallas_default()
    on_tpu = _on_tpu()
    lanes_ok = (q.shape[2] * q.shape[3]) % 128 == 0
    if use_pallas and (on_tpu or interpret) and key_mask is None and lanes_ok:
        return _attention_diff(q, k, v, key_lens, interpret)
    if key_lens is not None:
        key_mask = jnp.arange(k.shape[1])[None, :] < key_lens[:, None]
    return _xla_attention(q, k, v, key_mask)


def attention_qkv(
    qkv: jax.Array,
    heads: int,
    use_pallas: bool | None = None,
    interpret: bool = False,
    key_mask: jax.Array | None = None,
    key_lens: jax.Array | None = None,
) -> jax.Array:
    """Packed-projection attention dispatcher: qkv (B, S, 3*H*Dh) with
    [q|k|v] on the lane axis (raw in_proj layout) -> (B, S, H*Dh).

    The preferred entry point for the encoder modules: the pallas path
    consumes the projection output directly — no q/k/v split copies on the
    way in and a single packed dqkv on the way back. Same dispatch rules as
    `attention`."""
    if key_mask is not None and key_lens is not None:
        raise ValueError("pass key_mask or key_lens, not both")
    b, s, three_lanes = qkv.shape
    lanes = three_lanes // 3
    if use_pallas is None:
        use_pallas = _pallas_default()
    on_tpu = _on_tpu()
    lanes_ok = lanes % 128 == 0 and lanes % heads == 0
    if use_pallas and (on_tpu or interpret) and key_mask is None and lanes_ok:
        return _attention_diff_qkv(qkv, key_lens, heads, interpret)
    dh = lanes // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fold = lambda x: x.reshape(b, s, heads, dh)
    if key_lens is not None:
        key_mask = jnp.arange(s)[None, :] < key_lens[:, None]
    out = _xla_attention(fold(q), fold(k), fold(v), key_mask)
    return out.reshape(b, s, lanes)
