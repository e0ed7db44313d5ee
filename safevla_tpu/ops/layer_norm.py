"""Pallas TPU LayerNorm (fwd + VJP) for the encoder hot paths.

Motivation (PERFORMANCE.md round 4): in the update's fwd/bwd graph XLA
assigns a {3,1,2,0} layout to the (towers, chunk, tokens, D) activations
between the row-major pallas attention custom-calls, and hides the
(chunk, tokens) transposes inside the LayerNorm reduce fusions —
convert_reduce / multiply_reduce kernels cost ~2 ms/chunk-iter each where
the pure LN HBM traffic is ~0.2 ms. Flattening the rows in XLA
(SAFEVLA_FUSION_FLAT) materialized the copy instead of removing it. This
kernel removes the hiding place: LN becomes a row-major custom call on BOTH
sides, so layout assignment keeps the whole attention->LN->matmul chain in
{3,2,1,0} and the wgrad matmuls take their operands row-major.

Design:
  * x viewed as (R, D) rows (any leading batch dims flattened by the
    wrapper — a bitcast once the producer is row-major). D must be a lane
    multiple (128): fusion 512, ViT 384, decoder 512 all qualify.
  * Grid over row blocks; per block: f32 mean/var/normalize in VMEM, IO in
    the caller's dtype, affine (gamma, beta) in f32 — the same math as
    flax's LayerNorm(dtype=f32) followed by .astype(bf16).
  * Backward recomputes the row stats from x (cheaper than saving
    mean/rstd residuals: x is read anyway and the extra reduces live in
    VMEM), emits dx in one pass plus PER-BLOCK partial dgamma/dbeta rows
    that the wrapper sums outside (a (n_blocks, D) f32 reduce — tiny).

Numerics: identical to the f32-LN-on-bf16-rounded-input the model uses
today (bf16->f32 upcast is exact; stats and normalization in f32; one
bf16 rounding on output). Tower oracles must stay green on any change here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _stats(x, eps):
    """flax-equivalent row stats: fast variance with the zero clamp."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    mu2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, jax.lax.rsqrt(var + eps)


def _ln_fwd_kernel(x_ref, gam_ref, beta_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (RB, D)
    mu, rs = _stats(x, eps)
    y = (x - mu) * (rs * gam_ref[...]) + beta_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_bwd_kernel(x_ref, gam_ref, g_ref, dx_ref, dgam_ref, dbeta_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu, rs = _stats(x, eps)
    xhat = (x - mu) * rs
    gh = g * gam_ref[...]
    m1 = jnp.mean(gh, axis=-1, keepdims=True)
    m2 = jnp.mean(gh * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rs * (gh - m1 - xhat * m2)).astype(dx_ref.dtype)
    # dgamma/dbeta: accumulate (8, D) partials into ONE output block across
    # the sequential TPU grid (an (8, D) block is always lowering-legal,
    # including under vmap over towers, unlike a (1, D) row per grid step);
    # the wrapper finishes with a final 8-row sum.
    rb, D = x.shape
    part_g = jnp.sum((g * xhat).reshape(8, rb // 8, D), axis=1)
    part_b = jnp.sum(g.reshape(8, rb // 8, D), axis=1)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgam_ref[...] = part_g
        dbeta_ref[...] = part_b

    @pl.when(i > 0)
    def _acc():
        dgam_ref[...] = dgam_ref[...] + part_g
        dbeta_ref[...] = dbeta_ref[...] + part_b


_ROW_BLOCK = 512


def _geometry(R: int, D: int):
    if D % 128:
        raise ValueError(f"feature dim {D} must be a 128-lane multiple")
    # row blocks are 8-row multiples: keeps every BlockSpec lowering-legal
    # (incl. under vmap) and lets the bwd kernel fold its partials to (8, D)
    rb = min(_ROW_BLOCK, _cdiv(R, 8) * 8)
    r_pad = _cdiv(R, rb) * rb
    return rb, r_pad, r_pad // rb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def layer_norm_rows(
    x, gamma, beta, eps: float = 1e-6, out_dtype=None, interpret: bool = False
):
    """LayerNorm over the last axis of x (R, D); gamma/beta (D,) f32.

    Output in `out_dtype` (default x.dtype); f32 math inside — flax
    LayerNorm(dtype=f32) equivalence up to one output rounding."""
    return _ln_fwd(x, gamma, beta, eps, out_dtype, interpret)[0]


def _ln_fwd(x, gamma, beta, eps, out_dtype, interpret):
    R, D = x.shape
    rb, r_pad, n_blocks = _geometry(R, D)
    xf = jnp.pad(x, ((0, r_pad - R), (0, 0)))
    gam = gamma.astype(jnp.float32).reshape(1, D)
    bet = beta.astype(jnp.float32).reshape(1, D)
    row_blk = pl.BlockSpec((rb, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_blk = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[row_blk, vec_blk, vec_blk],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct((r_pad, D), out_dtype or x.dtype),
        interpret=interpret,
    )(xf, gam, bet)
    return out[:R], (x, gamma)


def _ln_bwd(eps, out_dtype, interpret, res, g):
    x, gamma = res
    R, D = x.shape
    rb, r_pad, n_blocks = _geometry(R, D)
    xf = jnp.pad(x, ((0, r_pad - R), (0, 0)))
    gf = jnp.pad(g, ((0, r_pad - R), (0, 0)))  # zero rows: no grad contribution
    gam = gamma.astype(jnp.float32).reshape(1, D)
    row_blk = pl.BlockSpec((rb, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_blk = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc_blk = pl.BlockSpec((8, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dgam_p, dbeta_p = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[row_blk, vec_blk, row_blk],
        out_specs=[row_blk, acc_blk, acc_blk],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, D), x.dtype),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
            jax.ShapeDtypeStruct((8, D), jnp.float32),
        ],
        interpret=interpret,
    )(xf, gam, gf)
    dgamma = dgam_p.sum(axis=0).astype(gamma.dtype)
    dbeta = dbeta_p.sum(axis=0).astype(gamma.dtype)
    return dx[:R], dgamma, dbeta


layer_norm_rows.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(
    x, gamma, beta, eps: float = 1e-6, out_dtype=None, interpret: bool = False
):
    """LayerNorm over the last axis of any-rank x; leading axes flattened to
    kernel rows (a bitcast when the producer is row-major — which this
    custom call itself guarantees)."""
    shape = x.shape
    y = layer_norm_rows(
        x.reshape(-1, shape[-1]), gamma, beta, eps, out_dtype, interpret
    )
    return y.reshape(shape)
