"""T5 encoder (frozen text backbone) in JAX.

Re-implements the `T5EncoderModel.from_pretrained("t5-small")` forward the
reference runs under no_grad every policy step (reference:
allenact_dino_transformer.py:506-508,591-605). Faithful T5 semantics:
RMS layer norms (no mean subtraction, no bias, eps=1e-6), UNSCALED dot-product
attention with a shared relative-position bias from layer 0, ReLU feed-forward,
all linears bias-free.

TPU-native choice: the framework caches the goal-instruction encoding once per
episode (the reference re-tokenizes + re-encodes the same instruction on every
forward, a per-step CPU round-trip flagged in SURVEY §7); the encoder here is
only invoked on episode starts.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16


class T5LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return weight * xf.astype(x.dtype)


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 bucket function (static — computed on host with numpy)."""
    ret = np.zeros_like(relative_position)
    n = num_buckets // 2
    ret += (relative_position > 0).astype(np.int64) * n
    rp = np.abs(relative_position)
    max_exact = n // 2
    is_small = rp < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, n - 1)
    ret += np.where(is_small, rp, val_if_large)
    return ret


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias=None):
        cfg = self.cfg
        b, t, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="v")(x)
        q = q.reshape(b, t, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, t, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, t, cfg.num_heads, cfg.d_kv)
        # T5 attention is NOT scaled by sqrt(d_kv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)

        if self.has_relative_bias:
            rel_bias_table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
            )
            pos = np.arange(t)
            buckets = relative_position_bucket(
                pos[None, :] - pos[:, None],
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
            position_bias = rel_bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)[None]

        if position_bias is not None:
            logits = logits + position_bias.astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, jnp.float32(-1e9))
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        out = out.astype(cfg.dtype).reshape(b, t, inner)
        out = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="o")(out)
        return out, position_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias=None):
        cfg = self.cfg
        y = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps, name="attn_norm")(x)
        y, position_bias = T5Attention(
            cfg, has_relative_bias=self.has_relative_bias, name="attn"
        )(y, mask, position_bias)
        x = x + y
        y = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps, name="ffn_norm")(x)
        y = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi")(y)
        y = nn.relu(y)
        y = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="wo")(y)
        return x + y, position_bias


class T5Encoder(nn.Module):
    """tokens (B, L) int32, mask (B, L) bool -> last hidden state (B, L, d) f32."""

    cfg: T5Config

    @nn.compact
    def __call__(self, tokens, mask):
        cfg = self.cfg
        embed = self.param(
            "token_embed", nn.initializers.normal(1.0), (cfg.vocab_size, cfg.d_model)
        )
        x = embed[tokens].astype(cfg.dtype)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, has_relative_bias=(i == 0), name=f"block_{i}"
            )(x, mask, position_bias)
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps, name="final_norm")(x)
        x = x * mask[..., None]  # zero padded positions for downstream mean-pooling
        return x.astype(jnp.float32)
