"""Alternative text towers: SigLIP-style text transformer.

The reference's offline stack can swap T5 for the SigLIP text tower
(reference architecture/models/transformer_models/text_cond_visual_encoder.py
"siglip" option via open_clip's TextTransformer). This is the JAX
counterpart: learned positional embeddings, pre-LN blocks, GELU MLP,
final LN — returning the full hidden sequence (the fusion transformer
consumes token sequences, not pooled embeddings).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class TextTowerConfig:
    vocab_size: int = 32000
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    max_tokens: int = 64
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16


class _Block(nn.Module):
    cfg: TextTowerConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        d, h = cfg.d_model, cfg.num_heads
        dh = d // h
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln1")(x)
        y = y.astype(cfg.dtype)
        b, t, _ = y.shape
        qkv = nn.Dense(3 * d, dtype=cfg.dtype, name="qkv")(y).reshape(b, t, 3, h, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(dh))
        logits = jnp.where(mask[:, None, None, :], logits, jnp.float32(-1e9))
        p = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=cfg.dtype, name="proj")(attn)
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln2")(x)
        y = nn.Dense(int(d * cfg.mlp_ratio), dtype=cfg.dtype, name="fc1")(y.astype(cfg.dtype))
        # exact GELU: open_clip's TextTransformer uses torch nn.GELU
        # (approximate='none'); keep bit-comparable for weight import
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=cfg.dtype, name="fc2")(y)
        return x + y


class SigLIPTextEncoder(nn.Module):
    """tokens (B, L) int32, mask (B, L) bool -> hidden (B, L, D) f32."""

    cfg: TextTowerConfig

    @nn.compact
    def __call__(self, tokens, mask):
        cfg = self.cfg
        embed = self.param(
            "token_embed", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.d_model)
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01), (cfg.max_tokens, cfg.d_model)
        )
        x = (embed[tokens] + pos[None, : tokens.shape[1]]).astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = _Block(cfg, name=f"block_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="final_ln")(x)
        return (x * mask[..., None]).astype(jnp.float32)
