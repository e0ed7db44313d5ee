"""Alternative visual-fusion encoders for the offline IL model family.

Counterpart of the reference's `NonTxMultiCameraVisualEncoder`
(reference: architecture/models/transformer_models/
text_cond_visual_encoder.py:298-443): a transformer-free fusion path that
compresses each camera's frozen-encoder grid with 1x1 convs, injects the
mean-pooled instruction embedding as extra channels, combines with more 1x1
convs, and flattens to one token per timestep. (The transformer-based
`TextCondMultiCameraVisualEncoder` counterpart is the PolicyTower's
embed_obs/fusion path in models/actor_critic.py.)

TPU-first: every 1x1 conv is a Dense over the channel axis — XLA lowers the
whole stack to a fused chain of MXU matmuls over the (B*T*gh*gw) rows; there
is no conv lowering or layout change anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class NonTxEncoderConfig:
    """Mirrors reference NonTxVisualEncoderConfig (defaults included)."""

    compressor_hidden_dims: Tuple[int, int] = (128, 32)
    text_adapter_output_dim: int = 32
    image_text_combiner_hidden_dims: Tuple[int, int] = (64, 32)
    final_out_dim: int = 512
    pool_grid: Tuple[int, int] = (7, 12)
    dtype: jnp.dtype = jnp.bfloat16


def _adapter(dim: int, name: str, dtype):
    """Linear -> LayerNorm -> ReLU (the reference's ubiquitous adapter)."""

    class Adapter(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(dim, dtype=dtype, name="fc")(x)
            x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
            return nn.relu(x).astype(dtype)

    return Adapter(name=name)


class NonTxVisualEncoder(nn.Module):
    """frames: {camera: (B, T, gh, gw, C)} frozen-encoder grids,
    text_hidden: (B, L, Dt). Returns (fused (B, T, final_out_dim) f32,
    text_feats (B, L, final_out_dim) f32)."""

    cfg: NonTxEncoderConfig = field(default_factory=NonTxEncoderConfig)

    @nn.compact
    def __call__(self, frames: Dict[str, jax.Array], text_hidden: jax.Array):
        cfg = self.cfg
        c0, c1 = cfg.compressor_hidden_dims
        k0, k1 = cfg.image_text_combiner_hidden_dims
        cameras = sorted(frames)
        b, t, gh, gw, _ = frames[cameras[0]].shape

        # text adapters (reference l.319-330)
        text_feats = _adapter(cfg.final_out_dim, "text_adapter", cfg.dtype)(
            text_hidden.astype(cfg.dtype)
        )
        txt = _adapter(
            cfg.text_adapter_output_dim, "text_adapter_for_combiner", cfg.dtype
        )(text_feats)
        txt = jnp.mean(txt, axis=1)  # (B, D)
        txt = jnp.broadcast_to(
            txt[:, None, None, None, :], (b, t, gh, gw, txt.shape[-1])
        )

        # compressor + combiner weights are SHARED across cameras, like the
        # reference's single visual_compressor/image_text_combiner modules —
        # so stack cameras into the batch and run one fused matmul chain
        x = jnp.stack([frames[c] for c in cameras]).astype(cfg.dtype)
        # visual compressor: two 1x1 convs == channel Denses (l.359-376)
        x = nn.relu(nn.Dense(c0, dtype=cfg.dtype, name="comp0")(x))
        x = nn.relu(nn.Dense(c1, dtype=cfg.dtype, name="comp1")(x))
        x = jnp.concatenate(
            [x, jnp.broadcast_to(txt, (len(cameras),) + txt.shape)], axis=-1
        )
        # image-text combiner (l.378-393)
        x = nn.relu(nn.Dense(k0, dtype=cfg.dtype, name="comb0")(x))
        x = nn.relu(nn.Dense(k1, dtype=cfg.dtype, name="comb1")(x))
        per_cam = [x[i].reshape(b, t, gh * gw * k1) for i in range(len(cameras))]

        fused = _adapter(cfg.final_out_dim, "final_adapter", cfg.dtype)(
            jnp.concatenate(per_cam, axis=-1)
        )
        return fused.astype(jnp.float32), text_feats.astype(jnp.float32)
