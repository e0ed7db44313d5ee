"""DINOv2-style ViT (frozen vision backbone) in JAX.

Re-implements the behavior the reference gets from
`torch.hub.load("facebookresearch/dinov2", "dinov2_vits14")` wrapped in
`DinoViTEmbedder` (reference: architecture/allenact_preprocessors/
dino_preprocessors.py:20-35): 224x384 input, center width crop to 378,
14x14 patchify -> 16x27 patch tokens -> final-norm patch tokens -> adaptive
average pool to a (7, 12) grid.

TPU-native choices:
  * Positional embeddings are interpolated ONCE at weight-conversion time for
    the fixed 16x27 grid (the reference re-interpolates every forward on GPU);
    the flax param already has the target shape, so the jitted forward is pure
    matmuls + layernorms on the MXU.
  * The torch `AdaptiveAvgPool2d((7, 12))` becomes two small static pooling
    matrices applied as matmuls (exact same bin arithmetic).
  * bf16 activations, f32 layernorm statistics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from safevla_tpu.models.norms import CompatLayerNorm


@dataclass(frozen=True)
class DinoViTConfig:
    patch_size: int = 14
    embed_dim: int = 384  # ViT-S
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    img_height: int = 224
    img_width: int = 378  # after center width crop from 384
    layerscale: bool = True
    use_cls_token: bool = True  # False for SigLIP-style patch-only trunks
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def grid(self) -> tuple[int, int]:
        return self.img_height // self.patch_size, self.img_width // self.patch_size

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw


def adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Exact torch AdaptiveAvgPool1d bin weights as an (out, in) matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


class ViTAttention(nn.Module):
    cfg: DinoViTConfig

    @nn.compact
    def __call__(self, x, key_lens=None):
        b, t, d = x.shape
        h = self.cfg.num_heads
        qkv = nn.Dense(3 * d, dtype=self.cfg.dtype, name="qkv")(x)
        # timm's qkv layout reshapes (3*d,) -> (3, h, dh): q IS lanes [0:d],
        # exactly the packed [q|k|v] form the kernel consumes
        from safevla_tpu.ops.flash_attention import attention_qkv

        out = attention_qkv(qkv, h, key_lens=key_lens).astype(self.cfg.dtype)
        return nn.Dense(d, dtype=self.cfg.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """One transformer block. Scan-body convention: returns (x, None) so the
    layer stack can run as ONE `nn.scan` module — all `depth` layers' params
    live in stacked leaves (leading axis = depth). That cuts the backbone
    from ~14*depth param leaves to ~14, which matters twice: per-dispatch
    argument marshaling in the rollout hot loop (~1k dispatches/window on a
    one-core host) and the lowered HLO size (one block traced, not depth)."""

    cfg: DinoViTConfig

    @nn.compact
    def __call__(self, x, key_lens=None):
        d = self.cfg.embed_dim
        y = CompatLayerNorm(out_dtype=self.cfg.dtype, name="norm1")(x)
        y = ViTAttention(self.cfg, name="attn")(y, key_lens=key_lens)
        if self.cfg.layerscale:
            y = y * self.param("ls1_gamma", nn.initializers.constant(1e-5), (d,)).astype(self.cfg.dtype)
        x = x + y
        y = CompatLayerNorm(out_dtype=self.cfg.dtype, name="norm2")(x)
        hidden = int(d * self.cfg.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.cfg.dtype, name="mlp_fc1")(y)
        # gelu precision follows the compute dtype: in bf16 the tanh
        # approximation's ~1e-3 error sits below bf16's own rounding noise
        # and saves ~15% of the ViT forward (erf is VPU-expensive); f32 runs
        # (golden-parity vs torch) keep the exact erf form
        y = nn.gelu(y, approximate=self.cfg.dtype != jnp.float32)
        y = nn.Dense(d, dtype=self.cfg.dtype, name="mlp_fc2")(y)
        if self.cfg.layerscale:
            y = y * self.param("ls2_gamma", nn.initializers.constant(1e-5), (d,)).astype(self.cfg.dtype)
        return x + y, None


class DinoViT(nn.Module):
    """Frozen DINOv2 backbone. Input (B, H, W, 3) normalized float.

    Returns pooled patch features (B, 7, 12, embed_dim) in f32.
    """

    cfg: DinoViTConfig
    pool_grid: tuple[int, int] = (7, 12)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b = x.shape[0]
        # center width crop 384 -> 378 (reference dino_preprocessors.py:30)
        excess = x.shape[2] - cfg.img_width
        if excess > 0:
            x = x[:, :, excess // 2 : excess // 2 + cfg.img_width, :]
        x = x.astype(cfg.dtype)
        # patchify as reshape + matmul: a strided conv with 3 input channels
        # wastes >95% of the MXU (channels pad to the 128-lane tile); patch
        # extraction + one (P*P*3, D) matmul runs at full tile occupancy.
        # Params keep the conv layout (P, P, 3, D) for checkpoint parity.
        p = cfg.patch_size
        gh, gw = cfg.grid
        kernel = self.param(
            "patch_embed_kernel",
            nn.initializers.lecun_normal(),
            (p, p, 3, cfg.embed_dim),
        )
        bias = self.param("patch_embed_bias", nn.initializers.zeros, (cfg.embed_dim,))
        x = x.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * 3)
        w = kernel.reshape(p * p * 3, cfg.embed_dim).astype(cfg.dtype)
        x = (
            jnp.einsum("bnk,kd->bnd", x, w, preferred_element_type=jnp.float32)
            + bias
        ).astype(cfg.dtype)

        n_prefix = 1 if cfg.use_cls_token else 0
        # pos_embed is stored PRE-INTERPOLATED for (prefix + gh*gw) tokens
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_prefix + cfg.num_patches, cfg.embed_dim),
        )
        if cfg.use_cls_token:
            cls_token = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)).astype(cfg.dtype), x],
                axis=1,
            )
        x = x + pos_embed.astype(cfg.dtype)

        # pad the token axis ONCE to the flash kernel's sublane multiple
        # (433 -> 448 for DINOv2-S): otherwise every block pays an explicit
        # HBM pad+slice around its attention call (the kernel's internal
        # padding, hoisted). Padded tokens are excluded from every softmax
        # via key_lens, so consumed outputs are bit-identical.
        n_tok = x.shape[1]
        pad = -n_tok % 16
        key_lens = None
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            key_lens = jnp.full((b,), n_tok, jnp.int32)

        # all blocks as ONE scan module with depth-stacked param leaves (see
        # ViTBlock docstring); key_lens broadcasts unscanned to every layer.
        # Lowering is platform-defaulted (unrolled on TPU, rolled on CPU);
        # SAFEVLA_VIT_UNROLL overrides — identical param tree either way.
        from safevla_tpu.models.scan_policy import stack_unroll

        unroll = stack_unroll(cfg.depth, "SAFEVLA_VIT_UNROLL")
        blocks = nn.scan(
            ViTBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=cfg.depth,
            unroll=unroll,
        )(cfg, name="blocks")
        x, _ = blocks(x, key_lens)

        x = CompatLayerNorm(name="norm")(x)  # out f32 (flax dtype=f32)
        patches = x[:, n_prefix:n_tok, :].astype(jnp.float32)  # (B, gh*gw, D)

        # adaptive average pool (gh, gw) -> pool_grid, as two static matmuls
        ph, pw = self.pool_grid
        mh = jnp.asarray(adaptive_pool_matrix(gh, ph))
        mw = jnp.asarray(adaptive_pool_matrix(gw, pw))
        feat = patches.reshape(b, gh, gw, cfg.embed_dim)
        feat = jnp.einsum("og,bgwd->bowd", mh, feat)
        feat = jnp.einsum("ow,bhwd->bhod", mw, feat)
        return feat  # (B, ph, pw, D)


VIT_CONFIGS = {
    "dinov2_vits14": DinoViTConfig(embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": DinoViTConfig(embed_dim=768, depth=12, num_heads=12),
    "dinov2_vitl14": DinoViTConfig(embed_dim=1024, depth=24, num_heads=16),
    # SigLIP ViT-B/16-256 trunk: patch-only, no layerscale, square input
    # (reference architecture/allenact_preprocessors/siglip_preprocessors.py:18-33)
    "siglip_vitb16_256": DinoViTConfig(
        patch_size=16, embed_dim=768, depth=12, num_heads=12,
        img_height=256, img_width=256, layerscale=False, use_cls_token=False,
    ),
}
