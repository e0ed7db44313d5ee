"""SigLIP trunk + text tower: weight-import oracle tests and the config
preset that selects them end-to-end.

Oracle pattern as in test_resnet.py: build a small torch module IN the test
replicating the upstream architecture with the upstream state-dict naming
(timm ViT for the trunk, open_clip TextTransformer for the text tower —
reference siglip_preprocessors.py:18-33, text_cond_visual_encoder.py:35-44),
convert with the importer, compare outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from safevla_tpu.models.convert import import_siglip_text, import_siglip_trunk


# ---------------------------------------------------------------------------
# trunk oracle (timm ViT naming: patch_embed.proj, blocks.N.attn.qkv, ...)
# ---------------------------------------------------------------------------


class _TimmBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(d, 3 * d)
        self.attn.proj = tnn.Linear(d, d)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(d, 4 * d)
        self.mlp.fc2 = tnn.Linear(4 * d, d)
        self.h = h

    def forward(self, x):
        b, n, d = x.shape
        h = self.h
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) / (d // h) ** 0.5, dim=-1)
        y = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class _TimmSigLIPTrunk(tnn.Module):
    """Patch-only ViT (no cls token, no layerscale) with timm naming."""

    def __init__(self, d=32, depth=2, h=2, p=16, img=(32, 48)):
        super().__init__()
        gh, gw = img[0] // p, img[1] // p
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, d, p, stride=p)
        self.pos_embed = tnn.Parameter(torch.randn(1, gh * gw, d) * 0.02)
        self.blocks = tnn.ModuleList([_TimmBlock(d, h) for _ in range(depth)])
        self.norm = tnn.LayerNorm(d)
        self.grid = (gh, gw)

    def forward(self, x):  # x (B, 3, H, W) -> pooled grid feats (B, gh, gw, D)
        x = self.patch_embed.proj(x)
        b, d, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x.reshape(b, gh, gw, d)


def test_siglip_trunk_matches_torch_oracle():
    from safevla_tpu.models.vit import DinoViT, DinoViTConfig

    torch.manual_seed(0)
    oracle = _TimmSigLIPTrunk().eval()
    params = import_siglip_trunk(oracle.state_dict(), depth=2)

    cfg = DinoViTConfig(
        patch_size=16, embed_dim=32, depth=2, num_heads=2,
        img_height=32, img_width=48, layerscale=False, use_cls_token=False,
        dtype=jnp.float32,
    )
    model = DinoViT(cfg, pool_grid=oracle.grid)  # identity pooling

    x = np.random.default_rng(1).normal(size=(2, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_siglip_trunk_importer_accepts_open_clip_prefix():
    torch.manual_seed(0)
    oracle = _TimmSigLIPTrunk().eval()
    sd = {f"visual.trunk.{k}": v for k, v in oracle.state_dict().items()}
    sd["logit_scale"] = torch.zeros(())  # unrelated open_clip key
    p1 = import_siglip_trunk(oracle.state_dict(), depth=2)
    p2 = import_siglip_trunk(sd, depth=2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# text tower oracle (open_clip TextTransformer naming: resblocks, in_proj...)
# ---------------------------------------------------------------------------


class _ClipTextBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d)
        self.ln_2 = tnn.LayerNorm(d)
        self.attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.mlp = tnn.Module()
        self.mlp.c_fc = tnn.Linear(d, 4 * d)
        self.mlp.c_proj = tnn.Linear(4 * d, d)

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False)  # SigLIP: no causal mask
        x = x + y
        y = self.ln_2(x)
        return x + self.mlp.c_proj(tnn.functional.gelu(self.mlp.c_fc(y)))


class _ClipTextTower(tnn.Module):
    def __init__(self, vocab=128, d=32, h=2, depth=2, ctx=8):
        super().__init__()
        self.token_embedding = tnn.Embedding(vocab, d)
        self.positional_embedding = tnn.Parameter(torch.randn(ctx, d) * 0.01)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [_ClipTextBlock(d, h) for _ in range(depth)]
        )
        self.ln_final = tnn.LayerNorm(d)

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding[None]
        for blk in self.transformer.resblocks:
            x = blk(x)
        return self.ln_final(x)


def test_siglip_text_matches_torch_oracle():
    from safevla_tpu.models.text_towers import SigLIPTextEncoder, TextTowerConfig

    torch.manual_seed(0)
    oracle = _ClipTextTower().eval()
    params = import_siglip_text(oracle.state_dict(), num_layers=2)

    cfg = TextTowerConfig(
        vocab_size=128, d_model=32, num_layers=2, num_heads=2,
        max_tokens=8, dtype=jnp.float32,
    )
    model = SigLIPTextEncoder(cfg)
    tokens = np.random.default_rng(2).integers(0, 128, (3, 8)).astype(np.int32)
    mask = np.ones((3, 8), bool)  # SigLIP runs fixed-length, unmasked
    with torch.no_grad():
        ref = oracle(torch.from_numpy(tokens.astype(np.int64))).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# config preset: SigLIP trunk + text tower end-to-end
# ---------------------------------------------------------------------------


def test_siglip_preset_selects_both_towers():
    from safevla_tpu.config import Config, apply_overrides
    from safevla_tpu.models.actor_critic import SafeVLAPolicy
    from safevla_tpu.models.text_towers import SigLIPTextEncoder

    cfg = apply_overrides(Config(), ["preset=siglip_base"])
    assert cfg.model.vision_backbone == "siglip_vitb16_256"
    assert cfg.model.text_backbone == "siglip_base"
    assert cfg.model.text_embed_size == 768
    assert cfg.model.image_size == (256, 256)

    # explicit overrides still win over the preset
    cfg2 = apply_overrides(
        Config(), ["preset=siglip_base", "model.text_max_tokens=16"]
    )
    assert cfg2.model.text_max_tokens == 16

    policy = SafeVLAPolicy(cfg.model)
    assert isinstance(policy.t5, SigLIPTextEncoder)
    assert policy.t5.cfg.d_model == 768


def test_siglip_preset_tiny_forward(tiny_model_cfg):
    """A structurally-complete tiny policy with SigLIP-style towers runs the
    packed forward (normalization constants switch with the trunk)."""
    import dataclasses

    from safevla_tpu.constants import rgb_norm_constants
    from safevla_tpu.models import vit as vitmod
    from safevla_tpu.models.actor_critic import SafeVLAPolicy

    means, stds = rgb_norm_constants("siglip_vitb16_256")
    assert means == (0.5, 0.5, 0.5) and stds == (0.5, 0.5, 0.5)

    vitmod.VIT_CONFIGS["siglip_tiny_test"] = vitmod.DinoViTConfig(
        patch_size=14, embed_dim=32, depth=1, num_heads=2,
        img_height=28, img_width=42, layerscale=False, use_cls_token=False,
    )
    cfg = dataclasses.replace(
        tiny_model_cfg, vision_backbone="siglip_tiny_test",
        text_backbone="siglip_base",
    )
    policy = SafeVLAPolicy(cfg)
    params = policy.init_params(jax.random.PRNGKey(0))
    gh, gw = cfg.vision_grid
    B, T, L = 2, 4, cfg.text_max_tokens
    out = policy.forward_seq(
        params,
        jnp.zeros((B, T, gh, gw, cfg.vision_feature_dim)),
        jnp.zeros((B, T, gh, gw, cfg.vision_feature_dim)),
        jnp.zeros((B, L, cfg.text_embed_size)),
        jnp.ones((B, L), bool),
        jnp.zeros((B, T), jnp.int32),
        jnp.ones((B, T), jnp.int32),
        jnp.zeros((B, T), jnp.int32),
        jnp.tile(jnp.arange(T), (B, 1)),
        jnp.zeros((B, T), jnp.int32),
    )
    assert out.logits.shape == (B, T, cfg.num_actions)
    assert np.isfinite(np.asarray(out.logits)).all()
