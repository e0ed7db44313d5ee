"""Image-encoder registry: backbone name -> frozen encoder module.

Counterpart of the reference's `IMAGE_ENCODERS` dict
(reference: architecture/models/transformer_models/image_encoders.py:104-113).
Every encoder follows the same contract: flax module, input (B, H, W, 3)
normalized float, output (B, 7, 12, feature_dim) f32, with a `pool_grid`
attribute — so the policy towers never see which backbone produced the grid.
"""

from __future__ import annotations

from safevla_tpu.models.resnet import RESNET_CONFIGS, ClipResNet
from safevla_tpu.models.vit import VIT_CONFIGS, DinoViT

# reference registry names -> this framework's backbone keys
REFERENCE_ENCODER_ALIASES = {
    "Dinov2Small": "dinov2_vits14",
    "Dinov2Base": "dinov2_vitb14",
    "ClipResNet50": "clip_rn50",
    "SigLIPBase": "siglip_vitb16_256",
}


def build_image_encoder(name: str):
    name = REFERENCE_ENCODER_ALIASES.get(name, name)
    if name in VIT_CONFIGS:
        return DinoViT(VIT_CONFIGS[name])
    if name in RESNET_CONFIGS:
        return ClipResNet(RESNET_CONFIGS[name])
    raise KeyError(
        f"unknown vision backbone {name!r}; known: "
        f"{sorted(VIT_CONFIGS) + sorted(RESNET_CONFIGS)}"
    )


def encoder_feature_dim(name: str) -> int:
    name = REFERENCE_ENCODER_ALIASES.get(name, name)
    if name in VIT_CONFIGS:
        return VIT_CONFIGS[name].embed_dim
    if name in RESNET_CONFIGS:
        return RESNET_CONFIGS[name].out_dim
    raise KeyError(name)
