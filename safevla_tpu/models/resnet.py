"""CLIP modified-ResNet visual trunk (frozen image encoder).

Counterpart of the reference's `ClipResNet` encoder
(reference: architecture/models/transformer_models/image_encoders.py:19-47),
which runs CLIP RN50's stem + 4 stages and returns the un-pooled
2048-channel feature map. CLIP's ResNet differs from torchvision's:

- 3-conv stem (width/2, width/2, width) with an average-pool instead of
  max-pool,
- anti-aliased striding: every stride-2 bottleneck average-pools BEFORE its
  final 1x1 conv, and the residual shortcut is avgpool -> 1x1 conv,
- all convolutions bias-free (BatchNorm supplies the affine).

TPU notes: the trunk is frozen (inference only), so BatchNorm is evaluated
with running statistics — expressed here as a per-channel scale/shift that
XLA constant-folds into the adjacent convolution. Convs run in bf16 on the
MXU; the BN math is f32. At the training resolution 224x384 the stage-4
output is exactly (7, 12), so the adaptive pool is an identity; other
resolutions reuse the same static pool-matrix contraction as the ViT.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from safevla_tpu.models.vit import adaptive_pool_matrix


@dataclass(frozen=True)
class ClipResNetConfig:
    width: int = 64
    layers: Tuple[int, ...] = (3, 4, 6, 3)  # RN50
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def out_dim(self) -> int:
        return self.width * 8 * Bottleneck.expansion


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = gamma * (x - mean) / sqrt(var + eps) + beta.

    Running statistics are plain parameters (imported from the torch
    checkpoint); there is no training mode because the encoder is frozen.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale = gamma * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (x.astype(jnp.float32) * scale + (beta - mean * scale)).astype(x.dtype)


def _conv(features: int, kernel: int, stride: int = 1, name: str = None, dtype=jnp.bfloat16):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def _avg_pool(x, stride: int):
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    expansion = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        y = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(y))
        y = _conv(self.planes, 3, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(y))
        if self.stride > 1:
            y = _avg_pool(y, self.stride)
        y = _conv(out_ch, 1, name="conv3", dtype=self.dtype)(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)

        identity = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = _conv(out_ch, 1, name="downsample_conv", dtype=self.dtype)(identity)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ClipResNet(nn.Module):
    """Frozen CLIP-RN trunk. Input (B, H, W, 3) normalized float.

    Returns pooled features (B, 7, 12, width*32) in f32 — the same contract
    as `DinoViT.__call__`, so the policy towers are encoder-agnostic.
    """

    cfg: ClipResNetConfig
    pool_grid: tuple[int, int] = (7, 12)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        w = cfg.width
        x = x.astype(cfg.dtype)
        # stem
        x = _conv(w // 2, 3, stride=2, name="conv1", dtype=cfg.dtype)(x)
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn1")(x))
        x = _conv(w // 2, 3, name="conv2", dtype=cfg.dtype)(x)
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn2")(x))
        x = _conv(w, 3, name="conv3", dtype=cfg.dtype)(x)
        x = nn.relu(FrozenBatchNorm(w, name="bn3")(x))
        x = _avg_pool(x, 2)
        # stages
        for stage, blocks in enumerate(cfg.layers):
            planes = w * (2**stage)
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = Bottleneck(
                    planes, stride=stride, dtype=cfg.dtype, name=f"layer{stage + 1}_{i}"
                )(x)
        x = x.astype(jnp.float32)  # (B, gh, gw, out_dim)

        b, gh, gw, d = x.shape
        ph, pw = self.pool_grid
        if (gh, gw) != (ph, pw):
            mh = jnp.asarray(adaptive_pool_matrix(gh, ph))
            mw = jnp.asarray(adaptive_pool_matrix(gw, pw))
            x = jnp.einsum("og,bgwd->bowd", mh, x)
            x = jnp.einsum("ow,bhwd->bhod", mw, x)
        return x


RESNET_CONFIGS = {
    "clip_rn50": ClipResNetConfig(),
}


def _np_conv(t) -> np.ndarray:
    """torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.asarray(t, dtype=np.float32).transpose(2, 3, 1, 0)


def _np_bn(sd, prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }


def import_clip_resnet(visual_sd: dict, cfg: ClipResNetConfig = ClipResNetConfig()) -> dict:
    """CLIP `model.visual` state dict -> ClipResNet params pytree.

    Accepts keys with or without a leading `visual.`; the attention-pool head
    (`attnpool.*`) is ignored, matching the reference forward which never
    runs it (image_encoders.py:28-46).
    """
    sd = {
        (k[len("visual."):] if k.startswith("visual.") else k): v
        for k, v in visual_sd.items()
    }
    params: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = {"kernel": _np_conv(sd[f"conv{i}.weight"])}
        params[f"bn{i}"] = _np_bn(sd, f"bn{i}")
    for stage, blocks in enumerate(cfg.layers):
        for i in range(blocks):
            src = f"layer{stage + 1}.{i}"
            dst: dict = {}
            for j in (1, 2, 3):
                dst[f"conv{j}"] = {"kernel": _np_conv(sd[f"{src}.conv{j}.weight"])}
                dst[f"bn{j}"] = _np_bn(sd, f"{src}.bn{j}")
            if f"{src}.downsample.0.weight" in sd:
                dst["downsample_conv"] = {"kernel": _np_conv(sd[f"{src}.downsample.0.weight"])}
                dst["downsample_bn"] = _np_bn(sd, f"{src}.downsample.1")
            params[f"layer{stage + 1}_{i}"] = dst
    return {"params": params}
