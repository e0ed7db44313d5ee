"""CLIP modified-ResNet encoder: semantics vs a torch oracle + registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from safevla_tpu.models.image_encoders import (
    REFERENCE_ENCODER_ALIASES,
    build_image_encoder,
    encoder_feature_dim,
)
from safevla_tpu.models.resnet import (
    ClipResNet,
    ClipResNetConfig,
    import_clip_resnet,
)


class _TorchClipBottleneck(tnn.Module):
    """Oracle reimplementation of CLIP's anti-aliased bottleneck semantics
    (public OpenAI CLIP RN architecture): stride-2 via AvgPool before the
    final 1x1 conv; shortcut = AvgPool -> 1x1 conv -> BN."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity(),
                tnn.Conv2d(inplanes, planes * 4, 1, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchClipTrunk(tnn.Module):
    def __init__(self, width=8, layers=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width // 2)
        self.conv2 = tnn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width // 2)
        self.conv3 = tnn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width)
        self.avgpool = tnn.AvgPool2d(2)
        self.relu = tnn.ReLU()
        blocks = []
        inplanes = width
        for stage, n in enumerate(layers):
            planes = width * (2**stage)
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                blocks.append(_TorchClipBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
        self.blocks = tnn.ModuleList(blocks)
        self.layers = layers

    def state_dict_clip_naming(self):
        """Rename flat block list to CLIP's layer{n}.{i} scheme, with the
        downsample Sequential producing .0 (conv) / .1 (bn) keys."""
        sd = {}
        for k, v in self.named_parameters():
            sd[k] = v.detach()
        for k, v in self.named_buffers():
            sd[k] = v.detach()
        out = {}
        idx = 0
        block_of = {}
        for stage, n in enumerate(self.layers):
            for i in range(n):
                block_of[idx] = f"layer{stage + 1}.{i}"
                idx += 1
        for k, v in sd.items():
            if k.startswith("blocks."):
                parts = k.split(".")
                rest = ".".join(parts[2:])
                # torch downsample keys: downsample.0 is Identity/AvgPool,
                # downsample.1 conv, downsample.2 bn -> CLIP uses .0/.1
                rest = rest.replace("downsample.1", "downsample.0").replace(
                    "downsample.2", "downsample.1"
                )
                out[f"{block_of[int(parts[1])]}.{rest}"] = v
            else:
                out[k] = v
        return {k: v for k, v in out.items() if "num_batches_tracked" not in k}

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for b in self.blocks:
            x = b(x)
        return x


@pytest.mark.parametrize("hw", [(64, 96)])
def test_clip_resnet_matches_torch_oracle(hw):
    torch.manual_seed(0)
    oracle = _TorchClipTrunk(width=8, layers=(1, 1, 1, 1)).eval()
    # randomize BN stats so the test actually checks the folding
    for m in oracle.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.3, 0.3)

    cfg = ClipResNetConfig(width=8, layers=(1, 1, 1, 1), dtype=jnp.float32)
    params = import_clip_resnet(oracle.state_dict_clip_naming(), cfg)

    h, w = hw
    x = np.random.default_rng(1).normal(size=(2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    model = ClipResNet(cfg, pool_grid=(ref.shape[1], ref.shape[2]))
    got = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_registry_aliases_and_dims():
    assert REFERENCE_ENCODER_ALIASES["ClipResNet50"] == "clip_rn50"
    assert encoder_feature_dim("ClipResNet50") == 2048
    assert encoder_feature_dim("Dinov2Small") == 384
    enc = build_image_encoder("clip_rn50")
    assert enc.pool_grid == (7, 12)
    with pytest.raises(KeyError):
        build_image_encoder("nope")


def test_clip_rn50_output_grid_at_train_resolution():
    """224x384 input -> stage-4 grid is exactly (7, 12): pool is identity."""
    cfg = ClipResNetConfig(width=8, layers=(1, 1, 1, 1), dtype=jnp.float32)
    model = ClipResNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 384, 3)))
    out = jax.jit(model.apply)(params, jnp.zeros((1, 224, 384, 3)))
    assert out.shape == (1, 7, 12, cfg.out_dim)
    assert out.dtype == jnp.float32
