"""Deterministic, seedable data augmentation on device.

The reference samples a torchvision transform pipeline once every
`num_steps_to_change` steps and applies it on CPU
(reference: dino_preprocessors.py:224-231, utils/transformation_util.py:12-48).
The v2 list: ColorJitter(0.4, 0.4, 0.2, 0.05), GaussianBlur(k=(5,9),
sigma 0.1-2), RandomResizedCrop(scale 0.9-1), RandomPosterize(bits 7/6/5/4
each p=0.2), RandomAdjustSharpness(2, p=0.5); v1 differs in jitter strength
(0.4/0.4/0.4/0.2), a single Posterize(7, p=0.3), always-on sharpness, and
RandomGrayscale(0.2).

Here the whole pipeline is a small parameter struct sampled from a JAX PRNG
key (host chooses when to resample — every `max_steps` env steps, as the
reference does) and applied as fused, statically-shaped device math inside
the same jit as normalization + the vision encoder: the blur is a separable
depthwise conv whose gaussian weights are computed in-graph from the sigma
scalar, the crop-resize is `jax.image.scale_and_translate` (continuous
scale/offset scalars, fixed output shape — no dynamic shapes), posterize and
sharpness are elementwise. One compiled program serves every resample. That
also makes eval-time augmentation exactly reproducible from the seed (the
reference's eval runs WITH augmentation on — eval.sh:18 — so parity
evaluation needs this determinism).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentParams(NamedTuple):
    brightness: jax.Array  # multiplicative factor
    contrast: jax.Array
    saturation: jax.Array
    hue: jax.Array  # additive shift in [-0.05, 0.05] (fraction of the hue circle)
    enabled: jax.Array  # 0/1 gate
    blur_sigma: jax.Array  # gaussian blur sigma; always on when enabled
    crop_zoom: jax.Array  # RandomResizedCrop zoom factor >= 1 (1 = no crop)
    crop_cx: jax.Array  # crop offset fractions in [0, 1]
    crop_cy: jax.Array
    posterize_bits: jax.Array  # effective bit depth; 8 = no-op
    sharpness: jax.Array  # blend factor; 1 = no-op
    grayscale: jax.Array  # 0/1 (v1 only)


def sample_augment_params(
    key: jax.Array,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.2,
    hue: float = 0.05,
    version: str = "v2",
) -> AugmentParams:
    """Sample one concrete transform like the reference's
    `sample_a_specific_transform` (transformation_util.py:55+): jitter factors
    uniform in torchvision's ranges, blur sigma U(0.1, 2), crop area
    U(0.9, 1), posterize gates, sharpness/grayscale coin flips."""
    if version == "v1":
        saturation, hue = 0.4, 0.2
    keys = jax.random.split(key, 12)
    u = lambda k, v: jax.random.uniform(k, (), minval=max(0.0, 1 - v), maxval=1 + v)
    area = jax.random.uniform(keys[4], (), minval=0.9, maxval=1.0)
    if version == "v2":
        # four independent Posterize(bits, p=0.2); min bits of those applied
        gates = jax.random.uniform(keys[5], (4,)) < 0.2
        bits_opts = jnp.asarray([7.0, 6.0, 5.0, 4.0])
        bits = jnp.min(jnp.where(gates, bits_opts, 8.0))
        sharpness = jnp.where(jax.random.uniform(keys[6], ()) < 0.5, 2.0, 1.0)
        grayscale = jnp.zeros(())
    elif version == "v1":
        bits = jnp.where(jax.random.uniform(keys[5], ()) < 0.3, 7.0, 8.0)
        sharpness = jnp.full((), 2.0)  # RandomAdjustSharpness default p applies... v1 lists it unconditioned
        grayscale = (jax.random.uniform(keys[7], ()) < 0.2).astype(jnp.float32)
    else:
        raise NotImplementedError(f"augmentation versions are v1/v2, got {version}")
    return AugmentParams(
        brightness=u(keys[0], brightness),
        contrast=u(keys[1], contrast),
        saturation=u(keys[2], saturation),
        hue=jax.random.uniform(keys[3], (), minval=-hue, maxval=hue),
        enabled=jnp.ones((), jnp.float32),
        blur_sigma=jax.random.uniform(keys[8], (), minval=0.1, maxval=2.0),
        crop_zoom=1.0 / jnp.sqrt(area),
        crop_cx=jax.random.uniform(keys[9], ()),
        crop_cy=jax.random.uniform(keys[10], ()),
        posterize_bits=bits,
        sharpness=sharpness,
        grayscale=grayscale,
    )


def identity_augment_params() -> AugmentParams:
    one = jnp.ones(())
    zero = jnp.zeros(())
    return AugmentParams(
        brightness=one,
        contrast=one,
        saturation=one,
        hue=zero,
        enabled=zero,
        blur_sigma=zero,
        crop_zoom=one,
        crop_cx=0.5 * one,
        crop_cy=0.5 * one,
        posterize_bits=8.0 * one,
        sharpness=one,
        grayscale=zero,
    )


def _rgb_to_grayscale(x):
    return (
        0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    )


import numpy as _np

_RGB2YIQ = _np.asarray(
    [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
    dtype=_np.float64,
)
# exact inverse so a zero hue rotation is a true identity
_YIQ2RGB = _np.linalg.inv(_RGB2YIQ)


def _gaussian_kernel(size: int, sigma):
    i = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    w = jnp.exp(-(i**2) / (2.0 * jnp.maximum(sigma, 1e-6) ** 2))
    return w / jnp.sum(w)


def _geom_dtype():
    """Compute dtype for the blur / resample ops. The sources are uint8
    (8 significant bits), so bf16 (8 mantissa bits) is a quality no-op while
    keeping these per-frame ops on the MXU fast path inside the rollout jit.
    SAFEVLA_AUGMENT_F32=1 forces f32 (used by the oracle-parity tests)."""
    import os

    return jnp.float32 if os.environ.get("SAFEVLA_AUGMENT_F32") else jnp.bfloat16


def _separable_blur(x, sigma, kh: int = 9, kw: int = 5):
    """Depthwise gaussian blur, torchvision kernel_size=(5, 9) semantics.
    x: (N, H, W, 3). Weights come from the traced sigma scalar, so one
    compiled program covers every resample."""
    n, h, w, c = x.shape
    dt = _geom_dtype()
    x = x.astype(dt)
    kv = _gaussian_kernel(kh, sigma).reshape(kh, 1, 1, 1)
    kz = _gaussian_kernel(kw, sigma).reshape(1, kw, 1, 1)
    # depthwise: group count = channels, kernel (kh, kw, 1, C)
    kv3 = jnp.tile(kv, (1, 1, 1, c)).astype(dt)
    kz3 = jnp.tile(kz, (1, 1, 1, c)).astype(dt)
    dnum = jax.lax.conv_dimension_numbers(x.shape, kv3.shape, ("NHWC", "HWIO", "NHWC"))
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, kv3, (1, 1), [(kh // 2, kh // 2), (0, 0)],
        dimension_numbers=dnum, feature_group_count=c, precision=prec,
    )
    y = jax.lax.conv_general_dilated(
        y, kz3, (1, 1), [(0, 0), (kw // 2, kw // 2)],
        dimension_numbers=dnum, feature_group_count=c, precision=prec,
    )
    return y.astype(jnp.float32)


_SHARPNESS_KERNEL = jnp.asarray(
    [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]
) / 13.0


def _smooth3x3(x):
    n, h, w, c = x.shape
    dt = _geom_dtype()
    k = jnp.tile(_SHARPNESS_KERNEL.reshape(3, 3, 1, 1), (1, 1, 1, c)).astype(dt)
    dnum = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x.astype(dt), k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dnum,
        feature_group_count=c, precision=prec,
    ).astype(jnp.float32)


def _crop_resize(x, zoom, cx, cy):
    """RandomResizedCrop as scale_and_translate: zoom >= 1 magnifies a window
    whose top-left is chosen by (cx, cy) within the slack (aspect kept 1)."""
    n, h, w, c = x.shape
    max_off_y = h * (1.0 - 1.0 / zoom)
    max_off_x = w * (1.0 - 1.0 / zoom)
    ty = -zoom * (cy * max_off_y)
    tx = -zoom * (cx * max_off_x)
    dt = _geom_dtype()
    return jax.image.scale_and_translate(
        x.astype(dt),
        x.shape,
        (1, 2),
        jnp.stack([zoom, zoom]).astype(dt),
        jnp.stack([ty, tx]).astype(dt),
        method="linear",
    ).astype(jnp.float32)


def apply_augment(images: jax.Array, p: AugmentParams) -> jax.Array:
    """images (..., H, W, 3) float in [0, 1] -> augmented, same range.

    Pipeline order matches the reference v2 list (transformation_util.py:14-28):
    jitter -> blur -> crop-resize -> posterize -> sharpness (-> grayscale, v1).
    """
    lead = images.shape[:-3]
    x4 = images.reshape((-1,) + images.shape[-3:])

    def jitter(x):
        # brightness
        x = x * p.brightness
        # contrast (about the per-image gray mean)
        mean = jnp.mean(_rgb_to_grayscale(x), axis=(-3, -2, -1), keepdims=True)
        x = (x - mean) * p.contrast + mean
        # saturation (blend with grayscale)
        gray = _rgb_to_grayscale(x)
        x = (x - gray) * p.saturation + gray
        # hue rotation via channel mixing in YIQ space (exact inverse matrix,
        # so hue=0 is an identity; the rotation itself is the standard
        # luma-preserving approximation of a hue shift)
        theta = p.hue * 2.0 * jnp.pi
        cos_h, sin_h = jnp.cos(theta), jnp.sin(theta)
        yiq = jnp.einsum("...c,dc->...d", x, jnp.asarray(_RGB2YIQ, jnp.float32))
        y, i, q = yiq[..., 0], yiq[..., 1], yiq[..., 2]
        i, q = i * cos_h - q * sin_h, i * sin_h + q * cos_h
        x = jnp.einsum(
            "...c,dc->...d",
            jnp.stack([y, i, q], axis=-1),
            jnp.asarray(_YIQ2RGB, jnp.float32),
        )
        return jnp.clip(x, 0.0, 1.0)

    def full(x):
        x = jitter(x)
        x = _separable_blur(x, p.blur_sigma)
        x = _crop_resize(x, p.crop_zoom, p.crop_cx, p.crop_cy)
        # posterize: quantize to 2^bits levels over the uint8 grid (the
        # epsilon keeps exact uint8 multiples like 112/255 from rounding
        # down a whole level under float division)
        step = 2.0 ** (8.0 - p.posterize_bits)
        x = jnp.where(
            p.posterize_bits < 8.0,
            jnp.floor(x * 255.0 / step + 1e-4) * step / 255.0,
            x,
        )
        # sharpness: blend away from the 3x3 smoothed image
        smooth = _smooth3x3(x)
        x = smooth + p.sharpness * (x - smooth)
        # grayscale (v1 only)
        gray = _rgb_to_grayscale(x)
        x = jnp.where(p.grayscale > 0, jnp.broadcast_to(gray, x.shape), x)
        return jnp.clip(x, 0.0, 1.0)

    out = jnp.where(p.enabled > 0, full(x4), x4)
    return out.reshape(lead + images.shape[-3:])
