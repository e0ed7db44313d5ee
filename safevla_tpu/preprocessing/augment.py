"""Deterministic, seedable data augmentation on device.

The reference samples a torchvision transform pipeline once every
`num_steps_to_change` steps and applies it on CPU
(reference: dino_preprocessors.py:224-231, utils/transformation_util.py:12-48:
ColorJitter(0.4, 0.4, 0.2, 0.05), GaussianBlur, RandomPosterize/randomized
variants). Here augmentation is a small parameter struct sampled from a JAX
PRNG key (host chooses when to resample — every `max_steps` env steps, as the
reference does) and applied as fused elementwise math inside the same jit as
normalization + the vision encoder. That makes eval-time augmentation exactly
reproducible from the seed (the reference's eval runs WITH augmentation on —
eval.sh:18 — so parity evaluation needs this determinism).
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


def sample_augment_params(
    key: jax.Array,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.2,
    hue: float = 0.05,
) -> AugmentParams:
    """ColorJitter-style factor sampling (torchvision convention: factors
    uniform in [max(0, 1-v), 1+v], hue uniform in [-hue, hue])."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    u = lambda k, v: jax.random.uniform(k, (), minval=max(0.0, 1 - v), maxval=1 + v)
    return AugmentParams(
        brightness=u(kb, brightness),
        contrast=u(kc, contrast),
        saturation=u(ks, saturation),
        hue=jax.random.uniform(kh, (), minval=-hue, maxval=hue),
        enabled=jnp.ones((), jnp.float32),
    )


def identity_augment_params() -> AugmentParams:
    one = jnp.ones(())
    return AugmentParams(one, one, one, jnp.zeros(()), jnp.zeros(()))


def _rgb_to_grayscale(x):
    return (
        0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    )


def apply_augment(images: jax.Array, p: AugmentParams) -> jax.Array:
    """images (..., H, W, 3) float in [0, 1] -> jittered, same range."""

    def jitter(x):
        # brightness
        x = x * p.brightness
        # contrast (about the per-image gray mean)
        mean = jnp.mean(_rgb_to_grayscale(x), axis=(-3, -2, -1), keepdims=True)
        x = (x - mean) * p.contrast + mean
        # saturation (blend with grayscale)
        gray = _rgb_to_grayscale(x)
        x = (x - gray) * p.saturation + gray
        # cheap hue rotation via channel-mixing approximation of the YIQ
        # rotation (exact for small angles, which |hue| <= 0.05 guarantees)
        theta = p.hue * 2.0 * jnp.pi
        cos_h, sin_h = jnp.cos(theta), jnp.sin(theta)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        i = 0.596 * r - 0.274 * g - 0.322 * b
        q = 0.211 * r - 0.523 * g + 0.312 * b
        i, q = i * cos_h - q * sin_h, i * sin_h + q * cos_h
        r = y + 0.956 * i + 0.621 * q
        g = y - 0.272 * i - 0.647 * q
        b = y - 1.106 * i + 1.703 * q
        x = jnp.stack([r, g, b], axis=-1)
        return jnp.clip(x, 0.0, 1.0)

    return jnp.where(p.enabled > 0, jitter(images), images)
