"""On-device image normalization.

Replaces the reference's `DataAugmentationPreprocessor.process` arithmetic
(reference: architecture/allenact_preprocessors/dino_preprocessors.py:224-239):
uint8 -> float, /255, mean/std normalize. Runs inside the same jit as the
vision encoder so XLA fuses it with the first conv — the uint8 frames are what
crosses the host->device boundary (3.4x less PCIe/ICI traffic than f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from safevla_tpu.constants import DINO_RGB_MEANS, DINO_RGB_STDS


def normalize_images(
    images_u8: jax.Array,
    mean=DINO_RGB_MEANS,
    std=DINO_RGB_STDS,
    dtype=jnp.float32,
) -> jax.Array:
    """(..., H, W, 3) uint8 -> normalized float."""
    mean = jnp.asarray(mean, dtype)
    std = jnp.asarray(std, dtype)
    x = images_u8.astype(dtype) / 255.0
    return (x - mean) / std
