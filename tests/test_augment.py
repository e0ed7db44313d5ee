"""Device-side augmentation pipeline vs torchvision oracles."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F


@pytest.fixture(scope="module", autouse=True)
def _exact_augment_math():
    """Oracle parity needs f32 augment math — but scoped to THIS module.
    A module-level `os.environ[...] = "1"` leaked the flag to every test
    collected after this file, flipping their augment programs bf16 -> f32;
    the float-path change deterministically re-routed the probe-task
    trajectory and failed tests/test_learning.py's sync run ONLY inside the
    full suite (passed in isolation). The dtype is read at jit-trace time
    and this module's small oracle shapes don't collide with the rollout's,
    so fixture scoping restores order-independence."""
    old = os.environ.get("SAFEVLA_AUGMENT_F32")
    os.environ["SAFEVLA_AUGMENT_F32"] = "1"
    yield
    if old is None:
        os.environ.pop("SAFEVLA_AUGMENT_F32", None)
    else:
        os.environ["SAFEVLA_AUGMENT_F32"] = old

from safevla_tpu.preprocessing.augment import (
    AugmentParams,
    apply_augment,
    identity_augment_params,
    sample_augment_params,
)


def _img(h=32, w=48, n=2, seed=0):
    return np.random.default_rng(seed).uniform(size=(n, h, w, 3)).astype(np.float32)


def _neutral(**kw):
    base = identity_augment_params()._asdict()
    base.update(enabled=jnp.ones(()), blur_sigma=jnp.full((), 1e-4))
    base.update({k: jnp.asarray(v, jnp.float32) for k, v in kw.items()})
    return AugmentParams(**base)


def test_identity_params_passthrough():
    x = _img()
    out = np.asarray(apply_augment(jnp.asarray(x), identity_augment_params()))
    np.testing.assert_array_equal(out, x)


def test_neutral_enabled_is_nearly_identity():
    x = _img()
    out = np.asarray(apply_augment(jnp.asarray(x), _neutral()))
    np.testing.assert_allclose(out, np.clip(x, 0, 1), atol=2e-3)


def _gauss1d(size, sigma):
    i = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    w = np.exp(-(i**2) / (2 * sigma**2))
    return torch.from_numpy((w / w.sum()).astype(np.float32))


def test_blur_matches_torch_oracle():
    """Independent separable-conv oracle in torch: height-9, width-5 kernels
    (torchvision GaussianBlur kernel_size=(5, 9) semantics)."""
    x = _img(n=1)
    sigma = 1.5
    out = np.asarray(apply_augment(jnp.asarray(x), _neutral(blur_sigma=sigma)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    kv = _gauss1d(9, sigma).reshape(1, 1, 9, 1).repeat(3, 1, 1, 1)
    kh = _gauss1d(5, sigma).reshape(1, 1, 1, 5).repeat(3, 1, 1, 1)
    ref = F.conv2d(t, kv, padding=(4, 0), groups=3)
    ref = F.conv2d(ref, kh, padding=(0, 2), groups=3)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_posterize_matches_uint8_bitmask():
    """Oracle = torchvision posterize semantics: keep the top `bits` bits of
    the uint8 value (v & ~(2^(8-bits) - 1))."""
    x = (np.arange(256, dtype=np.float32) / 255.0).reshape(1, 16, 16, 1)
    x = np.tile(x, (1, 1, 1, 3))
    for bits in (4, 5, 6, 7):
        out = np.asarray(apply_augment(jnp.asarray(x), _neutral(posterize_bits=float(bits))))
        v = (x * 255).astype(np.uint8)
        ref = (v & np.uint8((0xFF << (8 - bits)) & 0xFF)).astype(np.float32) / 255.0
        np.testing.assert_allclose(out, ref, atol=1.5 / 255)


def test_sharpness_matches_torch_oracle_interior():
    """Oracle = torchvision adjust_sharpness math: blend(smooth3x3, x, f)
    with the documented [[1,1,1],[1,5,1],[1,1,1]]/13 kernel."""
    x = _img(n=1)
    out = np.asarray(apply_augment(jnp.asarray(x), _neutral(sharpness=2.0)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    k = torch.tensor([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    smooth = F.conv2d(t, k.reshape(1, 1, 3, 3).repeat(3, 1, 1, 1), padding=1, groups=3)
    ref = (smooth + 2.0 * (t - smooth)).clamp(0, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2], atol=5e-3)


def test_crop_zoom_one_is_identity():
    x = _img(n=1)
    out = np.asarray(apply_augment(jnp.asarray(x), _neutral()))
    base = np.asarray(apply_augment(jnp.asarray(x), _neutral(crop_zoom=1.0)))
    np.testing.assert_allclose(out, base, atol=1e-6)


def test_crop_zoom_magnifies():
    # a centered bright square grows under zoom with centered crop
    x = np.zeros((1, 40, 40, 3), np.float32)
    x[:, 15:25, 15:25] = 1.0
    p = _neutral(crop_zoom=1.25, crop_cx=0.5, crop_cy=0.5)
    out = np.asarray(apply_augment(jnp.asarray(x), p))
    assert out.sum() > x.sum() * 1.3  # ~1.25^2 more bright area


def test_sampling_versions_and_determinism():
    k = jax.random.PRNGKey(3)
    p1 = sample_augment_params(k, version="v2")
    p2 = sample_augment_params(k, version="v2")
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(p1.grayscale) == 0.0  # v2 has no grayscale
    pv1 = sample_augment_params(k, version="v1")
    assert float(pv1.posterize_bits) in (7.0, 8.0)
    x = _img()
    for p in (p1, pv1):
        out = np.asarray(apply_augment(jnp.asarray(x), p))
        assert out.shape == x.shape
        assert out.min() >= 0.0 and out.max() <= 1.0


def test_leading_dims_preserved():
    x = _img().reshape(1, 2, 32, 48, 3)  # (B, T, H, W, 3)
    p = sample_augment_params(jax.random.PRNGKey(0))
    out = np.asarray(apply_augment(jnp.asarray(x), p))
    assert out.shape == x.shape
