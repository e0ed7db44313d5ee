"""Pallas encoder attention kernel: forward numerics + custom VJP (interpret
mode; on TPU the same code path compiles natively)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safevla_tpu.ops.flash_attention import (
    _attention_diff,
    _xla_attention,
    flash_attention,
)


SHAPES = [
    (3, 201, 8, 64),  # fusion transformer tokens
    (1, 433, 6, 64),  # DINOv2-S patch tokens (+cls)
    (2, 128, 4, 64),  # aligned
    (2, 30, 2, 64),  # tiny, odd seq; smallest lane-compatible head layout
    (5, 64, 4, 96),  # batch not divisible by the kernel row group
]


def _qkv(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [jax.random.normal(k, shape, jnp.float32) for k in ks]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(shape):
    q, k, v = _qkv(shape)
    ref = _xla_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_custom_vjp_matches_xla_grads():
    q, k, v = _qkv((2, 68, 4, 32), seed=1)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(_attention_diff(q, k, v, None, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_bf16_io():
    q, k, v = [x.astype(jnp.bfloat16) for x in _qkv((2, 201, 4, 64), seed=2)]
    got = flash_attention(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_packed_qkv_matches_separate():
    """attention_qkv on the [q|k|v] lane layout == flash_attention on splits."""
    from safevla_tpu.ops.flash_attention import flash_attention_qkv

    b, s, h, d = 3, 50, 4, 64
    q, k, v = _qkv((b, s, h, d), seed=7)
    qkv = jnp.concatenate([x.reshape(b, s, h * d) for x in (q, k, v)], axis=-1)
    ref = flash_attention(q, k, v, interpret=True)
    got = flash_attention_qkv(qkv, h, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref).reshape(b, s, h * d), atol=1e-6
    )


def test_key_lens_forward_matches_masked_xla():
    """Prefix key masking (right-padded text) in the kernel == XLA key_mask."""
    b, s = 4, 201
    q, k, v = _qkv((b, s, 8, 64), seed=3)
    key_lens = jnp.asarray([201, 170, 185, 1], jnp.int32)
    key_mask = jnp.arange(s)[None, :] < key_lens[:, None]
    ref = _xla_attention(q, k, v, key_mask=key_mask)
    got = flash_attention(q, k, v, interpret=True, key_lens=key_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_vmapped_tower_path_matches_xla():
    """The kernel under jax.vmap (the 3-tower fusion layout) == XLA, fwd and
    grads — interpret mode stands in for the TPU compile."""
    from safevla_tpu.ops.flash_attention import _attention_diff_qkv

    towers, b, s, h, dh = 3, 4, 50, 4, 32
    qkv = jax.random.normal(jax.random.PRNGKey(9), (towers, b, s, 3 * h * dh))
    key_lens = jnp.asarray([50, 31, 7, 50], jnp.int32)
    key_mask = jnp.arange(s)[None, :] < key_lens[:, None]

    def pal_one(qkv_t):
        return _attention_diff_qkv(qkv_t, key_lens, h, True)

    def xla_one(qkv_t):
        q, k, v = jnp.split(qkv_t, 3, axis=-1)
        fold = lambda x: x.reshape(b, s, h, dh)
        out = _xla_attention(fold(q), fold(k), fold(v), key_mask=key_mask)
        return out.reshape(b, s, h * dh)

    got = jax.vmap(pal_one)(qkv)
    ref = jax.vmap(xla_one)(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    g_pal = jax.grad(lambda x: jnp.sum(jax.vmap(pal_one)(x) ** 2))(qkv)
    g_ref = jax.grad(lambda x: jnp.sum(jax.vmap(xla_one)(x) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-3)


def test_key_lens_vjp_matches_masked_xla_grads():
    b, s = 3, 68
    q, k, v = _qkv((b, s, 4, 32), seed=4)
    key_lens = jnp.asarray([68, 40, 9], jnp.int32)
    key_mask = jnp.arange(s)[None, :] < key_lens[:, None]

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, key_mask=key_mask) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(_attention_diff(q, k, v, key_lens, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
