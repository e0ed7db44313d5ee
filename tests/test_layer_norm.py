"""Pallas LayerNorm kernel (ops/layer_norm.py): fwd numerics vs flax
LayerNorm(dtype=f32) and the custom VJP vs autodiff of the flax form —
interpret mode on CPU (the kernel lowers for real only on TPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safevla_tpu.ops.layer_norm import layer_norm, layer_norm_rows


def _flax_ln(x, gamma, beta, eps=1e-6):
    ln = nn.LayerNorm(epsilon=eps, dtype=jnp.float32)
    return ln.apply({"params": {"scale": gamma, "bias": beta}}, x)


@pytest.mark.parametrize("R,D", [(48, 128), (513, 256), (7, 384)])
def test_ln_fwd_matches_flax(R, D):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, D)) * 2.0 + 0.5, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) + 1.0
    beta = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    ref = _flax_ln(x, gamma, beta)
    got = layer_norm_rows(x, gamma, beta, 1e-6, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6)


def test_ln_fwd_bf16_io():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(96, 512)), jnp.bfloat16)
    gamma = jnp.ones((512,), jnp.float32)
    beta = jnp.zeros((512,), jnp.float32)
    ref = _flax_ln(x, gamma, beta).astype(jnp.bfloat16)
    got = layer_norm_rows(x, gamma, beta, 1e-6, jnp.bfloat16, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_ln_vjp_matches_autodiff():
    rng = np.random.default_rng(2)
    R, D = 40, 128
    x = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) + 1.0
    beta = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)

    def loss_kernel(x, g, b):
        return jnp.vdot(layer_norm_rows(x, g, b, 1e-6, None, True), ct)

    def loss_flax(x, g, b):
        return jnp.vdot(_flax_ln(x, g, b), ct)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, gamma, beta)
    gf = jax.grad(loss_flax, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_, name in zip(gk, gf, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5, err_msg=name
        )


def test_ln_any_rank_wrapper():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 5, 7, 128)), jnp.float32)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    ref = _flax_ln(x, gamma, beta)
    got = layer_norm(x, gamma, beta, interpret=True)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6)


def test_compat_module_param_structure_matches_flax():
    """CompatLayerNorm must expose the same param tree as nn.LayerNorm so
    checkpoints and torch importers (models/convert.py) are unaffected."""
    from safevla_tpu.models.norms import CompatLayerNorm

    x = jnp.ones((4, 128), jnp.float32)
    p_new = CompatLayerNorm(name="norm1").init(jax.random.PRNGKey(0), x)
    p_old = nn.LayerNorm(dtype=jnp.float32, name="norm1").init(
        jax.random.PRNGKey(0), x
    )
    assert jax.tree_util.tree_structure(p_new) == jax.tree_util.tree_structure(p_old)
    y_new = CompatLayerNorm(name="norm1").apply(p_new, x)
    y_old = nn.LayerNorm(dtype=jnp.float32, name="norm1").apply(p_old, x)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old), atol=1e-6)


def test_ln_vjp_under_vmap():
    """The learner vmaps the towers axis over the fusion encoder — the
    pallas_call must stay lowering-legal when batched (regression: the
    (1, D) partial-sum blocks were illegal under vmap)."""
    rng = np.random.default_rng(4)
    TW, R, D = 3, 52, 512
    x = jnp.asarray(rng.normal(size=(TW, R, D)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(TW, D)).astype(np.float32)) + 1.0
    beta = jnp.asarray(rng.normal(size=(TW, D)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(TW, R, D)), jnp.float32)

    def loss_kernel(x, g, b):
        y = jax.vmap(lambda xi, gi, bi: layer_norm_rows(xi, gi, bi, 1e-6, None, True))(
            x, g, b
        )
        return jnp.vdot(y, ct)

    def loss_flax(x, g, b):
        y = jax.vmap(_flax_ln)(x, g, b)
        return jnp.vdot(y, ct)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, gamma, beta)
    gf = jax.grad(loss_flax, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_, name in zip(gk, gf, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5, err_msg=name
        )
