import jax.numpy as jnp
import numpy as np

from safevla_tpu.algo.lagrange import init_lagrange, multiplier_value, update_lagrange
from safevla_tpu.algo.losses import (
    categorical_entropy,
    categorical_log_prob,
    imitation_bce_loss,
    ppo_surrogate_loss,
    safe_ppo_surrogate_loss,
    value_loss,
)


def _np_surrogate(logits, actions, old_lp, adv, clip):
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    alp = np.take_along_axis(logp, actions[..., None], -1)[..., 0]
    ratio = np.exp(alp - old_lp)
    clamped = np.clip(ratio, 1 - clip, 1 + clip)
    return -np.minimum(ratio * adv, clamped * adv)


def test_ppo_surrogate_matches_numpy():
    rng = np.random.default_rng(0)
    B, T, A = 3, 5, 20
    logits = rng.normal(size=(B, T, A))
    actions = rng.integers(0, A, (B, T))
    old_lp = rng.normal(size=(B, T)) - 3
    adv = rng.normal(size=(B, T))
    returns = rng.normal(size=(B, T))
    values = rng.normal(size=(B, T))

    total, m = ppo_surrogate_loss(
        jnp.asarray(logits), jnp.asarray(values), jnp.asarray(actions),
        jnp.asarray(old_lp), jnp.asarray(adv), jnp.asarray(returns),
        jnp.asarray(values), clip_param=0.1, value_loss_coef=0.5, entropy_coef=0.0,
    )
    exp_action = _np_surrogate(logits, actions, old_lp, adv, 0.1).mean()
    exp_value = 0.5 * ((returns - values) ** 2).mean()
    np.testing.assert_allclose(float(m["action"]), exp_action, rtol=1e-5)
    np.testing.assert_allclose(float(m["value"]), 0.5 * exp_value * 2, rtol=1e-5)
    np.testing.assert_allclose(float(total), exp_action + 0.5 * exp_value * 2 * 0.5, rtol=1e-5)


def test_safe_surrogate_penalty_direction():
    """Higher lambda should shift the surrogate toward penalizing costly actions."""
    rng = np.random.default_rng(1)
    B, T, A = 2, 4, 5
    logits = jnp.asarray(rng.normal(size=(B, T, A)))
    actions = jnp.asarray(rng.integers(0, A, (B, T)))
    old_lp = categorical_log_prob(logits, actions)
    adv = jnp.ones((B, T))
    c_adv = jnp.ones((B, T)) * 2.0
    rets = jnp.zeros((B, T))
    vals = jnp.zeros((B, T))

    def action_loss(lam):
        _, m = safe_ppo_surrogate_loss(
            logits, vals, actions, old_lp, adv, c_adv, rets, vals,
            jnp.asarray(lam), clip_param=0.1,
        )
        return float(m["action"])

    # at ratio == 1: loss = -(A - lam*Ac)/(1+lam); A=1, Ac=2
    np.testing.assert_allclose(action_loss(0.0), -1.0, atol=1e-6)
    np.testing.assert_allclose(action_loss(1.0), 0.5, atol=1e-6)


def test_value_loss_clipped():
    values = jnp.asarray([1.0])
    old = jnp.asarray([0.0])
    returns = jnp.asarray([2.0])
    plain = value_loss(values, returns, old, 0.1, use_clipped=False)
    clipped = value_loss(values, returns, old, 0.1, use_clipped=True)
    np.testing.assert_allclose(float(plain), 0.5 * 1.0)
    # clipped pred = 0 + clip(1, ±0.1) = 0.1 -> (0.1-2)^2 = 3.61 > 1 -> max
    np.testing.assert_allclose(float(clipped), 0.5 * 3.61, rtol=1e-5)


def test_imitation_bce_matches_numpy():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 3, 20))
    target = rng.random((2, 3))
    got = float(imitation_bce_loss(jnp.asarray(logits), jnp.asarray(target), 8))
    x = logits[..., 8]
    p = 1 / (1 + np.exp(-x))
    expect = -(target * np.log(p) + (1 - target) * np.log(1 - p)).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_lagrange_ascends_when_over_limit():
    st = init_lagrange(cost_limit=2.0, multiplier_init=0.0, lr=0.05)
    for _ in range(10):
        st = update_lagrange(st, jnp.asarray(5.0), lr=0.05)
    assert float(multiplier_value(st)) > 0.1


def test_lagrange_projected_at_zero():
    st = init_lagrange(cost_limit=10.0, multiplier_init=0.5, lr=0.05)
    for _ in range(100):
        st = update_lagrange(st, jnp.asarray(0.0), lr=0.05)
    assert float(multiplier_value(st)) == 0.0


def test_entropy_uniform():
    logits = jnp.zeros((1, 4))
    np.testing.assert_allclose(float(categorical_entropy(logits)[0]), np.log(4), rtol=1e-6)
