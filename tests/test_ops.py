import jax.numpy as jnp
import numpy as np

from safevla_tpu.ops.gae import dual_gae, gae_advantages
from safevla_tpu.ops.hl_gauss import HLGauss
from safevla_tpu.ops.masks import incremental_episode_mask, packed_block_causal_mask


def numpy_gae(rewards, values, masks, gamma, lam):
    """Direct python-loop GAE (ikostrikov/allenact convention)."""
    T, B = rewards.shape
    adv = np.zeros((T, B))
    gae = np.zeros(B)
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * values[t + 1] * masks[t + 1] - values[t]
        gae = delta + gamma * lam * masks[t + 1] * gae
        adv[t] = gae
    return adv, adv + values[:-1]


def test_gae_matches_loop():
    rng = np.random.default_rng(0)
    T, B = 12, 5
    rewards = rng.normal(size=(T, B))
    values = rng.normal(size=(T + 1, B))
    masks = (rng.random((T + 1, B)) > 0.2).astype(np.float64)
    adv_np, ret_np = numpy_gae(rewards, values, masks, 0.99, 0.95)
    adv, ret = gae_advantages(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks), 0.99, 0.95
    )
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_np, rtol=1e-5)


def test_dual_gae_matches_two_single():
    rng = np.random.default_rng(1)
    T, B = 8, 3
    r0 = rng.normal(size=(T, B))
    r1 = rng.integers(0, 3, (T, B)).astype(np.float64)
    v0 = rng.normal(size=(T + 1, B))
    v1 = rng.normal(size=(T + 1, B))
    masks = (rng.random((T + 1, B)) > 0.3).astype(np.float64)
    adv, ret = dual_gae(
        jnp.asarray(np.stack([r0, r1])),
        jnp.asarray(np.stack([v0, v1])),
        jnp.asarray(masks),
        0.99,
        0.95,
    )
    a0, _ = numpy_gae(r0, v0, masks, 0.99, 0.95)
    a1, _ = numpy_gae(r1, v1, masks, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv[0]), a0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(adv[1]), a1, rtol=1e-5)


def test_hl_gauss_roundtrip():
    hl = HLGauss(-5.0, 15.0, 101, 0.15)
    targets = jnp.asarray([0.0, 1.5, -4.0, 14.0, 7.77])
    probs = hl.to_probs(targets)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    recon = hl.from_probs(probs)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(targets), atol=0.05)


def test_hl_gauss_loss_minimized_at_target():
    hl = HLGauss(-5.0, 15.0, 101, 0.15)
    target = jnp.asarray([3.0])
    good_logits = jnp.log(hl.to_probs(target) + 1e-9)
    bad_logits = jnp.log(hl.to_probs(jnp.asarray([8.0])) + 1e-9)
    assert float(hl.loss(good_logits, target)) < float(hl.loss(bad_logits, target))


def test_packed_block_causal_mask():
    traj = jnp.asarray([[0, 0, 1, 1, 1]])
    m = packed_block_causal_mask(traj)[0, 0]
    expected = np.array(
        [
            [1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0],
            [0, 0, 1, 0, 0],
            [0, 0, 1, 1, 0],
            [0, 0, 1, 1, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_incremental_episode_mask():
    # sampler 0 is 2 steps into its episode at cache position 4:
    # can attend slots 2..4. sampler 1 just reset (step 0): slot 4 only.
    m = incremental_episode_mask(jnp.asarray([2, 0]), jnp.asarray(4), 8)
    m = np.asarray(m)[:, 0, 0]
    np.testing.assert_array_equal(m[0], [0, 0, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(m[1], [0, 0, 0, 0, 1, 0, 0, 0])
