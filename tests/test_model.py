import jax
import jax.numpy as jnp
import numpy as np
import pytest


L = 8  # text length


def _inputs(cfg, B, T, seed=1):
    gh, gw = cfg.vision_grid
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    return {
        "dino": jax.random.normal(k1, (B, T, gh, gw, cfg.vision_feature_dim)),
        "text_tokens": jnp.ones((B, L), jnp.int32),
        "text_mask": jnp.ones((B, L), bool),
        "prev": jnp.zeros((B, T), jnp.int32),
    }


def test_forward_shapes(tiny_policy, tiny_params, tiny_model_cfg):
    cfg = tiny_model_cfg
    B, T = 2, 4
    x = _inputs(cfg, B, T)
    th = tiny_policy.encode_text(tiny_params, x["text_tokens"], x["text_mask"])
    out = tiny_policy.forward_seq(
        tiny_params, x["dino"], x["dino"], th, x["text_mask"],
        x["prev"], jnp.ones((B, T), jnp.int32), jnp.zeros((B, T), jnp.int32),
        jnp.tile(jnp.arange(T), (B, 1)), jnp.zeros((B, T), jnp.int32),
    )
    assert out.logits.shape == (B, T, cfg.num_actions)
    assert out.values.shape == (B, T)
    assert out.c_values.shape == (B, T)
    # separate towers -> reward and cost critics are different functions
    assert float(jnp.max(jnp.abs(out.values - out.c_values))) > 1e-4


def test_incremental_matches_full(tiny_policy, tiny_params, tiny_model_cfg):
    cfg = tiny_model_cfg
    B, T = 2, 6
    x = _inputs(cfg, B, T)
    th = tiny_policy.encode_text(tiny_params, x["text_tokens"], x["text_mask"])
    # two packed episodes: reset at t=0 and t=3
    not_reset = jnp.asarray([[0, 1, 1, 0, 1, 1]] * B, jnp.int32)
    traj = jnp.asarray([[0, 0, 0, 1, 1, 1]] * B, jnp.int32)
    tstep = jnp.asarray([[0, 1, 2, 0, 1, 2]] * B, jnp.int32)
    out = tiny_policy.forward_seq(
        tiny_params, x["dino"], x["dino"], th, x["text_mask"],
        x["prev"], not_reset, jnp.zeros((B, T), jnp.int32), tstep, traj,
    )
    state = tiny_policy.init_state(B, L)
    state = tiny_policy.update_text(state, jnp.arange(B), th, x["text_mask"])
    logits, values = [], []
    for t in range(T):
        lg, v, cv, state = tiny_policy.act_step(
            tiny_params, state, x["dino"][:, t], x["dino"][:, t],
            x["prev"][:, t], not_reset[:, t], jnp.zeros((B,), jnp.int32),
        )
        logits.append(lg)
        values.append(v)
    logits = jnp.stack(logits, 1)
    values = jnp.stack(values, 1)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out.logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(values), np.asarray(out.values), atol=1e-4)


def test_cache_position_wraps(tiny_policy, tiny_params, tiny_model_cfg):
    cfg = tiny_model_cfg
    B = 2
    x = _inputs(cfg, B, 1)
    th = tiny_policy.encode_text(tiny_params, x["text_tokens"], x["text_mask"])
    state = tiny_policy.init_state(B, L)
    state = tiny_policy.update_text(state, jnp.arange(B), th, x["text_mask"])
    for t in range(cfg.max_steps + 2):
        nr = jnp.full((B,), 0 if t == 0 else 1, jnp.int32)
        _, _, _, state = tiny_policy.act_step(
            tiny_params, state, x["dino"][:, 0], x["dino"][:, 0],
            x["prev"][:, 0], nr, jnp.zeros((B,), jnp.int32),
        )
    # position wrapped instead of overflowing the cache
    assert int(state.pos) <= cfg.max_steps


def test_per_step_text(tiny_policy, tiny_params, tiny_model_cfg):
    """forward_seq accepts a per-step (B, T, L, D) text tensor."""
    cfg = tiny_model_cfg
    B, T = 2, 3
    x = _inputs(cfg, B, T)
    th = tiny_policy.encode_text(tiny_params, x["text_tokens"], x["text_mask"])
    th_step = jnp.repeat(th[:, None], T, axis=1)
    tm_step = jnp.repeat(x["text_mask"][:, None], T, axis=1)
    args = (
        x["prev"], jnp.ones((B, T), jnp.int32), jnp.zeros((B, T), jnp.int32),
        jnp.tile(jnp.arange(T), (B, 1)), jnp.zeros((B, T), jnp.int32),
    )
    out1 = tiny_policy.forward_seq(
        tiny_params, x["dino"], x["dino"], th, x["text_mask"], *args
    )
    out2 = tiny_policy.forward_seq(
        tiny_params, x["dino"], x["dino"], th_step, tm_step, *args
    )
    np.testing.assert_allclose(
        np.asarray(out1.logits), np.asarray(out2.logits), atol=1e-5
    )


def test_vit_adaptive_pool_matches_torch_semantics():
    from safevla_tpu.models.vit import adaptive_pool_matrix

    # exact bins of torch.nn.AdaptiveAvgPool1d(7) over 16 inputs
    m = adaptive_pool_matrix(16, 7)
    assert m.shape == (7, 16)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    # bin 0 of AdaptiveAvgPool(16 -> 7) covers indices [0, 3)
    assert (m[0, :3] > 0).all() and (m[0, 3:] == 0).all()


def test_sinusoidal_time_encoding_matches_reference_formula():
    import math
    from safevla_tpu.models.actor_critic import sinusoidal_time_encoding

    d = 16
    pos = jnp.asarray([[0, 1, 5]])
    pe = np.asarray(sinusoidal_time_encoding(pos, d))
    div = np.exp(np.arange(0, d, 2) * (-math.log(10000.0) / d))
    expect_sin = np.sin(5 * div)
    np.testing.assert_allclose(pe[0, 2, 0::2], expect_sin, atol=1e-5)


def test_act_dispatch_leaf_budget():
    """The rollout hot loop pays per-leaf argument marshaling on every
    dispatch (~1k/window over the axon tunnel) — the scan-stacked ViT/
    decoder/fusion layouts are a perf invariant, not an implementation
    detail. Budgets are the production-config counts at the time the
    layouts landed; growing them needs a deliberate decision."""
    import jax
    from safevla_tpu.config import Config
    from safevla_tpu.models import SafeVLAPolicy

    cfg = Config().model
    pol = SafeVLAPolicy(cfg)
    params = pol.init_params(jax.random.PRNGKey(0))
    leaves = lambda t: len(jax.tree_util.tree_leaves(t))
    assert leaves(params["vit"]) <= 20, leaves(params["vit"])
    assert leaves(params["towers"]) <= 56, leaves(params["towers"])
