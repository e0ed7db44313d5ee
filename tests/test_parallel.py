"""Mesh sharding: the learner update over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safevla_tpu.config import Config
from safevla_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_learner_update_sharded_over_dp(tiny_model_cfg):
    from safevla_tpu.algo.learner import Learner
    from safevla_tpu.models.actor_critic import SafeVLAPolicy
    from tests.test_learner import _batch

    mesh = make_mesh(dp=8, mdl=1)
    cfg = Config()
    cfg.model = tiny_model_cfg
    cfg.ppo.update_repeats = 1
    policy = SafeVLAPolicy(cfg.model)
    learner = Learner(policy, cfg, mesh=mesh)
    ts = learner.init(jax.random.PRNGKey(0))

    batch = _batch(cfg.model, B=16, T=6)
    batch = shard_batch(mesh, batch)
    # batch really is split across devices
    assert len(batch["dino_nav"].sharding.device_set) == 8

    ts2, metrics = learner.update(ts, batch, 3.0, 1)
    assert np.isfinite(float(metrics["total"]))
    # params stay replicated
    leaf = jax.tree.leaves(ts2.tower_params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)

    # sharded result equals the single-device result (state is
    # mesh-replicated after init — localize it for the single-device run)
    learner_single = Learner(SafeVLAPolicy(cfg.model), cfg)
    to_dev0 = lambda x: jax.device_put(np.asarray(x), jax.devices()[0])
    host_batch = jax.tree.map(to_dev0, batch)
    ts_local = jax.tree.map(to_dev0, ts)
    ts3, metrics_single = learner_single.update(ts_local, host_batch, 3.0, 1)
    np.testing.assert_allclose(
        float(metrics["total"]), float(metrics_single["total"]), rtol=2e-4
    )
    a = np.asarray(jax.tree.leaves(ts2.tower_params)[0])
    b = np.asarray(jax.tree.leaves(ts3.tower_params)[0])
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_chunked_update_sharded_over_dp(tiny_model_cfg):
    """The async pipeline's chunk-decomposed update on a dp mesh matches the
    sharded monolithic update (VERDICT r4 item 2b: chunks slice T, never the
    batch axis, so every chunk program shards like the monolithic one)."""
    import dataclasses

    from safevla_tpu.algo.learner import Learner
    from safevla_tpu.models.actor_critic import SafeVLAPolicy
    from tests.test_learner import _batch

    mesh = make_mesh(dp=8, mdl=1)
    cfg = Config()
    # 2 fwd chunks / 4 bwd chunks over the (B=16, T=8) window
    cfg.model = dataclasses.replace(tiny_model_cfg, fusion_chunk=64)
    cfg.ppo.update_repeats = 2
    policy = SafeVLAPolicy(cfg.model)
    learner = Learner(policy, cfg, mesh=mesh)
    ts = learner.init(jax.random.PRNGKey(0))

    batch = shard_batch(mesh, _batch(cfg.model, B=16, T=8))
    ts_mono, m_mono = learner.update(ts, batch, 1.5, 1)
    ts_chunk, m_chunk = learner.chunked_update(ts, batch, 1.5, 1)

    # chunk programs really ran dp-sharded
    leaf = jax.tree.leaves(ts_chunk.tower_params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)
    for a, b in zip(
        jax.tree.leaves(ts_mono.tower_params), jax.tree.leaves(ts_chunk.tower_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)
    for k in ("total", "action", "value", "c_value", "grad_norm"):
        np.testing.assert_allclose(
            float(m_mono[k]), float(m_chunk[k]), atol=1e-4, rtol=2e-3
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_helpers():
    mesh = make_mesh(dp=4, mdl=2)
    assert mesh.shape == {"dp": 4, "mdl": 2}
    sh = batch_sharding(mesh)
    x = jax.device_put(np.zeros((8, 3)), sh)
    assert len(x.sharding.device_set) >= 4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_offline_trainer_sharded(tiny_model_cfg):
    import dataclasses

    from safevla_tpu.parallel.mesh import shard_batch
    from safevla_tpu.training.offline import OfflineTrainer

    mesh = make_mesh(dp=8, mdl=1)
    cfg = Config()
    cfg.model = dataclasses.replace(tiny_model_cfg, num_towers=1)
    cfg.train.use_data_augmentation = False
    trainer = OfflineTrainer(cfg, mesh=mesh)
    state = trainer.init_state()
    trainer._frozen_cache = state.frozen_params

    B, T = 8, 4
    rng = np.random.default_rng(0)
    host_batch = {
        "rgb_nav": rng.integers(0, 255, (B, T, 28, 42, 3), dtype=np.uint8),
        "rgb_manip": rng.integers(0, 255, (B, T, 28, 42, 3), dtype=np.uint8),
        "last_actions": np.full((B, T), 20, np.int32),
        "actions": np.zeros((B, T), np.int32),
        "time_ids": np.tile(np.arange(T, dtype=np.int32), (B, 1)),
        "an_object_is_in_hand": np.zeros((B, T), np.int32),
        "padding_mask": np.zeros((B, T), bool),
        "instructions": ["go forward"] * B,
    }
    batch = trainer.prepare_batch(host_batch, state.frozen_params)
    batch = shard_batch(mesh, batch)
    from safevla_tpu.preprocessing.augment import identity_augment_params

    state2, metrics = trainer._jit_step(state, batch, identity_augment_params())
    assert np.isfinite(float(metrics["bc_loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_online_trainer_end_to_end_on_mesh(tiny_model_cfg, tmp_path):
    """Multi-chip rollout + update through OnlineTrainer (VERDICT r2 item 3):
    the act path shards streams over dp (reference: one rollout worker per
    GPU, base.py:236-282), collect feeds the dp-sharded learner update, and
    the whole loop runs collect->update end-to-end on the 8-device mesh."""
    from safevla_tpu.training.online import OnlineTrainer
    from tests.test_rollout_training import make_sampler_factory

    mesh = make_mesh(dp=8, mdl=1)
    cfg = Config()
    cfg.model = tiny_model_cfg
    cfg.ppo.num_steps = 6
    cfg.ppo.update_repeats = 1
    cfg.train.num_train_processes = 8
    cfg.train.max_steps = cfg.model.max_steps
    cfg.train.output_dir = str(tmp_path)
    cfg.train.save_interval = 10_000_000
    logs = []
    trainer = OnlineTrainer(
        cfg,
        make_sampler_factory(max_steps=5),
        mesh=mesh,
        num_workers=0,
        log_fn=lambda m, s: logs.append((s, m)),
    )
    # group width must tile dp: 8 streams / default 2 groups = 4 < 8 devices,
    # so the runner must have widened to a single 8-stream group
    assert trainer.runner.n_groups == 1 and trainer.runner.G == 8

    window = cfg.ppo.num_steps * cfg.train.num_train_processes
    ts = trainer.train(total_steps=2 * window)
    assert int(ts.step) >= 2 * window
    assert len(logs) >= 2 and np.isfinite(logs[-1][1]["total"])
    # act-path outputs really were computed on the mesh
    leaf = trainer.runner.states[0].time_step
    assert len(leaf.sharding.device_set) == 8
    trainer.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_learner_update_on_2d_mesh(tiny_model_cfg):
    """The reserved mdl axis composes with dp: a (dp=4, mdl=2) mesh runs the
    learner update (params replicated over mdl) and matches single-device."""
    from safevla_tpu.algo.learner import Learner
    from safevla_tpu.models.actor_critic import SafeVLAPolicy
    from tests.test_learner import _batch

    mesh = make_mesh(dp=4, mdl=2)
    cfg = Config()
    cfg.model = tiny_model_cfg
    cfg.ppo.update_repeats = 1
    policy = SafeVLAPolicy(cfg.model)
    learner = Learner(policy, cfg, mesh=mesh)
    ts = learner.init(jax.random.PRNGKey(0))

    batch = _batch(cfg.model, B=16, T=6)
    batch = shard_batch(mesh, batch)
    ts2, metrics = learner.update(ts, batch, 3.0, 1)
    assert np.isfinite(float(metrics["total"]))

    learner_single = Learner(SafeVLAPolicy(cfg.model), cfg)
    to_dev0 = lambda x: jax.device_put(np.asarray(x), jax.devices()[0])
    host_batch = jax.tree.map(to_dev0, batch)
    ts3, _ = learner_single.update(jax.tree.map(to_dev0, ts), host_batch, 3.0, 1)
    a = np.asarray(jax.tree.leaves(ts2.tower_params)[0])
    b = np.asarray(jax.tree.leaves(ts3.tower_params)[0])
    np.testing.assert_allclose(a, b, atol=2e-5)
