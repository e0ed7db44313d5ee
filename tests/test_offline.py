"""Offline IL: synthetic CHORES store on disk -> dataset -> jitted BC fit."""

import json
import os

import numpy as np
import pytest

from safevla_tpu.config import Config
from safevla_tpu.constants import ALL_STRETCH_ACTIONS
from safevla_tpu.utils.string_codec import convert_string_to_byte


@pytest.fixture(scope="module")
def chores_dir(tmp_path_factory):
    """Write a miniature CHORES-format dataset: 2 houses x 2 episodes."""
    import h5py

    root = tmp_path_factory.mktemp("chores")
    h, w = 28, 42
    house_map = {}
    rng = np.random.default_rng(0)
    for house in ("000001", "000002"):
        house_dir = root / "train" / house
        os.makedirs(house_dir)
        sub_ids = []
        with h5py.File(house_dir / "hdf5_sensors.hdf5", "w") as f:
            for ep in range(2):
                sub_id = str(ep)
                sub_ids.append(sub_id)
                n = int(rng.integers(6, 12))
                grp = f.create_group(sub_id)
                actions = [""] + [
                    ALL_STRETCH_ACTIONS[int(rng.integers(len(ALL_STRETCH_ACTIONS)))]
                    for _ in range(n - 1)
                ]
                enc = [convert_string_to_byte(a, 20) for a in actions]
                grp.create_dataset("last_action_str", data=np.stack(enc))
                spec = {
                    "task_type": "ObjectNavType",
                    "synsets": ["mug.n.01"],
                    "synset_to_object_ids": {"mug.n.01": ["Mug|1"]},
                    "broad_synset_to_object_ids": {"mug.n.01": ["Mug|1"]},
                    "extras": {},
                }
                s = json.dumps(spec)
                grp.create_dataset(
                    "templated_task_spec",
                    data=convert_string_to_byte(s, 2 * len(s)).reshape(1, -1),
                )
                grp.create_dataset(
                    "last_agent_location",
                    data=np.zeros((1, 6), np.float64),
                )
                grp.create_dataset(
                    "an_object_is_in_hand", data=np.zeros((n, 1), np.int64)
                )
                # frames as .npy stand-ins for the mp4s
                frames = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)
                np.save(house_dir / f"raw_navigation_camera__{sub_id}.npy", frames)
                np.save(house_dir / f"raw_manipulation_camera__{sub_id}.npy", frames)
        house_map[house] = sub_ids
    with open(root / "house_id_to_sub_house_id_train.json", "w") as f:
        json.dump(house_map, f)
    return str(root)


def test_chores_dataset_reads_windows(chores_dir):
    from safevla_tpu.data.chores import ChoresDataset

    ds = ChoresDataset(chores_dir, "train", sliding_window=5)
    assert len(ds) == 4
    item = ds[0]
    assert item["raw_navigation_camera"].shape[0] == len(item["actions"]) <= 5
    assert item["actions"].dtype == np.int32
    # start token present for the first step of an episode window at t=0
    if item["time_ids"][0] == 0:
        assert item["last_actions"][0] == ds.start_token
    assert "mug" in item["natural_language_spec"]


def test_chores_collate(chores_dir):
    from safevla_tpu.data.chores import ChoresDataset, collate_window_batch

    ds = ChoresDataset(chores_dir, "train", sliding_window=8)
    batch = collate_window_batch([ds[0], ds[1]], window=8, pad_token=ds.pad_token)
    assert batch["rgb_nav"].shape == (2, 8, 28, 42, 3)
    assert batch["actions"].shape == (2, 8)
    # padding labeled -1
    for b in range(2):
        t = (~batch["padding_mask"][b]).sum()
        assert (batch["actions"][b, t:] == -1).all()


def test_bc_fit_improves_loss(chores_dir, tiny_model_cfg, tmp_path):
    from safevla_tpu.data.chores import ChoresDataset, collate_window_batch
    from safevla_tpu.training.offline import OfflineTrainer

    import dataclasses

    cfg = Config()
    cfg.model = dataclasses.replace(tiny_model_cfg, num_towers=1)  # IL: actor tower only
    cfg.offline.lr = 1e-3
    cfg.train.use_data_augmentation = False

    from safevla_tpu.models.actor_critic import SafeVLAPolicy

    trainer = OfflineTrainer(cfg)
    ds = ChoresDataset(chores_dir, "train", sliding_window=6)

    def batches():
        yield collate_window_batch([ds[i] for i in range(2)], 6, ds.pad_token)
        yield collate_window_batch([ds[i] for i in range(2, 4)], 6, ds.pad_token)

    logs = []
    state = trainer.fit(
        batches,
        val_batches=batches,
        num_epochs=3,
        log_fn=lambda m, s: logs.append(m),
        output_dir=str(tmp_path / "ckpt"),
    )
    assert int(state.epoch) == 3
    assert logs[-1]["bc_loss"] < logs[0]["bc_loss"]  # memorizes the tiny set
    assert "f1/macro" in logs[-1]
    assert (tmp_path / "ckpt").exists()

    # resume: fit with no explicit state picks up the saved checkpoint
    trainer2 = OfflineTrainer(cfg)
    state2 = trainer2.fit(
        batches, num_epochs=3, log_fn=lambda m, s: None, output_dir=str(tmp_path / "ckpt")
    )
    assert int(state2.epoch) == 3  # already at target epoch -> no extra work

    # restart_optimizer: weights come from the ckpt, AdamW state is fresh
    restored = trainer2.restore_state(str(tmp_path / "ckpt"), restart_optimizer=True)
    import jax
    import numpy as np

    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.tower_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.tower_params)[0]),
    )
    counts = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(restored.opt_state)
        if np.asarray(x).ndim == 0
    ]
    assert any(c == 0 for c in counts)  # fresh optimizer step counter


def test_il_to_rl_weight_transfer(chores_dir, tiny_model_cfg):
    """BC tower params drop into the RL 3-tower state without remapping."""
    import jax
    import jax.numpy as jnp

    from safevla_tpu.algo.learner import Learner
    from safevla_tpu.models.actor_critic import SafeVLAPolicy

    import dataclasses

    cfg1 = Config()
    cfg1.model = dataclasses.replace(tiny_model_cfg, num_towers=1)
    bc_policy = SafeVLAPolicy(cfg1.model)
    bc_params = bc_policy.init_params(jax.random.PRNGKey(1))

    cfg3 = Config()
    cfg3.model = dataclasses.replace(tiny_model_cfg, num_towers=3)
    learner = Learner(SafeVLAPolicy(cfg3.model), cfg3)
    ts = learner.init(jax.random.PRNGKey(0))

    # broadcast the single IL tower into all three RL towers
    il_tower = jax.tree.map(lambda x: x[0], bc_params["towers"])
    ts2 = ts._replace(
        tower_params=jax.tree.map(
            lambda x: jnp.stack([x, x, x]), il_tower
        )
    )
    a = jax.tree.leaves(ts2.tower_params)[0]
    b = jax.tree.leaves(ts.tower_params)[0]
    assert a.shape == b.shape
