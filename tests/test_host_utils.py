"""Geometry, stretch-state, instructions, data stores, tokenizer."""

import gzip
import json

import numpy as np
import pytest

from safevla_tpu.envs.geometry import (
    Polygon2D,
    get_room_id_from_location,
    get_rooms_polymap_and_type,
)
from safevla_tpu.envs.stretch_state import (
    StretchState,
    convert_agent_to_world_coordinate,
    convert_world_to_agent_coordinate,
)
from safevla_tpu.utils.instructions import (
    REGISTERED_INSTRUCTION_TYPES,
    choose_det,
    get_natural_language_spec,
    normalize,
)
from safevla_tpu.types import REGISTERED_TASK_PARAMS


def test_polygon_contains_and_distance():
    sq = Polygon2D([(0, 0), (2, 0), (2, 2), (0, 2)])
    assert sq.contains(1, 1)
    assert not sq.contains(3, 1)
    assert sq.distance(1, 1) == 0.0
    assert sq.distance(3, 1) == pytest.approx(1.0)
    assert sq.distance(3, 3) == pytest.approx(np.sqrt(2))


def test_room_polymap():
    house = {
        "rooms": [
            {
                "id": "room0",
                "roomType": "Kitchen",
                "floorPolygon": [
                    {"x": 0, "y": 0, "z": 0},
                    {"x": 4, "y": 0, "z": 0},
                    {"x": 4, "y": 0, "z": 4},
                    {"x": 0, "y": 0, "z": 4},
                ],
            }
        ]
    }
    poly_map, type_map = get_rooms_polymap_and_type(house)
    assert type_map["room0"] == "Kitchen"
    assert get_room_id_from_location(poly_map, {"x": 1, "z": 1}) == "room0"
    assert get_room_id_from_location(poly_map, {"x": 9, "z": 9}) is None


def test_coordinate_transform_roundtrip():
    agent = {"x": 2.0, "y": 0.9, "z": 3.0}
    world = {"x": 4.0, "y": 1.2, "z": 5.0}
    for yaw in (0.0, 37.0, 180.0, 275.0):
        rel = convert_world_to_agent_coordinate(world, agent, yaw)
        back = convert_agent_to_world_coordinate(rel, agent, yaw)
        for k in ("x", "y", "z"):
            assert back[k] == pytest.approx(world[k], abs=1e-9)


def test_stretch_state_difference_and_tolerance():
    a = StretchState()
    b = StretchState()
    b._base_position = {**a._base_position, "x": 0.5, "theta": 350.0}
    diff = StretchState.difference(b, a)
    assert diff.base_position["x"] == pytest.approx(0.5)
    # SIGNED wrap (reference semantics): 350 - 0 -> -10 degrees
    assert diff.base_position["theta"] == pytest.approx(-10.0)

    tol = StretchState._create_difference_state(
        diff_base={"x": 0.01, "z": 0.01, "theta": 1.5},
        diff_wrist={"y": 0.005, "z": 0.005, "yaw": 2},
        diff_hand={"x": 100, "y": 100, "z": 100},
        diff_gripper=100,
        diff_held_oids=set(),
    )
    too_small, _ = StretchState.state_change_within_tolerance(diff, tol)
    assert not too_small  # 0.5m base motion is a real move
    zero_diff = StretchState.difference(a, a)
    too_small2, _ = StretchState.state_change_within_tolerance(zero_diff, tol)
    assert too_small2


def test_instruction_templates_cover_registered_param_types():
    import safevla_tpu.tasks  # noqa: F401 — registers all task types incl. probes

    # every instruction type must have a param schema
    for key in REGISTERED_INSTRUCTION_TYPES:
        assert key in REGISTERED_TASK_PARAMS
    spec = {"synsets": ["mug.n.01"]}
    for task_type in ("ObjectNavType", "FetchType", "PickupType"):
        s = get_natural_language_spec(task_type, dict(spec))
        assert "mug" in s
    s = get_natural_language_spec("RoomVisit", {"num_rooms_in_house": 3})
    assert "3 rooms" in s
    # legacy alias
    s2 = get_natural_language_spec("SimpleExploreHouse", {"num_rooms_in_house": 2})
    assert "2 rooms" in s2


def test_normalize_and_det():
    assert normalize("coffee_mug.n.01") == "coffee mug"
    assert choose_det("apple").startswith("an ")
    assert choose_det("mug").startswith("a ")


def test_lazy_json_stores(tmp_path):
    from safevla_tpu.data import LazyJsonHouses, load_dataset_from_path

    path = tmp_path / "train.jsonl.gz"
    rows = [{"rooms": [i], "idx": i} for i in range(5)]
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    houses = LazyJsonHouses.from_jsonlgz(str(path))
    assert len(houses) == 5
    assert houses[2]["idx"] == 2
    assert len(houses.cached_data) == 1  # lazy: only parsed index 2
    sel = houses.select([0, 4])
    assert sel[1]["idx"] == 4

    ds = load_dataset_from_path(
        split_to_path={"train": str(path), "val": str(tmp_path / "missing.jsonl.gz")}
    )
    assert "train" in ds and "val" not in ds
    assert ds.train[0]["idx"] == 0


def test_tokenizer_fixed_shapes():
    from safevla_tpu.preprocessing.tokenize import InstructionTokenizer

    tok = InstructionTokenizer(max_tokens=16)
    tokens, mask = tok.encode_batch(["go to a mug", "find an apple near the sofa"])
    assert tokens.shape == (2, 16) and mask.shape == (2, 16)
    assert mask[0].sum() > 0
    # deterministic
    t2, _ = tok.encode_batch(["go to a mug", "find an apple near the sofa"])
    np.testing.assert_array_equal(tokens, t2)


def test_augment_deterministic_and_bounded():
    import jax
    import jax.numpy as jnp

    from safevla_tpu.preprocessing.augment import (
        apply_augment,
        identity_augment_params,
        sample_augment_params,
    )

    key = jax.random.PRNGKey(0)
    params = sample_augment_params(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    y1 = apply_augment(x, params)
    y2 = apply_augment(x, sample_augment_params(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-7)
    assert float(y1.min()) >= 0.0 and float(y1.max()) <= 1.0
    # identity params are a no-op
    y0 = apply_augment(x, identity_augment_params())
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-7)
import numpy as np
from safevla_tpu.envs.bbox_sensors import (
    DetectorBBoxSensor, NullDetector, TaskRelevantObjectBBoxSensor,
)
from safevla_tpu.constants import EMPTY_BBOX


class _SegEnv:
    navigation_camera = np.zeros((32, 48, 3), np.uint8)

    def get_segmentation_mask_of_object(self, oid, which_camera="nav"):
        mask = np.zeros((32, 48), bool)
        if oid == "Mug|1":
            mask[10:20, 5:15] = True
        return mask


class _Task:
    task_info = {
        "synsets": ["mug.n.01"],
        "synset_to_object_ids": {"mug.n.01": ["Mug|1", "Mug|2"]},
    }


def test_gt_bbox_sensor():
    s = TaskRelevantObjectBBoxSensor()
    box = s.get_observation(_SegEnv(), _Task())
    assert box.shape == (10,)
    x1, y1, x2, y2, area = box[:5]
    assert (x1, y1, x2, y2) == (5, 10, 14, 19)
    assert area == 100
    assert list(box[5:]) == list(EMPTY_BBOX)


def test_gt_bbox_sensor_empty_when_not_visible():
    class T2:
        task_info = {"synsets": ["vase.n.01"],
                     "synset_to_object_ids": {"vase.n.01": ["Vase|9"]}}

    box = TaskRelevantObjectBBoxSensor().get_observation(_SegEnv(), T2())
    assert list(box[:5]) == list(EMPTY_BBOX)


def test_detector_bbox_sensor_null():
    s = DetectorBBoxSensor(NullDetector())
    box = s.get_observation(_SegEnv(), _Task())
    assert list(box[:5]) == list(EMPTY_BBOX)


def test_detector_bbox_sensor_custom():
    class Det:
        def detect(self, image, vocab):
            assert vocab == ["mug"]
            return [(1, 2, 11, 22, 0.9), (0, 0, 2, 2, 0.9)]

    box = DetectorBBoxSensor(Det()).get_observation(_SegEnv(), _Task())
    assert list(box[:5]) == [1, 2, 11, 22, 200]


def test_every_registered_task_type_has_an_instruction_template():
    import random

    import safevla_tpu.tasks  # noqa: F401 — registers all task types incl. probes
    from safevla_tpu.types import REGISTERED_TASK_PARAMS
    from safevla_tpu.utils.instructions import REGISTERED_INSTRUCTION_TYPES

    random.seed(0)
    missing = [t for t in REGISTERED_TASK_PARAMS if t not in REGISTERED_INSTRUCTION_TYPES]
    assert not missing, f"task types without instruction templates: {missing}"
    # point-goal templates take no object params
    assert REGISTERED_INSTRUCTION_TYPES["GoToPoint"]({}).endswith("point")
    assert REGISTERED_INSTRUCTION_TYPES["GoNearPoint"]({}).endswith("object")


def test_flops_estimates_magnitude_and_scaling():
    """Guards the analytic FLOP accounting behind the bench MFU lines
    (PERFORMANCE.md r5 "Offline MFU resolved": cost_analysis undercounts,
    so these numbers ARE the published accounting)."""
    from safevla_tpu.algo.flops import bc_step_flops_estimate, update_flops_estimate
    from safevla_tpu.config import Config

    cfg = Config()
    bc = bc_step_flops_estimate(cfg, 16, 50)
    # documented magnitude at the reference BC config (64.8 TFLOP)
    assert 55e12 < bc < 75e12, bc
    # linear in batch
    assert abs(bc_step_flops_estimate(cfg, 32, 50) / bc - 2.0) < 1e-6
    upd = update_flops_estimate(cfg, 32, 128)
    # documented magnitude for the PPO update (~606 TFLOP, r3/r4 accounting)
    assert 500e12 < upd < 700e12, upd
    # the BC step's ViT share dominates its tower share
    from safevla_tpu.algo.flops import _vit_fwd_flops

    assert _vit_fwd_flops(cfg, 1600) > 0.4 * bc
