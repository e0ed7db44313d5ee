import numpy as np
import pytest

from safevla_tpu.constants import ALL_STRETCH_ACTIONS
from safevla_tpu.envs.fake_controller import FakeController
from safevla_tpu.envs.sensors import default_train_sensors
from safevla_tpu.tasks import (
    REGISTERED_TASKS,
    MultiTaskSampler,
    ObjectNavTask,
    TaskSpecSamplerInfiniteList,
    map_task_type,
)
from safevla_tpu.types import RewardConfig, THORActions


def make_task_spec(controller, task_type="ObjectNavType"):
    objs = controller.get_objects()
    target = objs[0]
    synset = target["objectType"].lower() + ".n.01"
    ids = [
        o["objectId"] for o in objs if o["objectType"] == target["objectType"]
    ]
    return {
        "task_type": task_type,
        "house_index": 0,
        "natural_language_spec": f"go to a {target['objectType'].lower()}",
        "agent_starting_position": [1.5, 0.9, 3.0],
        "agent_y_rotation": 0.0,
        "synsets": [synset],
        "synset_to_object_ids": {synset: ids},
        "broad_synset_to_object_ids": {synset: ids},
    }


@pytest.fixture()
def sampler():
    controller = FakeController(seed=3)
    spec = make_task_spec(controller)
    reward_config = RewardConfig(goal_success_reward=10.0)
    task_args = dict(
        sensors=default_train_sensors(),
        max_steps=20,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=reward_config,
    )
    return MultiTaskSampler(
        mode="train",
        task_args=task_args,
        houses=[{"rooms": [{}, {}]}],
        house_inds=[0],
        controller_args={"seed": 3},
        controller_type=FakeController,
        task_spec_sampler=TaskSpecSamplerInfiniteList(
            {0: [spec]}, shuffle=True, repeat_house_until_forced=True
        ),
        controller=controller,
    )


def test_registry_contains_all_task_families():
    for t in [
        "ObjectNavType", "EasyObjectNavType", "ObjectNavRoom",
        "ObjectNavRelAttribute", "ObjectNavAffordance", "ObjectNavLocalRef",
        "ObjectNavDescription", "FetchType", "EasyFetchType", "PickupType",
        "RoomVisit",
    ]:
        assert t in REGISTERED_TASKS, f"{t} missing from registry"
    assert map_task_type("SimpleExploreHouse") == "RoomVisit"


def test_sampler_builds_task_and_episode_runs(sampler):
    task = sampler.next_task()
    assert isinstance(task, ObjectNavTask)
    assert task.task_info["extras"] == {}

    obs = task.get_observations()
    assert obs["rgb_raw"].shape[2] == 3
    assert int(obs["time_step"]) == 0
    assert obs["natural_language_spec"].dtype == np.uint8

    total_cost = 0
    rng = np.random.default_rng(0)
    steps = 0
    while not task.is_done():
        a = int(rng.integers(len(ALL_STRETCH_ACTIONS)))
        res = task.step(a)
        total_cost += res.cost
        steps += 1
    assert steps <= 20
    m = task.metrics()
    assert "success" in m and "cost" in m and "spl" in m
    assert m["cost"] == total_cost == task.cumulative_cost


def test_time_step_sensor_sequence(sampler):
    task = sampler.next_task()
    seq = [int(task.get_observations()["time_step"])]
    for t in range(5):
        res = task.step(ALL_STRETCH_ACTIONS.index(THORActions.rotate_left))
        seq.append(int(res.observation["time_step"]))
    assert seq == [0, 1, 2, 3, 4, 5]


def test_trajectory_sensor_increments_across_episodes(sampler):
    task = sampler.next_task()
    traj0 = int(task.get_observations()["traj_index"])
    # finish episode via done action
    task.step(ALL_STRETCH_ACTIONS.index(THORActions.done))
    task2 = sampler.next_task()
    traj1 = int(task2.get_observations()["traj_index"])
    assert traj1 == traj0 + 1


def test_done_action_sets_success_flag(sampler):
    task = sampler.next_task()
    res = task.step(ALL_STRETCH_ACTIONS.index(THORActions.done))
    assert res.done
    assert task._took_end_action
    m = task.metrics()
    assert m["success"] == task.successful_if_done()


def test_fetch_task_runs():
    controller = FakeController(seed=5)
    from safevla_tpu.tasks import FetchTask

    spec = make_task_spec(controller, "FetchType")
    task_info = MultiTaskSampler.task_spec_to_task_info(spec, 0, {"rooms": []})
    task_info["extras"] = {}
    task = FetchTask(
        controller=controller,
        sensors=default_train_sensors(),
        task_info=task_info,
        max_steps=10,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(shaping_weight=1.0),
    )
    rng = np.random.default_rng(1)
    while not task.is_done():
        task.step(int(rng.integers(len(ALL_STRETCH_ACTIONS))))
    m = task.metrics()
    assert "cost" in m and "success" in m


def test_room_visit_task_runs():
    controller = FakeController(seed=7)
    from safevla_tpu.tasks import RoomVisitTask

    task_info = {
        "task_type": "RoomVisit",
        "house_index": "0",
        "natural_language_spec": "explore the house",
        "num_rooms_in_house": 2,
        "extras": {},
    }
    task = RoomVisitTask(
        controller=controller,
        sensors=default_train_sensors(),
        task_info=task_info,
        max_steps=15,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(shaping_weight=1.0),
    )
    rng = np.random.default_rng(2)
    while not task.is_done():
        task.step(int(rng.integers(len(ALL_STRETCH_ACTIONS))))
    m = task.metrics()
    assert m["num_rooms_in_house"] == 2
    assert "rooms_visited" in m


def test_object_nav_multi_in_order():
    from safevla_tpu.tasks import ObjectNavMultiTask

    controller = FakeController(seed=9)
    objs = controller.get_objects()
    types = []
    for o in objs:
        if o["objectType"] not in types:
            types.append(o["objectType"])
        if len(types) == 2:
            break
    synsets = [t.lower() + ".n.01" for t in types]
    ids = {
        s: [o["objectId"] for o in objs if o["objectType"] == t]
        for s, t in zip(synsets, types)
    }
    task_info = {
        "task_type": "ObjectNavMulti",
        "house_index": "0",
        "natural_language_spec": "multi nav",
        "synsets": synsets,
        "synset_to_object_ids": ids,
        "broad_synset_to_object_ids": ids,
        "extras": {},
    }
    task = ObjectNavMultiTask(
        controller=controller,
        sensors=default_train_sensors(),
        task_info=task_info,
        max_steps=30,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(),
    )
    assert task.found_target_idx == []
    # sub_done with nothing visible in order fails quietly
    task.step(ALL_STRETCH_ACTIONS.index(THORActions.sub_done))
    # success only when all targets found (none found -> not successful)
    assert task.successful_if_done() in (False, True)  # computable without error
    task.step(ALL_STRETCH_ACTIONS.index(THORActions.done))
    m = task.metrics()
    assert "cost" in m


def test_room_nav_success_by_room_type():
    from safevla_tpu.tasks import RoomNavTask

    controller = FakeController(seed=4)
    task_info = {
        "task_type": "RoomNav",
        "house_index": "0",
        "natural_language_spec": "go to the kitchen",
        "room_types": ["Kitchen"],
        "room_ids": {},
        "extras": {},
    }
    task = RoomNavTask(
        controller=controller,
        sensors=default_train_sensors(),
        task_info=task_info,
        max_steps=10,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(goal_success_reward=10.0),
    )
    # FakeController: room1 (x > size/2) is the Kitchen
    controller.teleport_agent({"x": 5.0, "y": 0.9, "z": 3.0}, {"x": 0, "y": 0, "z": 0})
    assert task.successful_if_done()
    res = task.step(ALL_STRETCH_ACTIONS.index(THORActions.done))
    assert task.metrics()["success"]
    controller2 = FakeController(seed=4)
    task_info2 = dict(task_info, extras={})
    t2 = RoomNavTask(
        controller=controller2, sensors=default_train_sensors(),
        task_info=task_info2, max_steps=10, action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(),
    )
    controller2.teleport_agent({"x": 1.0, "y": 0.9, "z": 3.0}, {"x": 0, "y": 0, "z": 0})
    assert not t2.successful_if_done()


def test_room_visitation_and_failure_diagnostics(sampler):
    task = sampler.next_task()
    # run the episode to the step cap without issuing done -> guaranteed failure
    while not task.is_done():
        task.step(ALL_STRETCH_ACTIONS.index(THORActions.move_ahead))
    m = task.metrics()
    assert 0.0 <= m["percentage_rooms_visited"] <= 1.0
    assert m["total_rooms_visited"] >= 1  # the starting room counts
    assert 0.0 <= m["percentage_collision"] <= 1.0
    obj = task.task_info["synsets"][0]
    assert m[f"extra/{obj}/success"] == m["success"] == False  # noqa: E712
    assert f"extra/{obj}/when_failed_visited_obj_room" in m
    assert isinstance(m[f"extra/{obj}/when_failed_visited_obj_room"], bool)


def test_fetch_failed_but_tried_pickup():
    controller = FakeController(seed=5)
    spec = make_task_spec(controller, task_type="FetchType")
    task_args = dict(
        sensors=default_train_sensors(),
        max_steps=6,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(goal_success_reward=10.0),
    )
    s = MultiTaskSampler(
        mode="train",
        task_args=task_args,
        houses=[{"rooms": [{}, {}]}],
        house_inds=[0],
        controller_args={"seed": 5},
        controller_type=FakeController,
        task_spec_sampler=TaskSpecSamplerInfiniteList(
            {0: [spec]}, shuffle=False, repeat_house_until_forced=True
        ),
        controller=controller,
    )
    task = s.next_task()
    task.step(ALL_STRETCH_ACTIONS.index(THORActions.pickup))
    while not task.is_done():
        task.step(ALL_STRETCH_ACTIONS.index(THORActions.move_ahead))
    m = task.metrics()
    if not m["success"]:
        assert m["failed_but_tried_pickup"] == 1


def test_minimum_target_alignment_sensor(sampler):
    from safevla_tpu.envs.geometry import heading_to_target
    from safevla_tpu.envs.sensors import MinimumTargetAlignmentSensor

    # helper semantics: target straight ahead (z+) at heading 0 -> 0 deg;
    # directly behind -> 180 (wrapped to (-180, 180])
    pose = {"position": {"x": 0.0, "z": 0.0}, "rotation": {"y": 0.0}}
    assert heading_to_target(pose, {"x": 0.0, "z": 1.0}) == 0.0
    assert heading_to_target(pose, {"x": 1.0, "z": 0.0}) == 90.0
    assert heading_to_target(pose, {"x": 0.0, "z": -1.0}) == 180.0
    pose = {"position": {"x": 0.0, "z": 0.0}, "rotation": {"y": 90.0}}
    assert heading_to_target(pose, {"x": 1.0, "z": 0.0}) == 0.0

    task = sampler.next_task()
    obs = MinimumTargetAlignmentSensor().get_observation(task.controller, task)
    assert obs.shape == (1,) and obs.dtype == np.float64
    # either no target visible (-1) or a valid |alignment| in [0, 180]
    assert obs[0] == -1 or 0 <= obs[0] <= 180


def test_goal_object_type_sensor(sampler):
    """Categorical goal-type index (reference navigation_sensors.py:763)."""
    from safevla_tpu.envs.sensors import GoalObjectTypeSensor

    task = sampler.next_task()
    goal = task.task_info["synsets"][0]
    types = sorted({goal, "zebra.n.01", "aardvark.n.01"})
    sensor = GoalObjectTypeSensor(object_types=types)
    obs = sensor.get_observation(task.controller, task)
    assert obs == types.index(goal)
    assert obs.dtype == np.int64

    # more than one goal synset violates the reference's invariant
    task.task_info["synsets"] = [goal, "zebra.n.01"]
    with pytest.raises(AssertionError):
        sensor.get_observation(task.controller, task)
    task.task_info["synsets"] = [goal]
