"""Trace record/replay harness (SURVEY §7 step 4 exit-test plumbing).

Self-test: record a scripted episode from a live (Fake) controller through
the full task/cost/reward stack, then replay the trace through the SAME
stack and assert the reward/cost traces are reproduced exactly. With a trace
recorded from real AI2-THOR (tools/record_thor_traces.py in the reference
environment), test_replay_matches_recorded_reference_trace runs the same
assertion against the reference-computed values."""

import gzip
import json
import os

import numpy as np
import pytest

from safevla_tpu.constants import ALL_STRETCH_ACTIONS
from safevla_tpu.envs.fake_controller import FakeController
from safevla_tpu.envs.replay_controller import RecordingController, ReplayController
from safevla_tpu.tasks import REGISTERED_TASKS
from safevla_tpu.types import RewardConfig


def _make_task(controller, max_steps=24):
    objs = controller.get_objects()
    target = objs[0]
    synset = target["objectType"].lower() + ".n.01"
    ids = [o["objectId"] for o in objs if o["objectType"] == target["objectType"]]
    spec = {
        "task_type": "ObjectNavType",
        "house_index": 0,
        "natural_language_spec": f"go to a {target['objectType'].lower()}",
        "agent_starting_position": [1.5, 0.9, 3.0],
        "agent_y_rotation": 0.0,
        "synsets": [synset],
        "synset_to_object_ids": {synset: ids},
        "broad_synset_to_object_ids": {synset: ids},
        "extras": {},
    }
    cls = REGISTERED_TASKS["ObjectNavType"]
    return cls(
        controller=controller,
        task_info=dict(spec),
        sensors=[],
        max_steps=max_steps,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(goal_success_reward=10.0),
    ), ids


SCRIPT = ["m", "r", "m", "l", "m", "m", "b", "r", "m", "ls", "m", "m"]


def _run_task(task, actions):
    rewards, costs = [], []
    for a in actions:
        idx = ALL_STRETCH_ACTIONS.index(a)
        res = task.step(idx)
        rewards.append(res.reward)
        costs.append(res.cost)
        if res.done:
            break
    return np.array(rewards), np.array(costs)


def test_record_then_replay_reproduces_reward_and_cost(tmp_path):
    live = FakeController(seed=3)
    _, target_ids = _make_task(live)

    rec = RecordingController(FakeController(seed=3), target_ids)
    rec.reset(scene={"rooms": [{}, {}]})
    task, _ = _make_task(rec)
    r_live, c_live = _run_task(task, SCRIPT)

    path = str(tmp_path / "trace.jsonl.gz")
    rec.save(path, extra={"rewards": r_live.tolist(), "costs": c_live.tolist()})

    rc = ReplayController(path)
    task2, _ = _make_task(rc)
    actions = rc.remaining_actions()
    assert actions == SCRIPT[: len(actions)]
    r_rep, c_rep = _run_task(task2, actions)

    np.testing.assert_allclose(r_rep, r_live, atol=1e-9)
    np.testing.assert_array_equal(c_rep, c_live)


def test_replay_asserts_on_divergent_action(tmp_path):
    live = FakeController(seed=5)
    _, target_ids = _make_task(live)
    rec = RecordingController(FakeController(seed=5), target_ids)
    rec.reset(scene={"rooms": [{}, {}]})
    task, _ = _make_task(rec)
    _run_task(task, ["m", "r"])
    path = str(tmp_path / "t.jsonl.gz")
    rec.save(path)

    rc = ReplayController(path)
    with pytest.raises(AssertionError, match="replay divergence"):
        rc.agent_step("b")  # trace says "m"


# -- real-THOR golden trace (auto-runs when shipped) -------------------------

_TRACE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "traces"
)
_REAL_TRACES = (
    sorted(
        os.path.join(_TRACE_DIR, f)
        for f in os.listdir(_TRACE_DIR)
        if f.endswith(".jsonl.gz")
    )
    if os.path.isdir(_TRACE_DIR)
    else []
)


@pytest.mark.skipif(not _REAL_TRACES, reason="no real-THOR traces recorded (traces/*.jsonl.gz)")
@pytest.mark.parametrize("trace_path", _REAL_TRACES)
def test_replay_matches_recorded_reference_trace(trace_path):
    rc = ReplayController(trace_path)
    header = rc.header
    spec = header["task_spec"]
    cls = REGISTERED_TASKS[spec["task_type"]]
    task = cls(
        controller=rc,
        task_info=dict(spec),
        sensors=[],
        max_steps=header.get("max_steps", 500),
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=RewardConfig(**header.get("reward_config", {})),
    )
    r, c = _run_task(task, rc.remaining_actions())
    np.testing.assert_allclose(r, np.array(header["rewards"][: len(r)]), atol=1e-5)
    np.testing.assert_array_equal(c, np.array(header["costs"][: len(c)]))
