#!/usr/bin/env python
"""Record real-AI2-THOR golden traces for the replay harness.

Run WHEREVER the Unity simulator runs (a GPU/CPU host with ai2thor and the
downloaded objaverse houses — e.g. the reference docker image) with THIS repo
on sys.path:

    python tools/record_thor_traces.py \
        --houses /path/objaverse_houses/val.jsonl.gz --house-index 0 \
        --task-type ObjectNavType --out traces/objectnav_house0.jsonl.gz

It drives OUR StretchController facade + task/cost/reward stack against the
real simulator over a scripted action sequence and snapshots every state
query (envs/replay_controller.RecordingController). The written trace
includes the reward/cost sequence computed against live THOR; dropping it in
traces/ makes tests/test_trace_replay.py re-verify those numbers on every
box, no Unity needed (SURVEY §7 step 4 exit test).

To capture the REFERENCE's own cost/reward numbers instead (strict
cross-implementation check), run the reference's task over the same script
and paste its values into the trace header's "rewards"/"costs".
"""

from __future__ import annotations

import argparse
import sys


DEFAULT_SCRIPT = [
    "m", "m", "r", "m", "l", "m", "m", "b", "rs", "m", "m", "ls", "m",
    "r", "m", "m", "l", "m", "b", "m",
]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--houses", required=True, help="objaverse houses jsonl.gz")
    p.add_argument("--house-index", type=int, default=0)
    p.add_argument("--task-type", default="ObjectNavType")
    p.add_argument("--actions", default=",".join(DEFAULT_SCRIPT))
    p.add_argument("--max-steps", type=int, default=100)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import numpy as np

    from safevla_tpu.constants import ALL_STRETCH_ACTIONS
    from safevla_tpu.data.stores import LazyJsonHouses
    from safevla_tpu.envs.replay_controller import RecordingController
    from safevla_tpu.envs.thor_controller import StretchController, default_thor_env_args
    from safevla_tpu.tasks import REGISTERED_TASKS
    from safevla_tpu.types import RewardConfig

    houses = LazyJsonHouses.from_path(args.houses)
    house = houses[args.house_index]

    inner = StretchController(**default_thor_env_args())
    inner.reset(house)

    objs = inner.get_objects()
    pickupable = [o for o in objs if o.get("pickupable")] or objs
    target = pickupable[0]
    synset = target["objectType"].lower() + ".n.01"
    ids = [o["objectId"] for o in objs if o["objectType"] == target["objectType"]]
    spec = {
        "task_type": args.task_type,
        "house_index": args.house_index,
        "natural_language_spec": f"go to a {target['objectType'].lower()}",
        "agent_starting_position": [
            inner.get_current_agent_position()[k] for k in ("x", "y", "z")
        ],
        "agent_y_rotation": 0.0,
        "synsets": [synset],
        "synset_to_object_ids": {synset: ids},
        "broad_synset_to_object_ids": {synset: ids},
        "extras": {},
    }

    rec = RecordingController(inner, ids)
    rec.reset(house)
    reward_cfg = RewardConfig(goal_success_reward=10.0)
    task = REGISTERED_TASKS[args.task_type](
        controller=rec,
        task_info=dict(spec),
        sensors=[],
        max_steps=args.max_steps,
        action_names=ALL_STRETCH_ACTIONS,
        reward_config=reward_cfg,
    )

    rewards, costs = [], []
    for a in args.actions.split(","):
        res = task.step(ALL_STRETCH_ACTIONS.index(a))
        rewards.append(float(res.reward))
        costs.append(float(res.cost))
        if res.done:
            break

    import dataclasses

    rec.save(
        args.out,
        extra={
            "task_spec": spec,
            "max_steps": args.max_steps,
            "reward_config": dataclasses.asdict(reward_cfg),
            "rewards": rewards,
            "costs": costs,
        },
    )
    print(f"wrote {args.out}: {len(rewards)} steps, "
          f"total reward {np.sum(rewards):.3f}, total cost {np.sum(costs):.0f}")
    inner.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
