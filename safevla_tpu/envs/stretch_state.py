"""Stretch robot state snapshot, differencing, and coordinate transforms.

Counterpart of reference environment/stretch_state.py: a full snapshot of the
robot (base pose, wrist lift/extend/yaw, hand-sphere position, gripper, held
objects), absolute difference between states, tolerance comparison (how the
controller decides whether a spatial action "did anything"), and
world<->agent coordinate transforms (numpy-only; the reference uses
scipy.spatial.transform).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Set, Tuple

import numpy as np


def _rot_y_matrix(deg: float) -> np.ndarray:
    r = math.radians(deg)
    c, s = math.cos(r), math.sin(r)
    # Unity's left-handed y-rotation convention (matches scipy "xyz" euler on y)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def convert_world_to_agent_coordinate(
    world_position: Dict[str, float], agent_position: Dict[str, float], agent_y_rotation: float
) -> Dict[str, float]:
    rel = np.array(
        [
            world_position["x"] - agent_position["x"],
            world_position["y"] - agent_position.get("y", 0.0),
            world_position["z"] - agent_position["z"],
        ]
    )
    inv = np.linalg.inv(_rot_y_matrix(agent_y_rotation))
    out = inv @ rel
    return {"x": float(out[0]), "y": float(out[1]), "z": float(out[2])}


def convert_agent_to_world_coordinate(
    agent_frame_position: Dict[str, float],
    agent_position: Dict[str, float],
    agent_y_rotation: float,
) -> Dict[str, float]:
    rel = np.array(
        [agent_frame_position["x"], agent_frame_position["y"], agent_frame_position["z"]]
    )
    out = _rot_y_matrix(agent_y_rotation) @ rel
    return {
        "x": float(out[0] + agent_position["x"]),
        "y": float(out[1] + agent_position.get("y", 0.0)),
        "z": float(out[2] + agent_position["z"]),
    }


class StretchState:
    """Snapshot of the Stretch robot (reference stretch_state.py:21-120)."""

    arm_extreme_values = {
        "lift_max": 1.0457,
        "lift_min": -0.055,
        "lift_soft_min": 0.0,
        "extend_max": 0.759,
        "extend_min": 0.243,
    }
    hand_length = 0.20
    hand_height = 0.07
    wrist_rotation_bounds = (75, 100)
    agent_center_y_height = 0.9009982347488403
    max_interactable_height = 1.2

    def __init__(self, controller=None):
        if controller is not None:
            if hasattr(controller, "controller"):
                controller = controller.controller
            meta = controller.last_event.metadata
            agent = meta["agent"]
            arm = meta["arm"]
            joints = arm["joints"]
            wrist = joints[-1]
            assert wrist["name"] == "stretch_robot_wrist_2_jnt"
            lift = joints[0]["rootRelativePosition"]["y"]
            extend = wrist["rootRelativePosition"]["z"]
            yaw = math.fmod(
                wrist["rootRelativeRotation"]["w"] * wrist["rootRelativeRotation"]["y"],
                360,
            )
            hand = arm["handSphereCenter"]
            self._base_position = {
                "x": agent["position"]["x"],
                "y": self.agent_center_y_height,
                "z": agent["position"]["z"],
                "theta": agent["rotation"]["y"],
            }
            self._wrist_pose = {"y": lift, "z": extend, "yaw": yaw}
            self._hand_position = {"x": hand["x"], "y": hand["y"], "z": hand["z"]}
            self._gripper_openness = 0.0
            self._held_oids = set((True, oid) for oid in (arm["heldObjects"] or []))
        else:
            self._base_position = {
                "x": 0, "y": self.agent_center_y_height, "z": 0, "theta": 0,
            }
            self._wrist_pose = {"y": 0, "z": 0, "yaw": 0}
            self._hand_position = {"x": None, "y": None, "z": 0}
            self._gripper_openness = 0
            self._held_oids: Set[Tuple[bool, str]] = set()

    # ------------------------------------------------------------------
    @property
    def base_position(self) -> dict:
        return self._base_position

    @property
    def wrist_pose(self) -> dict:
        return self._wrist_pose

    @property
    def hand_position(self) -> dict:
        return self._hand_position

    @property
    def gripper_openness(self) -> float:
        return self._gripper_openness

    @property
    def held_oids(self) -> Set[Tuple[bool, str]]:
        return self._held_oids

    # ------------------------------------------------------------------
    @classmethod
    def _create_difference_state(
        cls, diff_base, diff_wrist, diff_hand, diff_gripper, diff_held_oids
    ) -> "StretchState":
        s = cls()
        s._base_position = {**diff_base, "y": 0}
        s._wrist_pose = diff_wrist
        s._hand_position = diff_hand
        s._gripper_openness = diff_gripper
        s._held_oids = diff_held_oids
        return s

    @staticmethod
    def difference(final_state: "StretchState", initial_state: "StretchState") -> "StretchState":
        def d(a: Optional[float], b: Optional[float]) -> float:
            if a is None or b is None:
                return 0.0
            return abs(a - b)

        def d_angle(a, b):
            return abs(((a - b) + 180) % 360 - 180)

        return StretchState._create_difference_state(
            diff_base={
                "x": d(final_state.base_position["x"], initial_state.base_position["x"]),
                "z": d(final_state.base_position["z"], initial_state.base_position["z"]),
                "theta": d_angle(
                    final_state.base_position["theta"], initial_state.base_position["theta"]
                ),
            },
            diff_wrist={
                "y": d(final_state.wrist_pose["y"], initial_state.wrist_pose["y"]),
                "z": d(final_state.wrist_pose["z"], initial_state.wrist_pose["z"]),
                "yaw": d_angle(
                    final_state.wrist_pose["yaw"], initial_state.wrist_pose["yaw"]
                ),
            },
            diff_hand={
                "x": d(final_state.hand_position["x"], initial_state.hand_position["x"]),
                "y": d(final_state.hand_position["y"], initial_state.hand_position["y"]),
                "z": d(final_state.hand_position["z"], initial_state.hand_position["z"]),
            },
            diff_gripper=d(final_state.gripper_openness, initial_state.gripper_openness),
            diff_held_oids=final_state.held_oids ^ initial_state.held_oids,
        )

    @staticmethod
    def state_change_within_tolerance(
        delta_state: "StretchState", tolerance: "StretchState"
    ) -> Tuple[bool, Dict[str, Any]]:
        """(all_within, per-field breakdown): True means the change is SMALLER
        than tolerance in every field (i.e. effectively no motion)."""
        checks = {}
        for k in ("x", "z", "theta"):
            checks[f"base_{k}"] = (
                delta_state.base_position[k] <= tolerance.base_position[k]
            )
        for k in ("y", "z", "yaw"):
            checks[f"wrist_{k}"] = delta_state.wrist_pose[k] <= tolerance.wrist_pose[k]
        for k in ("x", "y", "z"):
            checks[f"hand_{k}"] = (
                (delta_state.hand_position[k] or 0) <= tolerance.hand_position[k]
            )
        checks["gripper"] = delta_state.gripper_openness <= tolerance.gripper_openness
        checks["held"] = len(delta_state.held_oids - tolerance.held_oids) == 0
        return all(checks.values()), checks
