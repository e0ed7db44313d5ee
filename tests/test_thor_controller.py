"""StretchController facade, driven against a mock ai2thor backend.

Verifies the action mapping (magnitudes, wrist bounds, arm deltas), the
state-change success heuristics, reset-time navmesh injection + calibration,
and teleport plumbing — without a Unity binary.
"""

import math
import sys
import types

import numpy as np
import pytest


class MockEvent:
    def __init__(self, metadata):
        self.metadata = metadata
        self.frame = np.zeros((224, 396, 3), np.uint8)
        self.third_party_camera_frames = [np.zeros((224, 396, 4), np.uint8)]

    def __bool__(self):
        return True


def _base_metadata():
    return {
        "errorMessage": "",
        "collided": False,
        "agent": {
            "position": {"x": 1.0, "y": 0.9, "z": 2.0},
            "rotation": {"x": 0.0, "y": 90.0, "z": 0.0},
            "cameraHorizon": 0,
            "isStanding": True,
        },
        "arm": {
            "heldObjects": [],
            "pickupableObjects": [],
            "handSphereCenter": {"x": 1.0, "y": 0.8, "z": 2.1},
            "joints": [
                {"name": "stretch_robot_lift_jnt",
                 "rootRelativePosition": {"x": 0.0, "y": 0.5, "z": 0.0}},
                {"name": "stretch_robot_wrist_1_jnt",
                 "position": {"x": 1.0, "y": 0.8, "z": 2.0}},
                {"name": "stretch_robot_wrist_2_jnt",
                 "rootRelativePosition": {"x": 0.0, "y": 0.5, "z": 0.3},
                 "position": {"x": 1.0, "y": 0.8, "z": 2.1},
                 "rootRelativeRotation": {"w": 1.0, "x": 0, "y": 20.0, "z": 0}},
            ],
        },
        "objects": [
            {"objectId": "Mug|1", "name": "Mug_1", "objectType": "Mug",
             "position": {"x": 2.0, "y": 1.0, "z": 2.0},
             "rotation": {"x": 0, "y": 0, "z": 0}, "visible": True,
             "distance": 1.0},
        ],
        "thirdPartyCameras": [{"fieldOfView": 59}],
    }


class MockTHOR:
    """Stands in for ai2thor.controller.Controller."""

    def __init__(self, **kwargs):
        self.init_kwargs = kwargs
        self.calls = []
        self.metadata = _base_metadata()
        self.last_event = MockEvent(self.metadata)
        self.move_works = True

    def step(self, action=None, **kwargs):
        if isinstance(action, dict):
            kwargs = {**action, **kwargs}
            action = kwargs.pop("action")
        self.calls.append({"action": action, **kwargs})
        if action == "MoveAheadQuick" and self.move_works:
            rad = math.radians(self.metadata["agent"]["rotation"]["y"])
            self.metadata["agent"]["position"]["x"] += kwargs["moveMagnitude"] * math.sin(rad)
            self.metadata["agent"]["position"]["z"] += kwargs["moveMagnitude"] * math.cos(rad)
        elif action == "RotateRightQuick":
            self.metadata["agent"]["rotation"]["y"] += kwargs["degrees"]
        elif action == "MoveArm" and self.move_works:
            self.metadata["arm"]["joints"][0]["rootRelativePosition"]["y"] = (
                kwargs["position"]["y"] + 0.16297650337219238
            )
        elif action == "GetReachablePositions":
            self.metadata = {**self.metadata, "actionReturn": [
                {"x": 1.0, "y": 0.9, "z": 2.0}
            ]}
        elif action == "GetVisibleObjects":
            self.metadata = {**self.metadata, "actionReturn": ["Mug|1"]}
        self.last_event = MockEvent(self.metadata)
        return self.last_event

    def reset(self, scene=None, **kwargs):
        self.calls.append({"action": "__reset__", "scene": scene})
        self.last_event = MockEvent(self.metadata)
        return self.last_event

    def stop(self):
        self.calls.append({"action": "__stop__"})


@pytest.fixture()
def controller(monkeypatch):
    mod = types.ModuleType("ai2thor")
    ctrl_mod = types.ModuleType("ai2thor.controller")
    ctrl_mod.Controller = MockTHOR
    mod.controller = ctrl_mod
    monkeypatch.setitem(sys.modules, "ai2thor", mod)
    monkeypatch.setitem(sys.modules, "ai2thor.controller", ctrl_mod)

    from safevla_tpu.envs.thor_controller import StretchController

    c = StretchController(initialize_controller=True, use_quick_navi_action=True)
    return c


def test_cameras_cropped(controller):
    assert controller.navigation_camera.shape == (224, 384, 3)
    assert controller.manipulation_camera.shape == (224, 384, 3)


def test_move_ahead_maps_to_quick_action(controller):
    before = controller.get_current_agent_position()
    event = controller.agent_step("m")
    last = [c for c in controller.controller.calls if c["action"] == "MoveAheadQuick"][-1]
    assert last["moveMagnitude"] == pytest.approx(0.2)
    assert event.metadata["lastActionSuccess"]
    after = controller.get_current_agent_position()
    # rotation y=90 -> moves along +x
    assert after["x"] == pytest.approx(before["x"] + 0.2)


def test_rotate_small_is_sixth_of_degree(controller):
    controller.agent_step("rs")
    last = [c for c in controller.controller.calls if c["action"] == "RotateRightQuick"][-1]
    assert last["degrees"] == pytest.approx(30 / 5)


def test_arm_move_uses_relative_state_and_detects_no_motion(controller):
    ev = controller.agent_step("yp")
    last = [c for c in controller.controller.calls if c["action"] == "MoveArm"][-1]
    # base lift (0.5 - offset) + 0.1
    assert last["position"]["y"] == pytest.approx(0.5 - 0.16297650337219238 + 0.1)
    assert ev.metadata["lastActionSuccess"]
    # a stuck arm (no state change) must report failure
    controller.controller.move_works = False
    ev2 = controller.agent_step("yp")
    assert not ev2.metadata["lastActionSuccess"]


def test_wrist_bounds(controller):
    # wrist at 20deg; closing is bounded by STRETCH_WRIST_BOUND_1=75
    controller.agent_step("wm")
    last = [c for c in controller.controller.calls if c["action"] == "RotateWristRelative"][-1]
    assert last["yaw"] == pytest.approx(10)  # min(10, |75-20|)


def test_pickup_reports_failure_until_task_judges(controller):
    ev = controller.agent_step("p")
    assert not ev.metadata["lastActionSuccess"]
    ev2 = controller.agent_step("d")
    assert ev2.metadata["lastActionSuccess"]


def test_reset_injects_navmeshes_and_builds_rooms(controller):
    scene = {
        "metadata": {},
        "rooms": [
            {"id": "room0", "roomType": "Kitchen", "floorPolygon": [
                {"x": 0, "y": 0, "z": 0}, {"x": 4, "y": 0, "z": 0},
                {"x": 4, "y": 0, "z": 4}, {"x": 0, "y": 0, "z": 4}]},
        ],
    }
    controller.reset(scene)
    assert len(scene["metadata"]["navMeshes"]) == 4  # one per agent radius
    assert scene["metadata"]["agent"]["horizon"] == 0
    assert "room0" in controller.room_poly_map
    assert controller.room_type_dict["room0"] == "Kitchen"
    assert controller.get_room_id_from_location({"x": 1, "z": 1}) == "room0"
    # calibration ran (camera mounts + FOV + gripper)
    actions = [c["action"] for c in controller.controller.calls]
    assert actions.count("RotateCameraMount") >= 2
    assert "SetGripperOpenness" in actions


def test_teleport_blocks_raw_and_routes_wrapped(controller):
    with pytest.raises(NotImplementedError):
        controller.step(action="Teleport", position={})
    controller.teleport_agent({"x": 0, "y": 0.9, "z": 0}, {"x": 0, "y": 45, "z": 0})
    last = [c for c in controller.controller.calls if c["action"] == "Teleport"][-1]
    assert last["rotation"]["y"] == 45


def test_visible_objects_cached_until_reset(controller):
    v1 = controller.get_visible_objects(maximum_distance=2)
    calls_before = len(controller.controller.calls)
    v2 = controller.get_visible_objects(maximum_distance=2)
    assert v1 == v2 == ["Mug|1"]
    assert len(controller.controller.calls) == calls_before  # cache hit
    controller.reset_visibility_cache()
    controller.get_visible_objects(maximum_distance=2)
    assert len(controller.controller.calls) == calls_before + 1
