"""Detic integration: the pure post-detection policy and the sensor-side
selection/caching, exercised with a fake detector (the detectron2 model stack
is an optional heavy dependency; its wrapper code is import-gated)."""

import numpy as np

from safevla_tpu.constants import EMPTY_BBOX, EMPTY_DOUBLE_BBOX
from safevla_tpu.envs.bbox_sensors import (
    NullDetector,
    TaskRelevantObjectBBoxSensorDetic,
    load_detic_detector,
)
from safevla_tpu.envs.detic import resize_boxes, select_best_box


def test_resize_boxes_matches_reference_quirk():
    # reference detic_utils.py:85-112: scale then a fixed -6px x shift
    boxes = [[10, 20, 110, 220]]
    out = resize_boxes(boxes, original_size=(100, 100), new_size=(200, 200))
    assert out == [[14, 40, 214, 440]]
    out2 = resize_boxes(boxes, (100, 100), (100, 100), cutoff_amount=0)
    assert out2 == [[10, 20, 110, 220]]


def test_select_best_box_threshold_policy():
    boxes = [[1, 2, 11, 22], [5, 5, 10, 10]]
    classes = ["mug", "mug"]
    # best score below the default 0.5 threshold for a non-relaxed lemma
    out = select_best_box(boxes, [0.4, 0.35], classes, "toaster")
    np.testing.assert_array_equal(out, np.array(EMPTY_DOUBLE_BBOX))
    # the same score passes for a relaxed-category lemma (mug: 0.3)
    out = select_best_box(boxes, [0.4, 0.35], classes, "mug")
    assert out[4] == (22 - 2) * (11 - 1)  # area channel
    np.testing.assert_array_equal(out[:4], [1, 2, 11, 22])
    np.testing.assert_array_equal(out[5:], np.array(EMPTY_BBOX))
    # empty detections
    np.testing.assert_array_equal(
        select_best_box([], [], [], "mug"), np.array(EMPTY_DOUBLE_BBOX)
    )


class _FakeEnv:
    def __init__(self):
        self.frame = np.zeros((8, 8, 3), np.uint8)

    @property
    def navigation_camera(self):
        return self.frame


class _FakeTask:
    task_info = {"synsets": ["mug.n.01"]}


class _CountingDetector:
    def __init__(self):
        self.calls = 0

    def detect(self, image, vocabulary):
        self.calls += 1
        assert vocabulary == ["mug"]
        return [(1, 2, 5, 6, 0.9)]


def test_detic_sensor_selection_and_frame_cache():
    det = _CountingDetector()
    sensor = TaskRelevantObjectBBoxSensorDetic(det)
    env, task = _FakeEnv(), _FakeTask()
    out1 = sensor.get_observation(env, task)
    np.testing.assert_array_equal(out1[:4], [1, 2, 5, 6])
    # unchanged frame -> cached, no re-detection
    out2 = sensor.get_observation(env, task)
    assert det.calls == 1
    np.testing.assert_array_equal(out1, out2)
    # frame change -> re-detect
    env.frame = env.frame + 1
    sensor.get_observation(env, task)
    assert det.calls == 2


def test_load_detic_detector_falls_back_without_stack():
    det = load_detic_detector()
    assert isinstance(det, NullDetector)
    assert det.detect(np.zeros((4, 4, 3), np.uint8), ["mug"]) == []
