"""Schema parity against the BUNDLED benchmark episode files.

The reference ships its de-facto integration-test data at
benchmark/{objectnavtype,fetchtype,pickuptype}_val.jsonl.gz (reference
online_evaluation/online_evaluator.py:287-338 loads them). These tests run
the REAL files through the full normalization chain
(load_benchmark_episodes -> eval_sample_to_normalized_eval_sample ->
normalized_eval_sample_to_task_spec) so any schema drift fails CI.
"""

import os

import pytest

from safevla_tpu.evaluation.types import (
    MAX_EPISODE_LEN_PER_TASK,
    eval_sample_to_normalized_eval_sample,
    load_benchmark_episodes,
    normalized_eval_sample_to_task_spec,
)

BENCHMARK_DIR = "/root/reference/benchmark"

CASES = [
    ("objectnavtype_val.jsonl.gz", "ObjectNavType", 200),
    ("fetchtype_val.jsonl.gz", "FetchType", 172),
    ("pickuptype_val.jsonl.gz", "PickupType", 171),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BENCHMARK_DIR), reason="bundled benchmark files not on disk"
)


@pytest.mark.parametrize("fname,task_type,count", CASES)
def test_bundled_benchmark_normalizes_end_to_end(fname, task_type, count):
    episodes = load_benchmark_episodes(os.path.join(BENCHMARK_DIR, fname))
    assert len(episodes) == count
    assert task_type in MAX_EPISODE_LEN_PER_TASK
    assert MAX_EPISODE_LEN_PER_TASK[task_type] == 600

    for i, ep in enumerate(episodes):
        assert ep["task_type"] == task_type
        norm = eval_sample_to_normalized_eval_sample(task_type, ep, i)
        assert norm["task_type"] == task_type
        assert norm["sub_house_id"] == i
        assert norm["house_id"] == str(ep["house_index"]).zfill(6)

        spec = normalized_eval_sample_to_task_spec(norm)
        # the spec must carry everything the task constructor consumes
        assert spec["task_type"] == task_type
        assert spec["natural_language_spec"] == ep["natural_language_spec"]
        assert spec["agent_starting_position"] == ep["agent_starting_position"]
        assert spec["agent_y_rotation"] == ep["agent_y_rotation"]
        assert spec["synsets"] == ep["synsets"]
        assert spec["synset_to_object_ids"] == ep["synset_to_object_ids"]
        assert spec["broad_synset_to_object_ids"] == ep["broad_synset_to_object_ids"]
        assert spec["eval_info"]["sample_id"] == norm["sample_id"]
        # exactly one goal synset per episode in all three benchmarks
        assert len(ep["synsets"]) == 1


def test_bundled_benchmark_mismatched_type_rejected():
    episodes = load_benchmark_episodes(
        os.path.join(BENCHMARK_DIR, "objectnavtype_val.jsonl.gz")
    )
    with pytest.raises(AssertionError):
        eval_sample_to_normalized_eval_sample("FetchType", episodes[0], 0)
