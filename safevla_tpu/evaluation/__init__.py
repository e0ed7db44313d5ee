from safevla_tpu.evaluation.types import (
    MAX_EPISODE_LEN_PER_TASK,
    eval_sample_to_normalized_eval_sample,
    normalized_eval_sample_to_task_spec,
)
from safevla_tpu.evaluation.evaluator import BatchedEvaluator, MetricAggregator
from safevla_tpu.evaluation.agent import InferenceAgent

__all__ = [
    "MAX_EPISODE_LEN_PER_TASK",
    "eval_sample_to_normalized_eval_sample",
    "normalized_eval_sample_to_task_spec",
    "BatchedEvaluator",
    "MetricAggregator",
    "InferenceAgent",
]
