from safevla_tpu.rollout.env_pool import EnvPool, EnvStep
from safevla_tpu.rollout.runner import RolloutRunner

__all__ = ["EnvPool", "EnvStep", "RolloutRunner"]
