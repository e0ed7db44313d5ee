from safevla_tpu.algo.losses import (
    ppo_surrogate_loss,
    safe_ppo_surrogate_loss,
    value_loss,
    imitation_bce_loss,
)
from safevla_tpu.algo.lagrange import LagrangeState, init_lagrange, update_lagrange
from safevla_tpu.algo.learner import Learner, TrainState

__all__ = [
    "ppo_surrogate_loss",
    "safe_ppo_surrogate_loss",
    "value_loss",
    "imitation_bce_loss",
    "LagrangeState",
    "init_lagrange",
    "update_lagrange",
    "Learner",
    "TrainState",
]
