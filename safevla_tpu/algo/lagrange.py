"""Lagrange multiplier state + projected ascent update.

Reproduces the semantics of `omnisafe.common.lagrange.Lagrange`, which the
reference pulls in for the multiplier that couples the cost critic to the
policy loss (reference: training/online/loss/customized_loss.py:14 and
allenact_trainer.py:63-72 where `cost_limit` enters training):

    lambda_loss = -lambda * (Jc - cost_limit)
    lambda     <- Adam step on lambda_loss, then projected to lambda >= 0

Here the multiplier and its Adam moments live in a small pytree inside the
jitted learner state, so the ascent runs on-device with everything else.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class LagrangeState(NamedTuple):
    multiplier: jax.Array  # scalar f32 (pre-projection raw value)
    opt_state: optax.OptState
    cost_limit: jax.Array
    upper_bound: Optional[float] = None


def _optimizer(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr)


def init_lagrange(
    cost_limit: float,
    multiplier_init: float = 0.001,
    lr: float = 0.035,
    upper_bound: Optional[float] = None,
) -> LagrangeState:
    init = jnp.asarray(max(multiplier_init, 0.0), jnp.float32)
    opt_state = _optimizer(lr).init(init)
    return LagrangeState(
        multiplier=init,
        opt_state=opt_state,
        cost_limit=jnp.asarray(cost_limit, jnp.float32),
        upper_bound=upper_bound,
    )


def multiplier_value(state: LagrangeState) -> jax.Array:
    """The projected multiplier actually used in the policy loss."""
    m = jnp.maximum(state.multiplier, 0.0)
    if state.upper_bound is not None:
        m = jnp.minimum(m, state.upper_bound)
    return m


def update_lagrange(
    state: LagrangeState, mean_episode_cost: jax.Array, lr: float = 0.035
) -> LagrangeState:
    """One ascent step towards satisfying E[cost] <= cost_limit."""

    def lam_loss(lam):
        return -lam * (mean_episode_cost - state.cost_limit)

    grads = jax.grad(lam_loss)(state.multiplier)
    updates, opt_state = _optimizer(lr).update(grads, state.opt_state, state.multiplier)
    new_mult = optax.apply_updates(state.multiplier, updates)
    new_mult = jnp.maximum(new_mult, 0.0)  # omnisafe projects after each step
    return LagrangeState(
        multiplier=new_mult,
        opt_state=opt_state,
        cost_limit=state.cost_limit,
        upper_bound=state.upper_bound,
    )
