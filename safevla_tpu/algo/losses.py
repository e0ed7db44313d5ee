"""Constrained-PPO loss functions as pure JAX.

Numerics match the reference losses in training/online/loss/customized_loss.py:
  * `safe_ppo_surrogate_loss`  <- SafePPOLogGrad.loss_per_step (l.317-414):
    clipped surrogate on the Lagrangian-penalized advantage
    (A - lambda * A_cost) / (1 + lambda), entropy bonus, value MSE.
  * `ppo_surrogate_loss`       <- PPOLogGrad (l.163-298), the lambda == 0 path.
  * `value_loss`               <- PPOValue / SafePPOValue & the StopGrad
    variants (plain or clipped value MSE).
  * `imitation_bce_loss`       <- Imitation (l.17-83): BCE of one action logit
    against an expert binary signal.

All functions take explicit arrays and return (scalar_loss, metrics_dict); the
learner composes them inside one jitted update.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def categorical_log_prob(logits: jax.Array, actions: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]


def categorical_entropy(logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def clipped_surrogate(
    log_probs: jax.Array,
    old_log_probs: jax.Array,
    advantage: jax.Array,
    clip_param: jax.Array,
) -> jax.Array:
    """Per-step pessimistic clipped surrogate: -min(r*A, clip(r)*A)."""
    ratio = jnp.exp(log_probs - old_log_probs)
    clamped = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param)
    surr1 = ratio * advantage
    surr2 = clamped * advantage
    return -jnp.minimum(surr1, surr2)


def value_loss(
    values: jax.Array,
    returns: jax.Array,
    old_values: Optional[jax.Array] = None,
    clip_param: float = 0.1,
    use_clipped: bool = False,
) -> jax.Array:
    """0.5 * MSE (optionally pessimistically clipped around old values)."""
    if use_clipped and old_values is not None:
        clipped = old_values + jnp.clip(values - old_values, -clip_param, clip_param)
        return 0.5 * jnp.mean(
            jnp.maximum((values - returns) ** 2, (clipped - returns) ** 2)
        )
    return 0.5 * jnp.mean((returns - values) ** 2)


def ppo_surrogate_loss(
    logits: jax.Array,
    values: jax.Array,
    actions: jax.Array,
    old_log_probs: jax.Array,
    advantages: jax.Array,
    returns: jax.Array,
    old_values: jax.Array,
    clip_param: float = 0.1,
    value_loss_coef: float = 0.5,
    entropy_coef: float = 0.0,
    use_clipped_value_loss: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    log_probs = categorical_log_prob(logits, actions)
    action_loss = jnp.mean(
        clipped_surrogate(log_probs, old_log_probs, advantages, clip_param)
    )
    entropy = jnp.mean(categorical_entropy(logits))
    v_loss = value_loss(values, returns, old_values, clip_param, use_clipped_value_loss)
    total = action_loss + value_loss_coef * v_loss - entropy_coef * entropy
    return total, {
        "action": action_loss,
        "value": v_loss,
        "entropy": entropy,
        "ppo_total": total,
    }


def safe_ppo_surrogate_loss(
    logits: jax.Array,
    values: jax.Array,
    actions: jax.Array,
    old_log_probs: jax.Array,
    advantages: jax.Array,
    c_advantages: jax.Array,
    returns: jax.Array,
    old_values: jax.Array,
    lagrange_multiplier: jax.Array,
    clip_param: float = 0.1,
    value_loss_coef: float = 0.5,
    entropy_coef: float = 0.0,
    use_clipped_value_loss: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """PPO-Lagrangian surrogate (reference customized_loss.py:348-362)."""
    penalty = jax.lax.stop_gradient(lagrange_multiplier)
    penalized_adv = (advantages - penalty * c_advantages) / (1.0 + penalty)
    log_probs = categorical_log_prob(logits, actions)
    action_loss = jnp.mean(
        clipped_surrogate(log_probs, old_log_probs, penalized_adv, clip_param)
    )
    entropy = jnp.mean(categorical_entropy(logits))
    v_loss = value_loss(values, returns, old_values, clip_param, use_clipped_value_loss)
    total = action_loss + value_loss_coef * v_loss - entropy_coef * entropy
    return total, {
        "action": action_loss,
        "value": v_loss,
        "entropy": entropy,
        "penalty": penalty,
        "ppo_total": total,
    }


def imitation_bce_loss(
    logits: jax.Array, expert_signal: jax.Array, action_idx: int = 8
) -> jax.Array:
    """BCE of the pickup-action logit vs a binary expert signal
    (reference customized_loss.py:63-69)."""
    x = logits[..., action_idx]
    # numerically-stable binary cross entropy with logits
    return jnp.mean(jnp.maximum(x, 0) - x * expert_signal + jnp.log1p(jnp.exp(-jnp.abs(x))))
