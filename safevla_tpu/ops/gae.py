"""Generalized Advantage Estimation as a jittable scan.

Replaces the reference engine's Python-loop GAE (computed inside the forked
AllenAct rollout storage; configured with gamma=0.99, lambda=0.95 at
reference training/online/dinov2_vits_tsfm_base.py:345-347) with a reverse
`lax.scan` over time. The safe-RL variant computes reward- and cost-advantages
in one fused scan so both GAE passes ride a single pass over HBM.

Mask convention (allenact/ikostrikov storage layout):
  rewards:  (T, B)   reward received after step t
  values:   (T+1, B) value predictions incl. bootstrap value at T
  masks:    (T+1, B) masks[t] == 0 iff a new episode begins at step t
                     (so masks[t+1] == 0 cuts the return after step t)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gae_advantages(
    rewards: jax.Array,
    values: jax.Array,
    masks: jax.Array,
    gamma: float,
    gae_lambda: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns (advantages, returns), each (T, B)."""
    adv, ret = dual_gae(rewards[None], values[None], masks, gamma, gae_lambda)
    return adv[0], ret[0]


def dual_gae(
    rewards_stack: jax.Array,
    values_stack: jax.Array,
    masks: jax.Array,
    gamma: float,
    gae_lambda: float,
) -> tuple[jax.Array, jax.Array]:
    """GAE over K parallel signals sharing one mask (K=2 for reward+cost).

    rewards_stack: (K, T, B), values_stack: (K, T+1, B), masks: (T+1, B).
    Returns (advantages, returns) each (K, T, B).
    """
    k, t, b = rewards_stack.shape
    next_values = values_stack[:, 1:]  # (K, T, B)
    cur_values = values_stack[:, :-1]  # (K, T, B)
    next_masks = masks[1:]  # (T, B)

    deltas = rewards_stack + gamma * next_values * next_masks[None] - cur_values

    def step(carry, xs):
        delta_t, mask_t1 = xs  # (K, B), (B,)
        gae = delta_t + gamma * gae_lambda * mask_t1[None] * carry
        return gae, gae

    # scan backwards over time
    xs = (jnp.flip(deltas, axis=1).swapaxes(0, 1), jnp.flip(next_masks, axis=0))
    _, adv_rev = jax.lax.scan(step, jnp.zeros((k, b), deltas.dtype), xs)
    advantages = jnp.flip(adv_rev.swapaxes(0, 1), axis=1)  # (K, T, B)
    returns = advantages + cur_values
    return advantages, returns
