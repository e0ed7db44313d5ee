"""Attention-mask construction for packed rollouts and incremental decode.

The reference packs multiple episodes back-to-back in each sampler's rollout
and restricts attention to within-episode causal windows:
  * update path (seqlen > 1): tril of traj_idx[i] == traj_idx[j]
    (reference: allenact_dino_transformer.py:398-402)
  * rollout path (seqlen == 1): attend from the episode-start cache position
    to the current position (reference: allenact_dino_transformer.py:388-397)

Both are built here as boolean masks (True = attend) with static shapes so the
jitted graphs never recompile on episode boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def packed_block_causal_mask(traj_idx: jax.Array) -> jax.Array:
    """traj_idx (B, T) int -> (B, 1, T, T) bool, True where attention allowed.

    mask[b, 0, i, j] = (traj_idx[b,i] == traj_idx[b,j]) and j <= i.
    """
    same = traj_idx[:, :, None] == traj_idx[:, None, :]
    t = traj_idx.shape[-1]
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    return (same & causal)[:, None]


def incremental_episode_mask(
    time_step: jax.Array, cache_pos: jax.Array, max_len: int
) -> jax.Array:
    """Single-token decode mask over the KV cache.

    time_step: (B,) steps taken so far in the *current episode* (0 on reset).
    cache_pos: (B,) or scalar; write position of the current token in the cache.
    Returns (B, 1, 1, max_len) bool: attend to cache slots
    [cache_pos - time_step, cache_pos], i.e. only the current episode's window.
    """
    cache_pos = jnp.broadcast_to(cache_pos, time_step.shape)
    epi_start = jnp.maximum(cache_pos - time_step, 0)
    slots = jnp.arange(max_len)
    ok = (slots[None, :] >= epi_start[:, None]) & (slots[None, :] <= cache_pos[:, None])
    return ok[:, None, None, :]


def additive(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool mask -> additive bias (0 where allowed, large negative elsewhere)."""
    return jnp.where(mask, jnp.array(0.0, dtype), jnp.array(-1e9, dtype))
