"""HL-Gauss distributional critic transform.

Functional JAX counterpart of the reference's torch HLGaussLoss
(reference: utils/loss_functions.py:7-30): a scalar target is smeared into a
truncated-Gaussian histogram over fixed bins; the critic is trained with
cross-entropy against that histogram and read out as the probability-weighted
mean of bin centers.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class HLGauss:
    min_value: float = -5.0
    max_value: float = 15.0
    num_bins: int = 101
    sigma: float = 0.15

    @property
    def support(self) -> jax.Array:
        return jnp.linspace(
            self.min_value, self.max_value, self.num_bins + 1, dtype=jnp.float32
        )

    @property
    def centers(self) -> jax.Array:
        s = self.support
        return (s[:-1] + s[1:]) / 2.0

    def to_probs(self, target: jax.Array) -> jax.Array:
        """target (...,) -> probs (..., num_bins)."""
        cdf = jax.scipy.special.erf(
            (self.support - target[..., None]) / (jnp.sqrt(2.0) * self.sigma)
        )
        z = cdf[..., -1] - cdf[..., 0]
        bin_probs = cdf[..., 1:] - cdf[..., :-1]
        return bin_probs / z[..., None]

    def from_probs(self, probs: jax.Array) -> jax.Array:
        """probs (..., num_bins) -> scalar value (...,)."""
        return jnp.sum(probs * self.centers, axis=-1)

    def from_logits(self, logits: jax.Array) -> jax.Array:
        return self.from_probs(jax.nn.softmax(logits, axis=-1))

    def loss(self, logits: jax.Array, target: jax.Array) -> jax.Array:
        """Mean cross-entropy between logits and the smeared target histogram."""
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(self.to_probs(target) * logp, axis=-1))
