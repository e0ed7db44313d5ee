"""Shared norm modules for the encoder stacks.

`CompatLayerNorm` is a drop-in for the `nn.LayerNorm(dtype=f32)` +
`.astype(out_dtype)` pattern used across fusion/ViT: identical param
structure (scale, bias; f32 — importers in models/convert.py unaffected),
identical f32 statistics math, with an optional pallas row-kernel lowering
(ops/layer_norm.py) that pins row-major layouts at both LN boundaries of
the attention->LN->matmul chain.

`SAFEVLA_PALLAS_LN=1` opts into the kernel. MEASURED DEAD END at the
update's chunk shape (PERFORMANCE.md round 4): fwd 12.18 -> 12.55 ms,
fwd+bwd 34.80 -> 37.09 ms — forcing row-major at the LN boundaries makes
XLA transpose explicitly for the wgrad contractions instead, costing more
than the transposes it hides today. Default OFF; kept for other topologies.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from safevla_tpu.ops.layer_norm import layer_norm
from safevla_tpu.utils.platform import on_tpu


def _pallas_ln_default() -> bool:
    return os.environ.get("SAFEVLA_PALLAS_LN", "0") == "1"


class CompatLayerNorm(nn.Module):
    """LayerNorm with f32 stats/params and `out_dtype` output.

    Equivalent to `nn.LayerNorm(dtype=jnp.float32)(x).astype(out_dtype)` —
    same fast-variance stats (E[x^2]-E[x]^2, zero-clamped) and multiply
    ordering as flax. out_dtype=None keeps f32 (flax dtype=f32 behavior).
    """

    epsilon: float = 1e-6
    out_dtype: Optional[Any] = None
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        od = self.out_dtype or jnp.float32
        if (
            _pallas_ln_default()
            and (on_tpu() or self.interpret)
            and D % 128 == 0
        ):
            return layer_norm(
                x, scale, bias, self.epsilon, out_dtype=od, interpret=self.interpret
            )
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        y = (xf - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        return y.astype(od)
