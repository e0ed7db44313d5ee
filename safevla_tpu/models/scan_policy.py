"""Lowering policy for the depth-stacked layer scans.

The ViT stack, the tower decoder, and the fusion encoder keep their block
params as depth-stacked leaves inside ONE `nn.scan` module (vit.py,
llama_decoder.py, fusion.py). The stacked TREE is unconditional — it exists
for host-side dispatch marshaling, which scales with leaf count over the
axon device tunnel (PERFORMANCE.md "dispatch overhead").

The LOWERING is a separate choice, decided here per backend:

- **TPU: unrolled.** `nn.scan`'s rolled loop blocks cross-layer fusion and
  forces conservative buffer reuse in the update backward — measured on the
  v5e: bench 291 -> 331 fps median, update 8.1 s -> ~6.4 s just by unrolling
  the same stacked tree at trace time (2026-08-18 on-chip A/B).
- **CPU (tests, virtual meshes): rolled scan.** The unrolled program is
  12-24x more HLO; the rolled form compiles several-fold faster and CPU
  throughput is not the quantity under test.

`SAFEVLA_VIT_UNROLL` / `SAFEVLA_TOWER_UNROLL` override in both directions
("1" forces unroll, "0" forces the rolled scan, unset = platform default).
"""

from __future__ import annotations

import os

import jax


def _on_tpu() -> bool:
    # mirrors ops.flash_attention._on_tpu: honor an enclosing
    # jax.default_device(...) scope (host-side init runs on the CPU backend)
    dd = jax.config.jax_default_device
    platform = dd.platform if dd is not None else jax.default_backend()
    return platform not in ("cpu", "gpu")


def stack_unroll(depth: int, env_var: str) -> int:
    """Unroll factor for a depth-`depth` stacked layer scan."""
    flag = os.environ.get(env_var)
    if flag is None:
        return depth if _on_tpu() else 1
    return depth if flag == "1" else 1
