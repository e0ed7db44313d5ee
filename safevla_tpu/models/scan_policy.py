"""Lowering policy for the depth-stacked layer scans.

The ViT stack, the tower decoder, and the fusion encoder keep their block
params as depth-stacked leaves inside ONE `nn.scan` module (vit.py,
llama_decoder.py, fusion.py). The stacked TREE is unconditional — it exists
for host-side dispatch marshaling, which scales with leaf count over the
axon device tunnel (PERFORMANCE.md "dispatch overhead").

The LOWERING is a separate choice, decided here per backend:

- **TPU: unrolled.** `nn.scan`'s rolled loop blocks cross-layer fusion and
  forces conservative buffer reuse in the update backward — measured on the
  v5e: bench 291.4 -> 331.1 fps median, update 8.06 s -> ~6.0 s just by
  unrolling the same stacked tree at trace time (2026-08-18 on-chip A/B;
  PERFORMANCE.md round-3 tail table).
- **CPU (tests, virtual meshes): rolled scan.** The unrolled program is
  12-24x more HLO; the rolled form compiles several-fold faster and CPU
  throughput is not the quantity under test.

`SAFEVLA_VIT_UNROLL` / `SAFEVLA_TOWER_UNROLL` override in both directions
("1" forces unroll, "0" forces the rolled scan, unset = platform default).
"""

from __future__ import annotations

import os
import warnings

from safevla_tpu.utils.platform import on_tpu


def stack_unroll(depth: int, env_var: str) -> int:
    """Unroll factor for a depth-`depth` stacked layer scan.

    Only "0" / "1" are accepted override values; anything else (a typo, or
    "true") warns and falls back to the platform default instead of silently
    forcing the rolled scan (~10% fps regression on TPU).
    """
    flag = os.environ.get(env_var)
    if flag is None or flag == "":
        return depth if on_tpu() else 1
    if flag not in ("0", "1"):
        warnings.warn(
            f"{env_var}={flag!r} is not '0' or '1'; using the platform default",
            stacklevel=2,
        )
        return depth if on_tpu() else 1
    return depth if flag == "1" else 1
