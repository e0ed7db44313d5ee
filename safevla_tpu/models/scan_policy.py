"""Lowering policy for the depth-stacked layer scans.

The ViT stack, the tower decoder, and the fusion encoder keep their block
params as depth-stacked leaves inside ONE `nn.scan` module (vit.py,
llama_decoder.py, fusion.py). The stacked TREE is unconditional — it exists
for host-side dispatch marshaling, which scales with leaf count over the
axon device tunnel (PERFORMANCE.md "dispatch overhead").

The LOWERING is a separate choice. `nn.scan`'s `unroll` is purely a
lowering hint — the param tree comes from `variable_axes` stacking and is
identical either way — so the choice can differ per backend AND per traced
program:

- **TPU update path: unrolled.** `nn.scan`'s rolled loop blocks cross-layer
  fusion and forces conservative buffer reuse in the update backward —
  measured on the v5e: bench 291.4 -> 331.1 fps median, update
  8.06 s -> ~6.0 s just by unrolling the same stacked tree at trace time
  (2026-08-18 on-chip A/B; PERFORMANCE.md round-3 tail table).
- **TPU act path: unrolled (r5 correction).** The r4 default rolled the
  act-site scans on an EXTRAPOLATED ~58 s compile (the r3-era rolled act
  program). Measured same-day in r5, the CURRENT act program cold-compiles
  in 74.6 s unrolled vs 672.2 s rolled — a 9x compile-time pathology in
  the while-loop lowering of today's act body (KV-cache
  dynamic-update-slices + pallas attention inside the rolled loop), the
  opposite of the rationale. Act-site programs therefore follow the
  platform default (TPU: unrolled); `SAFEVLA_ACT_UNROLL=0`/`=k` remain for
  topologies where rolled wins. Throughput ties either way
  (PERFORMANCE.md r4 hybrid study; r5 re-confirmed the headline under
  unrolled act).
- **param init: rolled.** Once-per-process, compile-dominated; the rolled
  init lowers several-fold faster with an identical param tree
  (`trace_site("init")`).
- **CPU (tests, virtual meshes): rolled scan.** The unrolled program is
  12-24x more HLO; the rolled form compiles several-fold faster and CPU
  throughput is not the quantity under test.

Overrides, most specific wins ("1" forces unroll, "0" forces the rolled
scan, unset = default above): `SAFEVLA_ACT_UNROLL` (act-site programs),
`SAFEVLA_INIT_UNROLL` (init-site), then `SAFEVLA_VIT_UNROLL` /
`SAFEVLA_TOWER_UNROLL` (per-module, any site).
"""

from __future__ import annotations

import contextlib
import contextvars
import os
import warnings

from safevla_tpu.utils.platform import on_tpu

_TRACE_SITE: contextvars.ContextVar = contextvars.ContextVar(
    "safevla_trace_site", default=None
)


@contextlib.contextmanager
def trace_site(name: str):
    """Label the enclosed trace so stack_unroll can pick a per-site lowering.

    Wrap the BODY of a function handed to jax.jit (tracing executes the
    Python body, so the label is live exactly while the program is traced,
    regardless of whether tracing happens at first call or via .lower()).
    """
    token = _TRACE_SITE.set(name)
    try:
        yield
    finally:
        _TRACE_SITE.reset(token)


def current_trace_site():
    return _TRACE_SITE.get()


def _flag(env_var: str):
    """Read an unroll override: "0" = rolled, "1" = fully unrolled, an int
    k >= 2 = partial unroll (k scan iterations per loop body — compile cost
    grows ~k-fold over rolled, loop overhead drops ~k-fold). Warn and ignore
    anything else."""
    val = os.environ.get(env_var)
    if val is None or val == "":
        return None
    if val == "0":
        return 1
    if val == "1":
        return "full"
    try:
        k = int(val)
        if k >= 2:
            return k
    except ValueError:
        pass
    warnings.warn(
        f"{env_var}={val!r} is not '0', '1', or an int >= 2; "
        "using the default lowering",
        stacklevel=3,
    )
    return None


def _resolve(depth: int, forced) -> int:
    return depth if forced == "full" else min(int(forced), depth)


def stack_unroll(depth: int, env_var: str) -> int:
    """Unroll factor for a depth-`depth` stacked layer scan.

    Precedence: site override env (SAFEVLA_ACT_UNROLL / SAFEVLA_INIT_UNROLL,
    only inside the matching trace_site) > per-module env (`env_var`) >
    site default (init: rolled; act: platform default since r5 — rolled
    act measured 672 s cold vs 75 s unrolled, see module docstring) >
    platform default (TPU: unrolled, CPU: rolled).
    """
    site = _TRACE_SITE.get()
    if site in ("act", "init"):
        forced = _flag("SAFEVLA_ACT_UNROLL" if site == "act" else "SAFEVLA_INIT_UNROLL")
        if forced is not None:
            return _resolve(depth, forced)
    module_forced = _flag(env_var)
    if module_forced is not None:
        return _resolve(depth, module_forced)
    if site == "init":
        return 1  # once-per-process, compile-dominated: rolled
    return depth if on_tpu() else 1
