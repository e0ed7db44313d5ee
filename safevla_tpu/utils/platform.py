"""Backend detection shared by kernel/lowering dispatch sites.

Single source of truth for "are we executing on a TPU-like backend?" —
previously duplicated in ops/flash_attention.py and models/scan_policy.py
(ADVICE r3: the two copies could drift).
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when ops dispatch to a TPU-like backend.

    Honors an enclosing `jax.default_device(...)` scope (e.g. host-side param
    init runs on the CPU backend even though the process default is the tpu
    plugin — pallas kernels cannot lower there). `jax_default_device` may hold
    a Device or a platform string; normalize both.
    """
    dd = jax.config.jax_default_device
    if dd is None:
        platform = jax.default_backend()
    elif isinstance(dd, str):
        platform = dd
    else:
        platform = dd.platform
    return platform not in ("cpu", "gpu")
