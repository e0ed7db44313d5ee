"""Checkpoint save/restore: one Orbax format + torch-format importers.

The reference juggles three torch formats with ad-hoc key remapping shims
(Lightning `.ckpt`, AllenAct `.pt` with `model_state_dict`, raw state dicts;
reference SURVEY §3.5 / inference_agent.py:127-166). Here there is ONE native
format (Orbax, a directory per step) plus importers for the reference formats
(safevla_tpu.models.convert) so published SafeVLA checkpoints remain loadable.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.join(path, f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state, force=True)
    return ckpt_dir


def latest_checkpoint(path: str) -> Optional[str]:
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(path, max(steps)[1])


def restore_checkpoint(ckpt_dir: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(ckpt_dir), target)
