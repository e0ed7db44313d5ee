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
    """Write `state` under `path/step_<step>`.

    On a multi-host run only process 0 writes (the state is replicated; every
    host racing on a shared filesystem corrupts the Orbax directory). Set
    SAFEVLA_SAVE_ON_ALL_HOSTS=1 for hosts with private disks — the
    counterpart of the reference's `save_ckpt_at_every_host` flag
    (reference allenact_trainer.py:57,70).
    """
    path = os.path.abspath(path)
    ckpt_dir = os.path.join(path, f"step_{step}")
    if jax.process_count() > 1 and not os.environ.get("SAFEVLA_SAVE_ON_ALL_HOSTS"):
        if jax.process_index() != 0:
            return ckpt_dir
        # materialize to host numpy first: train states are replicated, so
        # host 0 holds every value; an uncoordinated save of device arrays
        # would instead enter Orbax's all-host protocol and deadlock
        import numpy as np

        state = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state
        )
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
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


def restore_policy_params(ckpt_dir: str, init_params: dict) -> dict:
    """Restore inference-ready policy params from any NATIVE Orbax layout.

    The framework's own checkpoints come in two tree shapes: trainer states
    (online `TrainState` / offline `BCTrainState`: `tower_params` +
    `frozen_params={"vit","t5"}` + opt_state/...) and bare params trees
    (`{"towers": ..., "vit": ..., "t5": ...}` or just `{"towers": ...}`).
    This mirrors the reference's multi-format checkpoint auto-detection for
    its torch files (reference inference_agent.py:127-166) for the native
    format: restore raw (no target — layouts differ), pick whichever policy
    subtrees the checkpoint carries, and fall back to `init_params` for the
    rest. Frozen vit/t5 are taken from the checkpoint when present so
    evaluation runs the EXACT backbone training used, not a re-init.

    `ckpt_dir` may also be a run output directory containing `step_<N>`
    children; the latest step is used.
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        raise FileNotFoundError(ckpt_dir)
    # accept a trainer output dir: descend to the newest step_<N>
    if not os.path.basename(ckpt_dir).startswith("step_"):
        latest = latest_checkpoint(ckpt_dir)
        if latest is not None:
            ckpt_dir = latest
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(ckpt_dir)

    out = dict(init_params)
    picked = {}
    if isinstance(raw, dict) and "tower_params" in raw:  # trainer state
        picked["towers"] = raw["tower_params"]
        frozen = raw.get("frozen_params") or {}
        for k in ("vit", "t5"):
            if isinstance(frozen, dict) and frozen.get(k) is not None:
                picked[k] = frozen[k]
    elif isinstance(raw, dict) and "towers" in raw:  # bare params tree
        for k in ("towers", "vit", "t5"):
            if raw.get(k) is not None:
                picked[k] = raw[k]
    else:
        keys = sorted(raw.keys()) if isinstance(raw, dict) else type(raw).__name__
        raise ValueError(
            f"{ckpt_dir} is not a recognized safevla checkpoint: expected a "
            f"trainer state ('tower_params') or a params tree ('towers'); "
            f"found {keys}. Torch-format files go through models/convert."
        )
    for k, tree in picked.items():
        got = jax.tree_util.tree_structure(tree)
        want = jax.tree_util.tree_structure(init_params[k])
        if got != want:
            raise ValueError(
                f"checkpoint subtree {k!r} does not match the current model "
                f"({got.num_leaves} vs {want.num_leaves} leaves) — param "
                "layout drift; re-import or migrate the checkpoint"
            )
        out[k] = tree
    return out


def resolve_checkpoint_path(path: str, download_dir: str = "ckpts") -> str:
    """Resolve a checkpoint reference to a local path.

    Local paths pass through. `wandb://entity/project/artifact:alias` fetches
    the artifact and returns the directory (the reference fetches run
    checkpoints the same way — allenact_dino_transformer.py:299-324,
    train_pl.py:423-431). Requires the wandb package and network access.
    """
    if not path.startswith("wandb://"):
        return path
    try:
        import wandb
    except ImportError as e:  # pragma: no cover - env without wandb
        raise RuntimeError(
            f"checkpoint {path!r} is a wandb artifact but the wandb package "
            "is not installed; download it manually or install wandb"
        ) from e
    artifact_ref = path[len("wandb://"):]
    api = wandb.Api()
    artifact = api.artifact(artifact_ref)
    os.makedirs(download_dir, exist_ok=True)
    return artifact.download(download_dir)
