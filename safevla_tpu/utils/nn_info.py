"""Model introspection (reference utils/nn_utils.py: debug_model_info)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def param_count(tree: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def param_breakdown(params: Dict[str, Any]) -> Dict[str, int]:
    """Top-level subtree parameter counts."""
    return {k: param_count(v) for k, v in params.items()}


def debug_model_info(params: Dict[str, Any], print_fn=print) -> Dict[str, int]:
    info = param_breakdown(params)
    total = sum(info.values())
    for k, v in sorted(info.items()):
        print_fn(f"  {k:24s} {v / 1e6:8.2f}M params")
    print_fn(f"  {'total':24s} {total / 1e6:8.2f}M params")
    return info
