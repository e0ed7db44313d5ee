"""Device-mesh construction and sharding rules.

The reference scales its learner with one torch/NCCL process per GPU plus a
TCP rendezvous (reference: training/online/base.py:236-282,
allenact_trainer.py:19-43). Here scaling is declarative: one jitted learner
step, with the sampler/batch axis sharded over a ("dp", "mdl") mesh; XLA
inserts the gradient all-reduce over ICI. Multi-host runs bootstrap with
`jax.distributed.initialize()` and use the same code path.

The "mdl" axis is kept (size 1 for the ~30M-param policy) so tensor-parallel
sharding can be enabled without restructuring.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mdl: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp == -1:
        dp = len(devices) // mdl
    assert dp * mdl <= len(devices), f"need {dp * mdl} devices, have {len(devices)}"
    grid = np.array(devices[: dp * mdl]).reshape(dp, mdl)
    return Mesh(grid, ("dp", "mdl"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (sampler/batch) axis split over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in the pytree with its leading axis over dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
