"""Multi-host bootstrap over DCN.

The reference scales across nodes with a TCP rendezvous + torch.distributed
(`distributed_ip_and_port`, `machine_id` — reference allenact_trainer.py:19-43,
base.py:274-280). The JAX equivalent is a one-call bootstrap: every host runs
the same program, `jax.distributed.initialize` wires the DCN mesh, and the
existing `("dp", "mdl")` sharding annotations span all hosts' devices — the
learner step's gradient psum rides ICI within a slice and DCN across slices
with no further code changes.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Bootstrap jax.distributed from args or standard env vars.

    Env fallbacks: SAFEVLA_COORDINATOR (host:port), SAFEVLA_NUM_PROCESSES,
    SAFEVLA_PROCESS_ID — or the TPU metadata auto-detection when on Cloud TPU
    (no args needed there).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("SAFEVLA_COORDINATOR")
    if num_processes is None and "SAFEVLA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SAFEVLA_NUM_PROCESSES"])
    if process_id is None and "SAFEVLA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SAFEVLA_PROCESS_ID"])

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # Cloud TPU pods auto-detect from the metadata server
        jax.distributed.initialize()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0
