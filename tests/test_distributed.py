"""Multi-host DCN bootstrap smoke test: two localhost processes rendezvous
through jax.distributed, form one global mesh, and run a cross-host psum —
the JAX equivalent of the reference's torch.distributed TCP rendezvous
(reference allenact_trainer.py:19-43, base.py:274-280)."""

import os
import socket
import subprocess
import sys

_CHILD = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")

from safevla_tpu.parallel.distributed import initialize_multihost, is_primary_host

info = initialize_multihost()
assert info["process_count"] == 2, info
assert info["global_devices"] == 2, info
assert is_primary_host() == (info["process_index"] == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

# every process contributes its local shard; the jitted sum with a
# replicated output forces XLA to insert the cross-host all-reduce
mesh = Mesh(np.array(jax.devices()), ("dp",))
local = np.full((1, 4), float(info["process_index"] + 1), np.float32)
g = multihost_utils.host_local_array_to_global_array(local, mesh, P("dp"))
s = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(g)
assert float(s) == 12.0, float(s)  # (1 + 2) * 4
print(f"psum-ok rank={info['process_index']}")
"""


def test_two_process_dcn_bootstrap_and_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env_base = {
        k: v for k, v in os.environ.items() if not k.startswith(("SAFEVLA_", "XLA_"))
    }
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env_base["SAFEVLA_COORDINATOR"] = f"127.0.0.1:{port}"
    env_base["SAFEVLA_NUM_PROCESSES"] = "2"

    procs = []
    for rank in range(2):
        env = dict(env_base, SAFEVLA_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"psum-ok rank={rank}" in out
