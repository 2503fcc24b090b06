"""Multi-host (DCN) smoke test: actually execute
``parallel.mesh.init_distributed`` across two processes.

The reference has no distributed story at all (SURVEY §2.8); ours is
``jax.distributed.initialize`` + a global mesh. Real multi-host TPU slices
are not available here, so two CPU processes stand in: the coordination
service, global device view, and a cross-process collective (gloo-backed
AllReduce) all run for real.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]

from torchoptics_tpu.parallel import mesh as mesh_mod
mesh_mod.init_distributed(f"localhost:{port}", num_processes=2,
                          process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2 * jax.local_device_count()

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

# Cross-process collective #1: allgather of per-process payloads.
got = multihost_utils.process_allgather(jnp.asarray([pid + 1.0]))
assert sorted(np.asarray(got).reshape(-1).tolist()) == [1.0, 2.0], got

# Cross-process collective #2: a global-mesh reduction, the only
# communication pattern this workload's DCN story needs (loss psum).
mesh = mesh_mod.make_mesh()  # ('lens', 'rays') over the 2 global devices
sharding = NamedSharding(mesh, P(mesh_mod.RAY_AXIS))
local = np.full((4 * jax.local_device_count(),), pid + 1.0, np.float32)
garr = jax.make_array_from_process_local_data(sharding, local)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
# 4 entries per local device per process, values 1.0 (proc 0) + 2.0 (proc 1).
assert float(total) == 12.0 * jax.local_device_count(), float(total)
print(f"proc {pid}: DCN OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_dcn_smoke():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {i} rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert f"proc {i}: DCN OK" in out
