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


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_procs(worker_src, n, port, extra_env=None, args=(), timeout=900):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    if extra_env:
        env.update(extra_env)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker_src, str(pid), str(port), *args],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(n)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {i} rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
    return outs


@pytest.mark.slow
def test_two_process_dcn_smoke():
    outs = _run_procs(_WORKER, 2, _free_port(), timeout=300)
    for i, (_, out, _) in enumerate(outs):
        assert f"proc {i}: DCN OK" in out


# -- Cross-process train-step parity (VERDICT r3 #4) -------------------------
#
# The real claim of SURVEY §2.8 is that `make_sharded_train_step` over a
# global (multi-host) mesh IS the single-process optimization. Two CPU
# processes x 4 virtual devices each stand in for two hosts: the worker runs
# the full fwd+bwd+Adam step on a global ('lens'=2, 'rays'=4) mesh spanning
# both processes and writes the resulting parameters; the parent runs the
# identical step on its own single-process 8-device mesh and asserts
# parameter-for-parameter parity (differences bounded by reduction order).

_TRAIN_WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; outfile = sys.argv[3]

from torchoptics_tpu.parallel import mesh as mesh_mod
mesh_mod.init_distributed(f"localhost:{port}", num_processes=2,
                          process_id=pid)
assert len(jax.devices()) == 8, jax.devices()
assert jax.local_device_count() == 4

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tests.test_distributed import _train_parity_setup
from torchoptics_tpu.parallel import shard as shard_mod

specs, lens, config, n_steps = _train_parity_setup()
mesh = mesh_mod.make_mesh(lens_parallel=2)   # spans both processes
_, init_fn, step_fn = shard_mod.make_sharded_train_step(
    specs, config, mesh, learning_rate=1e-3)
state = init_fn(lens)
for _ in range(n_steps):
    state, total, _ = step_fn(state, None)

# Replicate the globally-sharded parameter tables so every process holds
# the full values, then fetch.
rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
params = {k: np.asarray(jax.device_get(rep(v)))
          for k, v in state.params.items()}
params["total"] = np.asarray(float(total))
if pid == 0:
    np.savez(outfile, **params)
print(f"proc {pid}: TRAIN OK", flush=True)
"""


def _train_parity_setup():
    """Shared between the DCN worker and the in-process single-host run:
    identical population, config, and step count."""
    from torchoptics_tpu import simulator as sim
    from tests.test_sharding import _tiled_population

    specs, lens = _tiled_population("cooke", n_pop=4, perturb=0.02)
    # scan engine: the XLA:CPU SPMD partitioner pathologically blows up on
    # the unrolled fwd+bwd trace (see tests/test_sharding.py).
    config = sim.SimulatorConfig(
        n_sampled_fields=2, n_pupil_rings=3, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(459.0, 640.0),
        trace_engine="scan")
    return specs, lens, config, 3


@pytest.mark.slow
def test_cross_process_train_step_matches_single_process(tmp_path):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    import numpy as np
    from torchoptics_tpu.parallel import mesh as mesh_mod
    from torchoptics_tpu.parallel import shard as shard_mod

    outfile = str(tmp_path / "dcn_params.npz")
    outs = _run_procs(
        _TRAIN_WORKER, 2, _free_port(), args=(outfile,),
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
    for i, (_, out, _) in enumerate(outs):
        assert f"proc {i}: TRAIN OK" in out

    specs, lens, config, n_steps = _train_parity_setup()
    mesh = mesh_mod.make_mesh(lens_parallel=2)  # single-process, 8 devices
    _, init_fn, step_fn = shard_mod.make_sharded_train_step(
        specs, config, mesh, learning_rate=1e-3)
    state = init_fn(lens)
    for _ in range(n_steps):
        state, total, _ = step_fn(state, None)

    got = np.load(outfile)
    np.testing.assert_allclose(float(got["total"]), float(total), rtol=1e-5)
    for k in state.params:
        np.testing.assert_allclose(
            got[k], np.asarray(state.params[k]),
            rtol=1e-4, atol=1e-6, err_msg=k)
