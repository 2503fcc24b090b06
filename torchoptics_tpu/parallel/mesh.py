"""Device-mesh construction and sharding helpers.

The reference is single-device (`SURVEY.md` §2.8: no collectives, no process
groups anywhere). The TPU-native distributed story for this workload is pure
data parallelism over the two embarrassingly parallel axes:

* ``lens``  — systems in a batched design population (BASELINE config 4/5);
* ``rays``  — pupil samples within one trace.

Lens parameters are tiny (≤ a few hundred floats) and are replicated; the
(B, F, P, W) ray block is sharded; the only cross-chip traffic the workload
ever needs is the loss/metric reductions, which GSPMD lowers to ``psum`` over
ICI. Multi-host extends the same ``Mesh`` over DCN via
``jax.distributed.initialize`` — no other backend is required.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


LENS_AXIS = "lens"
RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              lens_parallel: int = 1) -> Mesh:
    """Build a 2-D ('lens', 'rays') mesh over the given devices.

    ``lens_parallel`` devices shard the system batch; the rest shard rays.
    With the default (1), all devices shard the ray block — the right layout
    for single-design optimization, where rays are the only large axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % lens_parallel == 0, (
        f"{n} devices not divisible by lens_parallel={lens_parallel}")
    grid = np.asarray(devices).reshape(lens_parallel, n // lens_parallel)
    return Mesh(grid, (LENS_AXIS, RAY_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """(B, F, P, W) ray blocks: systems over 'lens', pupil rays over 'rays'."""
    return NamedSharding(mesh, P(LENS_AXIS, None, RAY_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def lens_sharding(mesh: Mesh) -> NamedSharding:
    """(B, S) lens parameter tables: systems over 'lens', replicated in S."""
    return NamedSharding(mesh, P(LENS_AXIS, None))


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (DCN data parallelism across slices).

    Thin wrapper over ``jax.distributed.initialize``; after it returns,
    ``jax.devices()`` spans all hosts and :func:`make_mesh` builds a global
    mesh whose ``lens`` axis can cross slice boundaries (parameter traffic is
    negligible — lens tables are tiny) while ``rays`` stays within a slice on
    ICI. No other communication backend is needed for this workload
    (SURVEY §2.8/§5)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
