"""SPMD execution of traces and lens-optimization steps over a device mesh.

Two composable levels:

* :func:`sharded_trace_rays` — one trace whose pupil-sample axis is sharded
  across the ``rays`` mesh axis. The trace body is elementwise, so GSPMD
  partitions it with **zero** communication; only the loss reductions
  all-reduce (psum over ICI).
* :func:`make_sharded_train_step` — a full fwd+bwd+Adam update on a lens
  *population*, with systems sharded over ``lens`` and rays over ``rays``.
  This is the multi-chip training-step entry point the driver dry-runs.

Design note: we intentionally use ``jit`` + ``NamedSharding`` constraints
(GSPMD) rather than hand-written ``shard_map`` collectives — the workload's
only communication is reductions, which the partitioner places optimally on
ICI. A ``shard_map`` variant of the loss reduction is provided for
explicitness/verification (:func:`shard_map_mean_rms`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torchoptics_tpu.models.structure import Lens, Specs
from torchoptics_tpu.ops import pupil as pupil_mod
from torchoptics_tpu.ops import trace as trace_mod
from torchoptics_tpu.parallel import mesh as mesh_mod
from torchoptics_tpu import simulator as sim_mod


def sharded_trace_rays(specs: Specs, lens: Lens,
                       config: trace_mod.TraceConfig, mesh: Mesh,
                       key: Optional[jax.Array] = None,
                       aggregate: Tuple[str, ...] = ()
                       ) -> trace_mod.TraceResult:
    """Trace with the pupil axis sharded over the mesh's ``rays`` axis.

    The pupil coordinates are sampled on host, padded to a multiple of the
    ray-axis size, and device_put with a (lens, None, rays, None) sharding;
    the jitted trace then runs fully SPMD.
    """
    n_ray_dev = mesh.shape[mesh_mod.RAY_AXIS]
    xp, yp = pupil_mod.sample_pupil(config.mode, config.n_rays, len(lens),
                                    key=key)
    p = xp.shape[2]
    p_pad = mesh_mod.pad_to_multiple(p, n_ray_dev)
    if p_pad != p:
        pad = [(0, 0)] * xp.ndim
        pad[2] = (0, p_pad - p)
        # Padding rays sit at the pupil center (chief-ray clones): they trace
        # fine and are dropped after the trace.
        xp = jnp.pad(xp, pad)
        yp = jnp.pad(yp, pad)

    sharding = NamedSharding(mesh, P(None, None, mesh_mod.RAY_AXIS, None))
    xp = jax.device_put(xp, sharding)
    yp = jax.device_put(yp, sharding)

    traced = jax.jit(
        lambda s, l, x, y: trace_mod.trace_rays(
            s, l, config, xy=(x, y), aggregate=aggregate)
    )(specs, lens, xp, yp)

    if p_pad != p:
        traced = trace_mod.TraceResult(
            *[None if v is None else
              (dict((k, s[:, :, :, :p]) for k, s in v.items())
               if isinstance(v, dict) else v[:, :, :p])
              for v in traced])
    return traced


def shard_map_mean_rms(x: jnp.ndarray, y: jnp.ndarray, ray_ok: jnp.ndarray,
                       mesh: Mesh) -> jnp.ndarray:
    """Explicit shard_map + psum version of the spot-RMS reduction, for
    verifying the GSPMD-lowered path: each device reduces its ray shard, then
    all-reduces over the ``rays`` axis."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    B, F, Ptot, W = y.shape

    def local(xs, ys, oks):
        # Per-(field) partial sums over the local ray shard.
        ycent_part = jnp.sum(ys, axis=2)                      # (B, F, W)
        ycent = jax.lax.psum(ycent_part, mesh_mod.RAY_AXIS) / Ptot
        ymean = jnp.mean(ycent, axis=-1)                      # (B, F)
        dev2 = jnp.where(oks, (ys - ymean[:, :, None, None]) ** 2, 0.0)
        ss = jax.lax.psum(jnp.sum(dev2, axis=(2, 3)), mesh_mod.RAY_AXIS)
        rms_f = jnp.sqrt(ss / (Ptot * W))
        return jnp.mean(rms_f, axis=1)

    spec = P(None, None, mesh_mod.RAY_AXIS, None)
    return shard_map(local, mesh=mesh,
                     in_specs=(spec, spec, spec),
                     out_specs=P())(x, y, ray_ok)


def make_sharded_train_step(specs: Specs, config: sim_mod.SimulatorConfig,
                            mesh: Mesh, learning_rate: float = 1e-3,
                            trainable: Tuple[str, ...] = ("c", "t", "g"),
                            use_full_loss: bool = False,
                            add_bfl: bool = True,
                            qc_variables: bool = True):
    """Build ``(optimizer, init_fn, step_fn)`` for sharded lens-population
    optimization.

    The step IS the single-chip :class:`~torchoptics_tpu.optimize.LensOptimizer`
    step — same normalized trainable variables (``c``, ``t``, whitened glass
    ``g``, plus ``kappa``/``asph`` when the lens carries them), same
    quantized-continuous glass, same Adam update — jitted with the population
    parameters sharded over the mesh's ``lens`` axis. GSPMD partitions the
    trace (zero communication in the elementwise body) and all-reduces the
    loss/gradients over ICI. Multi-chip training is therefore *identical* to
    single-chip training up to reduction order.

    ``step_fn(state, key) -> (state, total_loss, loss_dict)``.
    """
    from torchoptics_tpu import optimize as opt_mod

    opt = opt_mod.LensOptimizer(
        specs, config, learning_rate=learning_rate, add_bfl=add_bfl,
        qc_variables=qc_variables, use_full_loss=use_full_loss,
        trainable=trainable)

    n_lens = mesh.shape[mesh_mod.LENS_AXIS]

    def place_leading(a):
        """Shard a pytree leaf's leading axis over 'lens' when it tiles the
        population evenly; replicate otherwise (scalars, catalogs, Adam
        counters)."""
        a = jnp.asarray(a)
        if a.ndim >= 1 and a.shape[0] % n_lens == 0 and a.shape[0] > 0:
            spec = P(mesh_mod.LENS_AXIS, *([None] * (a.ndim - 1)))
        else:
            spec = P(*([None] * a.ndim))
        return jax.device_put(a, NamedSharding(mesh, spec))

    def init_fn(lens: Lens):
        state = opt.init(lens)
        return jax.tree_util.tree_map(place_leading, state)

    step_fn = jax.jit(opt._step_impl)
    return opt, init_fn, step_fn
