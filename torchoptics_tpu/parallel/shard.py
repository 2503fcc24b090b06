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

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torchoptics_tpu.models.structure import Lens, Specs
from torchoptics_tpu.ops import metrics as metrics_mod
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
                            mesh: Mesh, learning_rate: float = 1e-3):
    """Build (init_fn, step_fn) for sharded lens-population optimization.

    ``step_fn(params_pytree, opt_state, key)`` computes the unsupervised loss
    summed over the population and applies one Adam update; lens parameter
    tables are sharded over ``lens`` (population data parallelism), the
    traced ray block over ``rays``.
    """
    import optax
    optimizer = optax.adam(learning_rate)
    lens_shard = mesh_mod.lens_sharding(mesh)

    def place(lens: Lens) -> Lens:
        put = lambda a: None if a is None else jax.device_put(a, lens_shard)
        return Lens(lens.structure, put(lens.c), put(lens.t), put(lens.nd),
                    put(lens.v),
                    kappa=put(lens.kappa),
                    asph=None if lens.asph is None else jax.device_put(
                        lens.asph, NamedSharding(
                            mesh, P(mesh_mod.LENS_AXIS, None, None))))

    def init_fn(lens: Lens):
        lens = place(lens)
        params = {"c": lens.c, "t": lens.t}
        return lens, params, optimizer.init(params)

    def loss_fn(params, lens: Lens, key):
        lens = lens.replace(c=params["c"], t=params["t"])
        cfg = config.trace_config()
        res = trace_mod.trace_rays(specs, lens, cfg, key=key,
                                   aggregate=trace_mod.AGG_TORCH)
        rms = metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)
        n_sequence = len(lens.structure.sequence[0])
        Q = (jnp.sum(res.stacks["theta_norm"], axis=0)
             + jnp.sum(res.stacks["theta_prime_norm"], axis=0)
             + jnp.sum(res.stacks["z_RELU"], axis=0)) / n_sequence
        Q = jnp.where(jnp.isnan(Q), 0.0, Q)
        # Population mean: reduces over the 'lens'-sharded batch (psum).
        loss = jnp.mean(rms) + config.penalty_rate * jnp.sum(Q) / rms.shape[0]
        return loss

    @partial(jax.jit, donate_argnums=(0, 2))
    def step_fn(params, lens, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, lens, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn
