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

import math
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


def _shard_map(body, mesh, in_specs, out_specs):
    """shard_map across jax versions; ``check_vma=False`` because the fused
    Pallas kernels' ``out_shape`` structs carry no vma annotations (jax 0.9
    requires them under ``check_vma=True``); transposition/psum placement is
    driven by the in/out specs either way (verified by gradient-parity
    tests)."""
    try:
        from jax import shard_map
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):  # older jax
        from jax.experimental.shard_map import shard_map as shard_map_old
        return shard_map_old(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def sharded_fused_losses(specs: Specs, lens: Lens,
                         config: sim_mod.SimulatorConfig, mesh: Mesh,
                         g: Optional[jnp.ndarray] = None,
                         catalog_g: Optional[jnp.ndarray] = None,
                         key: Optional[jax.Array] = None,
                         full: bool = True,
                         rows=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The fused Pallas lens loss, shard_mapped over the ('lens', 'rays')
    mesh: every device launches the fused batch kernel
    (``pallas_batch.trace_fused_batch[_full]`` / the asphere twin) on its
    (system-shard x pupil-shard) block; the loss reductions ``psum`` over
    ICI. This is the multi-chip form of
    ``pallas_batch.batched_compute_losses_fused`` (``full=True``) /
    ``simulator._do_ray_tracing_fused`` (``full=False``) — same math, same
    in-kernel penalty accumulation, numerics differing only by reduction
    order (asserted against the single-device fused loss in
    ``tests/test_sharding.py``).

    A ``pl.pallas_call`` has no GSPMD partitioning rule, so the plain
    ``jit``-over-mesh route the XLA engines take cannot shard the fused
    kernels; ``shard_map`` is the supported composition (kernel per shard +
    explicit collectives). Reference scope: the reference has no multi-device
    path at all (`optical_loss.py:105-111` is a serial per-sample loop).

    Requirements (loud): homogeneous population (one ``sequence`` and
    ``stop_idx``), float32. Population and pupil sizes NOT divisible by the
    mesh axes are padded automatically — padded systems/rays are masked out
    of every reduction, so results are identical to the unpadded
    single-device loss (``tests/test_sharding.py``).

    Returns (total, loss_dict) with replicated scalars.
    """
    from torchoptics_tpu.models.structure import Structure
    from torchoptics_tpu.ops import pallas_batch
    from torchoptics_tpu.ops import pupil as pupil_mod
    from torchoptics_tpu.ops.pallas_trace import _path_bounds

    cfg = config.trace_config()
    if config.double_precision:
        raise NotImplementedError(
            "sharded_fused_losses is float32 (fused kernels); use the XLA "
            "engines for double_precision")
    if (len(set(lens.structure.sequence)) != 1
            or len(set(lens.structure.stop_idx)) != 1):
        raise NotImplementedError(
            "sharded_fused_losses expects a homogeneous population (one "
            "lens type/stop per launch); group mixed populations by "
            "sequence as simulator._compute_losses_fused_grouped does")
    B = len(lens)
    n_lens_dev = mesh.shape[mesh_mod.LENS_AXIS]
    n_ray_dev = mesh.shape[mesh_mod.RAY_AXIS]

    # Pad the population to a 'lens'-axis multiple with clones of system 0
    # (they trace fine and carry zero weight in every reduction below).
    B_pad = mesh_mod.pad_to_multiple(B, n_lens_dev)
    if B_pad != B:
        reps = B_pad - B
        pad_sys = lambda a: (None if a is None else
                             jnp.concatenate(
                                 [a] + [a[:1]] * reps, axis=0))
        st_pad = Structure(lens.structure.stop_idx[:1] * B_pad,
                           lens.structure.sequence[:1] * B_pad)
        lens = type(lens)(st_pad, pad_sys(lens.c), pad_sys(lens.t),
                          pad_sys(lens.nd), pad_sys(lens.v),
                          kappa=pad_sys(lens.kappa),
                          asph=pad_sys(lens.asph))
        specs = type(specs)(st_pad, pad_sys(specs.epd), pad_sys(specs.hfov),
                            pad_sys(specs.vig_up), pad_sys(specs.vig_down),
                            pad_sys(specs.vig_x))

    # Global pupil sample (identical to the single-device trace), sharded
    # over 'rays'. Vignetting/aiming/EPD scaling happen per shard inside the
    # body — they are elementwise in the pupil coordinates (the aiming
    # correction is a per-field linear map built from tee rays, identically
    # recomputed on every ray shard).
    xp_rel, yp_rel = pupil_mod.sample_pupil(cfg.mode, cfg.n_rays, B_pad,
                                            key=key)
    P_total = xp_rel.shape[2]
    # Pad the pupil axis to a 'rays'-axis multiple with chief-ray clones at
    # the pupil center; they trace fine and are masked out of reductions.
    P_pad = mesh_mod.pad_to_multiple(P_total, n_ray_dev)
    if P_pad != P_total:
        padw = [(0, 0)] * xp_rel.ndim
        padw[2] = (0, P_pad - P_total)
        xp_rel = jnp.pad(xp_rel, padw)
        yp_rel = jnp.pad(yp_rel, padw)
    xp_rel = jnp.broadcast_to(xp_rel, (B_pad, 1, P_pad, 1))
    yp_rel = jnp.broadcast_to(yp_rel, (B_pad, 1, P_pad, 1))

    spherical = lens.is_spherical
    if not spherical:
        if lens.kappa is None:
            lens = lens.replace(kappa=jnp.zeros_like(lens.c))
        if lens.asph is None:
            lens = lens.replace(asph=jnp.zeros(lens.c.shape + (1,)))

    B_loc = B_pad // n_lens_dev
    st_loc = lens.structure[0:B_loc]
    mask = pallas_batch._static_mask(st_loc)
    bounds = (_path_bounds(st_loc, config.ray_path_lower_thresholds,
                           config.ray_path_upper_thresholds)
              if full else None)
    angle_thr = math.cos(math.radians(config.ray_angle_threshold)) ** 2
    n_seq = float(st_loc.n_surfaces[0])
    W = len(cfg.wavelengths)
    F = len(cfg.rel_fields)
    n_rays_total = B * F * P_total * W

    leaves = dict(c=lens.c, t=lens.t, nd=lens.nd, v=lens.v,
                  epd=specs.epd, hfov=specs.hfov, vig_up=specs.vig_up,
                  vig_down=specs.vig_down, vig_x=specs.vig_x,
                  xp=xp_rel, yp=yp_rel)
    in_spec = dict(
        c=P(mesh_mod.LENS_AXIS, None), t=P(mesh_mod.LENS_AXIS, None),
        nd=P(mesh_mod.LENS_AXIS, None), v=P(mesh_mod.LENS_AXIS, None),
        epd=P(mesh_mod.LENS_AXIS), hfov=P(mesh_mod.LENS_AXIS),
        vig_up=P(mesh_mod.LENS_AXIS), vig_down=P(mesh_mod.LENS_AXIS),
        vig_x=P(mesh_mod.LENS_AXIS),
        xp=P(mesh_mod.LENS_AXIS, None, mesh_mod.RAY_AXIS, None),
        yp=P(mesh_mod.LENS_AXIS, None, mesh_mod.RAY_AXIS, None))
    if not spherical:
        leaves.update(kappa=lens.kappa, asph=lens.asph)
        in_spec.update(kappa=P(mesh_mod.LENS_AXIS, None),
                       asph=P(mesh_mod.LENS_AXIS, None, None))

    keys = ("loss_unsup", "rms", "penalty") + (
        ("spot_size", "ray_path", "ray_angle") if full else ())
    out_spec = {k: P() for k in keys}

    def body(d):
        lens_loc = Lens(st_loc, d["c"], d["t"], d["nd"], d["v"],
                        kappa=d.get("kappa"), asph=d.get("asph"))
        specs_loc = Specs(st_loc, d["epd"], d["hfov"], d["vig_up"],
                          d["vig_down"], d["vig_x"])
        # W-outer front-end per shard: the big P_loc axis stays minor and
        # contiguous, so no (F, P, W) relayout materializes on any device
        # (same fast path as the single-chip loss — see
        # `pallas_batch.prepare_fused_inputs_batch`).
        xpb, ypb, cyb, z0, mu, shape = pallas_batch.prepare_fused_inputs_batch(
            specs_loc, lens_loc, cfg, xy=(d["xp"], d["yp"]), w_order="outer")
        B_l, F, P_loc, _ = shape
        n_per_w = F * P_loc
        if full:
            vertex_z = jnp.cumsum(lens_loc.t, axis=1)
            ref_z = jnp.concatenate((vertex_z, vertex_z[:, -1:]), axis=1)
            if spherical:
                outs = pallas_batch.trace_fused_batch_full(
                    xpb, ypb, cyb, z0, lens_loc.c, lens_loc.t, mu, ref_z,
                    rows, cfg.allow_backward_rays, mask, bounds, angle_thr,
                    n_per_w)
            else:
                from torchoptics_tpu.ops import pallas_asphere
                outs = pallas_asphere.trace_fused_asphere_batch_full(
                    xpb, ypb, cyb, z0, lens_loc.c, lens_loc.kappa,
                    lens_loc.t, mu, lens_loc.asph, ref_z, rows,
                    cfg.newton_iters, cfg.allow_backward_rays, mask, bounds,
                    angle_thr, n_per_w)
        else:
            if spherical:
                outs = pallas_batch.trace_fused_batch(
                    xpb, ypb, cyb, z0, lens_loc.c, lens_loc.t, mu, rows,
                    True, cfg.allow_backward_rays, mask, n_per_w)
            else:
                from torchoptics_tpu.ops import pallas_asphere
                outs = pallas_asphere.trace_fused_asphere_batch(
                    xpb, ypb, cyb, z0, lens_loc.c, lens_loc.kappa,
                    lens_loc.t, mu, lens_loc.asph, rows, True,
                    cfg.newton_iters, cfg.allow_backward_rays, mask,
                    n_per_w)
        y4 = outs[1].reshape(B_l, W, F, P_loc)
        ok4 = outs[4].reshape(B_l, W, F, P_loc)
        pth, ptp, pz = outs[6:9]                     # (B_loc, N_loc) flat

        # Validity of padded systems/rays (global index < real count);
        # padded entries carry zero weight in every reduction, making the
        # padded launch numerically identical to the unpadded loss.
        li = jax.lax.axis_index(mesh_mod.LENS_AXIS)
        ri = jax.lax.axis_index(mesh_mod.RAY_AXIS)
        sys_ok = (li * B_l + jnp.arange(B_l)) < B              # (B_loc,)
        sysw = sys_ok.astype(y4.dtype)
        ray_ok_pad = (ri * P_loc + jnp.arange(P_loc)) < P_total  # (P_loc,)
        rayw4 = ray_ok_pad[None, None, None, :]
        ok4 = ok4 & rayw4
        raywN = jnp.broadcast_to(rayw4, (B_l, W, F, P_loc)
                                 ).reshape(B_l, -1).astype(y4.dtype)

        # Spot RMS with cross-shard moments, psummed over the ray axis;
        # reductions run on the (B, W, F, P_loc) view of the flat W-outer
        # kernel outputs. 'y' = metrics.compute_rms2d semantics (all-ray
        # centroid, ok-masked deviations, all-ray denominator,
        # `pallas_batch.rms2d_flat_wouter_batch`); 'xy' = the radial 2-D
        # metric (masked centroid/count,
        # `pallas_batch.spot_rms_xy_flat_wouter_batch`).
        if config.spot_metric == "xy":
            x4 = outs[0].reshape(B_l, W, F, P_loc)
            wgt = ok4.astype(x4.dtype)
            count = jnp.maximum(jax.lax.psum(jnp.sum(wgt, axis=(1, 3)),
                                             mesh_mod.RAY_AXIS), 1.0)
            xc = jax.lax.psum(jnp.sum(x4 * wgt, axis=(1, 3)),
                              mesh_mod.RAY_AXIS) / count       # (B, F)
            yc = jax.lax.psum(jnp.sum(y4 * wgt, axis=(1, 3)),
                              mesh_mod.RAY_AXIS) / count
            d2 = ((x4 - xc[:, None, :, None]) ** 2
                  + (y4 - yc[:, None, :, None]) ** 2)
            ss = jax.lax.psum(jnp.sum(jnp.where(ok4, d2, 0.0), axis=(1, 3)),
                              mesh_mod.RAY_AXIS)               # (B, F)
            pos = ss > 0
            rms_f = jnp.where(
                pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / count), 0.0)
        else:
            ycent = jax.lax.psum(jnp.sum(y4 * rayw4, axis=3),
                                 mesh_mod.RAY_AXIS) / P_total  # (B, W, F)
            ymean = jnp.mean(ycent, axis=1)                    # (B, F)
            dev2 = jnp.where(ok4, (y4 - ymean[:, None, :, None]) ** 2, 0.0)
            ss = jax.lax.psum(jnp.sum(dev2, axis=(1, 3)), mesh_mod.RAY_AXIS)
            pos = ss > 0
            rms_f = jnp.where(
                pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / (P_total * W)), 0.0)
        rms_b = jnp.mean(rms_f, axis=1)                         # (B_loc,)

        sumQ_b = jax.lax.psum(jnp.sum((pth + ptp + pz) * raywN, axis=1),
                              mesh_mod.RAY_AXIS) / n_seq        # (B_loc,)
        Lu_b = rms_b + config.penalty_rate * sumQ_b

        mean_lens = lambda v: jax.lax.psum(jnp.sum(v * sysw),
                                           mesh_mod.LENS_AXIS) / B
        out = {"loss_unsup": mean_lens(Lu_b), "rms": mean_lens(rms_b),
               "penalty": mean_lens(sumQ_b)}
        if full:
            ppath, pang = outs[9:11]                 # (B_loc, N_loc) flat
            psum_all = lambda v: jax.lax.psum(
                jnp.sum(jax.lax.psum(jnp.sum(v * raywN, axis=1),
                                     mesh_mod.RAY_AXIS) * sysw),
                mesh_mod.LENS_AXIS)
            out["spot_size"] = out["rms"]
            out["ray_path"] = psum_all(ppath) / n_rays_total
            out["ray_angle"] = psum_all(pang) / n_rays_total
        return out

    loss_dict = _shard_map(body, mesh, (in_spec,), out_spec)(leaves)
    if not full:
        return loss_dict["loss_unsup"], loss_dict
    # The glass penalty depends only on g, not the trace: tiny, computed
    # once on the replicated variables (GSPMD handles it).
    if g is not None:
        loss_dict["glass"] = sim_mod.compute_glass_penalty(
            lens.structure, g, catalog_g)
    weights = config.loss_weights
    total = sum(loss_dict[k] * w for k, w in weights.items()
                if k in loss_dict and w is not None)
    return total, loss_dict


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

    With ``config.trace_engine='pallas'`` the loss is
    :func:`sharded_fused_losses` — the fused kernels launched per shard under
    ``shard_map`` (a ``pl.pallas_call`` has no GSPMD partitioning rule, so
    this is the only way the production fast path shards). The XLA engines
    ('unroll'/'scan') keep the plain GSPMD route.

    ``step_fn(state, key) -> (state, total_loss, loss_dict)``.
    """
    from torchoptics_tpu import optimize as opt_mod

    loss_fn = None
    if config.trace_engine == "pallas":
        def loss_fn(specs_, lens_, config_, g_, catalog_g_, key_):
            return sharded_fused_losses(specs_, lens_, config_, mesh, g=g_,
                                        catalog_g=catalog_g_, key=key_,
                                        full=use_full_loss)

    opt = opt_mod.LensOptimizer(
        specs, config, learning_rate=learning_rate, add_bfl=add_bfl,
        qc_variables=qc_variables, use_full_loss=use_full_loss,
        trainable=trainable, loss_fn=loss_fn)

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
