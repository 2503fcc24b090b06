"""Population-batched Pallas trace: many lens systems per launch.

Extends ``ops.pallas_trace`` (same surface math and adjoints, imported from
there) with a system axis in the kernel grid, so a whole *population* of
same-structure lenses — the generator-training workload of the reference's
``optical_loss_unsupervised`` (`optical_loss.py:99-122`, a serial Python
loop there) — traces fwd+bwd in one kernel launch. Grid = (systems, ray
tiles); per-system parameters stream through SMEM blocks.

Constraints: spherical surfaces, same Structure across the batch (always
true for one generator lens type), rays-per-system padded to a (8, 128)
tile multiple.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchoptics_tpu.ops.pallas_trace import (
    LANES, _LOC_BOOL, _LOC_F32, _N_LOC_BOOL, _N_LOC_F32, _bwd_surface,
    _fwd_surface, _theta_norm, _theta_norm_adjoint)

DEFAULT_ROWS = 8  # rows per tile per system: 8*128 = 1024 rays


def _widx_batch(i, rows, w):
    row = jax.lax.broadcasted_iota(jnp.int32, (1, rows, LANES), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, rows, LANES), 2)
    flat = (i * rows + row) * LANES + col
    return flat % w


def _mu_of_batch(mu_ref, k, widx, w):
    mu = jnp.zeros(widx.shape, jnp.float32)
    for wi in range(w):
        mu = jnp.where(widx == wi, mu_ref[0, 0, k, wi], mu)
    return mu


def _fwd_kernel_b(n_surf, w, rows, penalties,
                  z0_ref, c_ref, t_ref, mu_ref,
                  xp_ref, yp_ref, cy_ref, *outs):
    if penalties:
        (x_out, y_out, cx_out, cy_out, ok_out, bw_out,
         pth_out, ptp_out, pz_out) = outs
    else:
        x_out, y_out, cx_out, cy_out, ok_out, bw_out = outs
    i = pl.program_id(1)
    widx = _widx_batch(i, rows, w)
    x = xp_ref[...]
    y = yp_ref[...]
    cy = cy_ref[...]
    z = jnp.full(x.shape, z0_ref[0, 0, 0])
    cx = jnp.zeros_like(x)
    cz = jnp.sqrt(1.0 - cy * cy)
    ok = jnp.ones(x.shape, jnp.bool_)
    bw = jnp.zeros(x.shape, jnp.bool_)
    pen_th = jnp.zeros_like(x)
    pen_tp = jnp.zeros_like(x)
    pen_z = jnp.zeros_like(x)

    for k in range(n_surf):
        mu = _mu_of_batch(mu_ref, k, widx, w)
        (x, y, z, cx, cy, cz, ok2), loc = _fwd_surface(
            c_ref[0, 0, k], t_ref[0, 0, k], mu, x, y, z, cx, cy, cz, ok)
        if k > 0:
            bw = bw | ((loc["delta_z"] < 0) & loc["ok1"])
        ok = ok2
        if penalties:
            pen_th = pen_th + _theta_norm(loc["cos2"], ok)
            pen_tp = pen_tp + _theta_norm(loc["cos2p"], ok)
            pen_z = pen_z + jnp.maximum(z, 0.0)

    delta_z = -z
    dist = delta_z / cz
    x = x + dist * cx
    y = y + dist * cy
    bw = bw | ((delta_z < 0) & ok)

    x_out[...] = x
    y_out[...] = y
    cx_out[...] = cx
    cy_out[...] = cy
    ok_out[...] = ok
    bw_out[...] = bw
    if penalties:
        pth_out[...] = pen_th
        ptp_out[...] = pen_tp
        pz_out[...] = pen_z


def _bwd_kernel_b(n_surf, w, rows, penalties,
                  z0_ref, c_ref, t_ref, mu_ref,
                  xp_ref, yp_ref, cyin_ref, *rest):
    if penalties:
        (dx_ref, dy_ref, dcx_ref, dcy_ref, dpth_ref, dptp_ref, dpz_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dt_out, dmu_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
    else:
        (dx_ref, dy_ref, dcx_ref, dcy_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dt_out, dmu_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
        dpth_ref = dptp_ref = dpz_ref = None
    i = pl.program_id(1)
    widx = _widx_batch(i, rows, w)

    x = xp_ref[...]
    y = yp_ref[...]
    cy = cyin_ref[...]
    z = jnp.full(x.shape, z0_ref[0, 0, 0])
    cx = jnp.zeros_like(x)
    cz0 = jnp.sqrt(1.0 - cy * cy)
    cz = cz0
    ok = jnp.ones(x.shape, jnp.bool_)

    for k in range(n_surf):
        st_x[k] = x
        st_y[k] = y
        st_z[k] = z
        st_cx[k] = cx
        st_cy[k] = cy
        st_cz[k] = cz
        st_ok[k] = ok
        mu = _mu_of_batch(mu_ref, k, widx, w)
        (x, y, z, cx, cy, cz, ok), loc = _fwd_surface(
            c_ref[0, 0, k], t_ref[0, 0, k], mu, x, y, z, cx, cy, cz, ok)
        for li, name in enumerate(_LOC_F32):
            st_locf[li, k] = loc[name]
        for li, name in enumerate(_LOC_BOOL):
            st_locb[li, k] = loc[name]

    dx_img = dx_ref[...]
    dy_img = dy_ref[...]
    dist_f = -z / cz
    dcx = dcx_ref[...] + dx_img * dist_f
    dcy = dcy_ref[...] + dy_img * dist_f
    ddist = dx_img * cx + dy_img * cy
    dz = -ddist / cz
    dcz = ddist * (z / (cz * cz))
    dx = dx_img
    dy = dy_img

    @pl.when(i == 0)
    def _():
        dz0_out[0, 0, 0] = 0.0
        for k in range(n_surf):
            dc_out[0, 0, k] = 0.0
            dt_out[0, 0, k] = 0.0
            for wi in range(w):
                dmu_out[0, 0, k, wi] = 0.0

    if penalties:
        dpth = dpth_ref[...]
        dptp = dptp_ref[...]
        dpz = dpz_ref[...]

    for k in range(n_surf - 1, -1, -1):
        pre = (st_x[k], st_y[k], st_z[k], st_cx[k], st_cy[k], st_cz[k],
               st_ok[k])
        mu = _mu_of_batch(mu_ref, k, widx, w)
        loc = {name: st_locf[li, k] for li, name in enumerate(_LOC_F32)}
        loc.update({name: st_locb[li, k]
                    for li, name in enumerate(_LOC_BOOL)})
        dcos2_extra = dcos2p_extra = None
        if penalties:
            ok_end = loc["ok1"] & ~loc["fail2"]
            z_next = st_z[k + 1] if k + 1 < n_surf else z
            dz = dz + dpz * (z_next > 0)
            dcos2_extra = _theta_norm_adjoint(loc["cos2"], ok_end, dpth)
            dcos2p_extra = _theta_norm_adjoint(loc["cos2p"], ok_end, dptp)
        (dx, dy, dz, dcx, dcy, dcz), dc_k, dt_k, dmu_ray = _bwd_surface(
            c_ref[0, 0, k], t_ref[0, 0, k], mu, pre, loc,
            (dx, dy, dz, dcx, dcy, dcz), dcos2_extra, dcos2p_extra)
        dc_out[0, 0, k] += dc_k
        dt_out[0, 0, k] += dt_k
        for wi in range(w):
            dmu_out[0, 0, k, wi] += jnp.sum(
                jnp.where(widx == wi, dmu_ray, 0.0))

    dcy = dcy + dcz * (-cy / cz0)
    dxp_out[...] = dx
    dyp_out[...] = dy
    dcyin_out[...] = dcy
    dz0_out[0, 0, 0] += jnp.sum(dz)


def _pad_rays(n: int, rows: int) -> int:
    tile = rows * LANES
    return int(math.ceil(n / tile) * tile)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def trace_fused_batch(xp, yp, cy, z0, c, t, mu, rows=DEFAULT_ROWS,
                      penalties=False):
    """Fused spherical trace of a lens population.

    Args:
      xp, yp, cy: (B, N) per-system flat ray blocks (wavelength innermost).
      z0: (B,) entrance-pupil positions.
      c, t: (B, S); mu: (B, S, W).

    Returns per-system (B, N) outputs (x, y, cx, cy, ok, bw[, pen...]).
    """
    return _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties)


def _prep(a, rows):
    b, n = a.shape
    n_pad = _pad_rays(n, rows)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n)))
    return a.reshape(b, -1, LANES)


def _specs_common(rows, n_surf, w, n_rows):
    # Mosaic requires the last two block dims to equal the array dims (or be
    # (8,128)-divisible), so per-system parameter rows carry a leading
    # singleton: arrays are (B, 1, S)-shaped with (1, 1, S) blocks.
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    z0_spec = pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.SMEM)
    ct_spec = pl.BlockSpec((1, 1, n_surf), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.SMEM)
    mu_spec = pl.BlockSpec((1, 1, n_surf, w), lambda b, i: (b, 0, 0, 0),
                           memory_space=pltpu.SMEM)
    return ray_spec, z0_spec, ct_spec, mu_spec


def _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties):
    B, n = xp.shape
    n_surf = c.shape[1]
    w = mu.shape[2]
    xp2 = _prep(xp.astype(jnp.float32), rows)
    yp2 = _prep(yp.astype(jnp.float32), rows)
    cy2 = _prep(cy.astype(jnp.float32), rows)
    n_rows = xp2.shape[1]
    grid = (B, n_rows // rows)

    ray_spec, z0_spec, ct_spec, mu_spec = _specs_common(
        rows, n_surf, w, n_rows)
    n_out = 9 if penalties else 6
    out_shapes = (
        [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.bool_)] * 2
        + [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32)]
        * (n_out - 6))

    outs = pl.pallas_call(
        partial(_fwd_kernel_b, n_surf, w, rows, penalties),
        grid=grid,
        in_specs=[z0_spec, ct_spec, ct_spec, mu_spec,
                  ray_spec, ray_spec, ray_spec],
        out_specs=tuple([ray_spec] * n_out),
        out_shape=tuple(out_shapes),
    )(z0.reshape(-1, 1, 1).astype(jnp.float32),
      c[:, None].astype(jnp.float32), t[:, None].astype(jnp.float32),
      mu[:, None].astype(jnp.float32), xp2, yp2, cy2)

    unpad = lambda a: a.reshape(B, -1)[:, :n]
    return tuple(unpad(o) for o in outs)


def _fused_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties):
    out = _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties)
    return out, (xp, yp, cy, z0, c, t, mu)


def _fused_bwd_b(rows, penalties, residuals, cotangents):
    xp, yp, cy, z0, c, t, mu = residuals
    if penalties:
        dx, dy, dcx, dcy, _dok, _dbw, dpth, dptp, dpz = cotangents
    else:
        dx, dy, dcx, dcy, _dok, _dbw = cotangents
        dpth = dptp = dpz = None

    B, n = xp.shape
    n_surf = c.shape[1]
    w = mu.shape[2]
    prep = lambda a: _prep(a.astype(jnp.float32), rows)
    xp2, yp2, cy2 = prep(xp), prep(yp), prep(cy)
    dx2, dy2, dcx2, dcy2 = prep(dx), prep(dy), prep(dcx), prep(dcy)
    pen_in = [prep(dpth), prep(dptp), prep(dpz)] if penalties else []
    n_rows = xp2.shape[1]
    grid = (B, n_rows // rows)

    ray_spec, z0_spec, ct_spec, mu_spec = _specs_common(
        rows, n_surf, w, n_rows)
    out_shape = (
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, n_surf), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, n_surf), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, n_surf, w), jnp.float32),
    )
    scratch = [pltpu.VMEM((n_surf, 1, rows, LANES), jnp.float32)
               for _ in range(6)]
    scratch.append(pltpu.VMEM((n_surf, 1, rows, LANES), jnp.bool_))
    scratch.append(pltpu.VMEM((_N_LOC_F32, n_surf, 1, rows, LANES),
                              jnp.float32))
    scratch.append(pltpu.VMEM((_N_LOC_BOOL, n_surf, 1, rows, LANES),
                              jnp.bool_))
    dmu_spec = pl.BlockSpec((1, 1, n_surf, w), lambda b, i: (b, 0, 0, 0),
                            memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        partial(_bwd_kernel_b, n_surf, w, rows, penalties),
        grid=grid,
        in_specs=[z0_spec, ct_spec, ct_spec, mu_spec,
                  ray_spec, ray_spec, ray_spec,
                  ray_spec, ray_spec, ray_spec, ray_spec]
        + [ray_spec] * len(pen_in),
        out_specs=(ray_spec, ray_spec, ray_spec,
                   z0_spec, ct_spec, ct_spec, dmu_spec),
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(z0.reshape(-1, 1, 1).astype(jnp.float32),
      c[:, None].astype(jnp.float32), t[:, None].astype(jnp.float32),
      mu[:, None].astype(jnp.float32),
      xp2, yp2, cy2, dx2, dy2, dcx2, dcy2, *pen_in)

    dxp2, dyp2, dcy2o, dz0, dc, dt, dmu = outs
    unpad = lambda a: a.reshape(B, -1)[:, :n]
    return (unpad(dxp2), unpad(dyp2), unpad(dcy2o),
            dz0.reshape(jnp.shape(z0)), dc[:, 0], dt[:, 0], dmu[:, 0])


trace_fused_batch.defvjp(_fused_fwd_b, _fused_bwd_b)


# ---------------------------------------------------------------------------
# High-level batched objective
# ---------------------------------------------------------------------------


def batched_unsupervised_loss(specs, lens, config,
                              key: Optional[jax.Array] = None,
                              rows: int = DEFAULT_ROWS):
    """Unsupervised loss Lu for a whole lens population in one fused launch.

    This is the TPU-native form of the reference's generator-training loss
    (`optical_loss.py:99-122`, a serial per-sample Python loop there): all
    systems must share one Structure (one generator lens type), parameters
    and specs are batched along axis 0.

    Args:
      specs/lens: batched (B systems); spherical, no padded surfaces.
      config: ``simulator.SimulatorConfig``.

    Returns (mean_Lu, {"loss_unsup": (B,), "rms": (B,), "penalty": (B,)}).
    """
    from torchoptics_tpu.models import glass as glass_mod
    from torchoptics_tpu.ops import abcd as abcd_mod
    from torchoptics_tpu.ops import metrics as metrics_mod
    from torchoptics_tpu.ops import pupil as pupil_mod

    assert lens.is_spherical, "batched fused kernel is spherical"
    assert bool(np.all(lens.structure.mask)), (
        "batched fused kernel expects no padded surfaces")
    cfg = config.trace_config()
    B = len(lens)

    n = lens.get_refractive_indices(cfg.wavelengths)     # (B, S, W)
    n_full = jnp.concatenate((jnp.ones_like(n[:, :1, :]), n), axis=1)
    mu = n_full[:, :-1, :] / n_full[:, 1:, :]            # (B, S, W)
    z0 = abcd_mod.compute_pupil_position(lens)           # (B,)

    xp_rel, yp_rel = pupil_mod.sample_pupil(cfg.mode, cfg.n_rays, B, key=key)
    if cfg.n_ray_aiming_iter > 0:
        from torchoptics_tpu.ops import aiming
        aiming_fn = aiming.ray_aiming(specs, lens.detach(), cfg, True)
        xp_rel, yp_rel = [jax.lax.stop_gradient(jnp.clip(v, -2.0, 2.0))
                          for v in aiming_fn(xp_rel, yp_rel)]
    xp = pupil_mod.scale_to_epd(xp_rel, specs.epd)
    yp = pupil_mod.scale_to_epd(yp_rel, specs.epd)

    F = len(cfg.rel_fields)
    W = len(cfg.wavelengths)
    u = specs.hfov[:, None] * jnp.asarray(cfg.rel_fields,
                                          jnp.float32)[None, :]
    cy = jnp.sin(u)                                      # (B, F)
    P = xp.shape[2]
    xpb = jnp.broadcast_to(xp, (B, F, P, W)).reshape(B, -1)
    ypb = jnp.broadcast_to(yp, (B, F, P, W)).reshape(B, -1)
    cyb = jnp.broadcast_to(cy[:, :, None, None], (B, F, P, W)).reshape(B, -1)

    outs = trace_fused_batch(xpb, ypb, cyb, z0, lens.c, lens.t, mu,
                             rows, True)
    x, y, cx, cy_out, ok, bw, pth, ptp, pz = outs
    shape = (B, F, P, W)
    rms = metrics_mod.compute_rms2d(x.reshape(shape), y.reshape(shape),
                                    ok.reshape(shape))  # (B,)
    n_sequence = len(lens.structure.sequence[0])
    sumQ = (jnp.sum(pth, axis=1) + jnp.sum(ptp, axis=1)
            + jnp.sum(pz, axis=1)) / n_sequence
    Lu = rms + config.penalty_rate * sumQ
    return jnp.mean(Lu), {"loss_unsup": Lu, "rms": rms, "penalty": sumQ}
