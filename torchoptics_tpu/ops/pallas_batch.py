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
    _fwd_surface, _hinge, _hinge_grad, _kill_backward, _theta_norm,
    _theta_norm_adjoint)

DEFAULT_ROWS = None  # None -> auto: one exact tile per system when it fits


def auto_rows(n: int) -> int:
    """Tile rows for an N-rays-per-system batch. A single whole tile per
    system (block dims == array dims, so Mosaic accepts non-8-multiples)
    avoids tile-padding waste and per-tile overhead — measured 1.24x over
    rows=8 on the reference generator workload (1536 rays/system). Beyond
    the VMEM budget of the stash-locals backward, fall back to 8-row
    multi-tiling."""
    rps = max(1, math.ceil(n / LANES))
    return rps if rps <= 64 else 8


def _widx_batch(i, rows, w, n_per_w=None):
    """Per-ray wavelength index in system-local flat order (see
    ``pallas_trace._widx``): ``n_per_w=None`` = wavelength innermost
    (broadcast (F, P, W) flatten); static ``n_per_w`` = wavelength
    OUTERMOST ((W, F, P) flatten, relayout-free on TPU)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (1, rows, LANES), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, rows, LANES), 2)
    flat = (i * rows + row) * LANES + col
    if n_per_w is None:
        return flat % w
    return jnp.minimum(flat // n_per_w, w - 1)


def _mu_of_batch(mu_ref, k, widx, w):
    mu = jnp.zeros(widx.shape, jnp.float32)
    for wi in range(w):
        mu = jnp.where(widx == wi, mu_ref[0, 0, k, wi], mu)
    return mu


def _fwd_kernel_b(n_surf, w, rows, penalties, allow_backward, path_bounds,
                  angle_thr, n_per_w, z0_ref, c_ref, t_ref, mu_ref, mask_ref,
                  *refs):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    lu = bool(penalties) and not opl_mode
    if full:
        ref_ref, xp_ref, yp_ref, cy_ref, *outs = refs
        (x_out, y_out, cx_out, cy_out, ok_out, bw_out,
         pth_out, ptp_out, pz_out, ppath_out, pang_out) = outs
    elif opl_mode:
        n_ref, xp_ref, yp_ref, cy_ref, *outs = refs
        (x_out, y_out, cx_out, cy_out, ok_out, bw_out, opl_out) = outs
    elif lu:
        xp_ref, yp_ref, cy_ref, *outs = refs
        (x_out, y_out, cx_out, cy_out, ok_out, bw_out,
         pth_out, ptp_out, pz_out) = outs
    else:
        xp_ref, yp_ref, cy_ref, *outs = refs
        x_out, y_out, cx_out, cy_out, ok_out, bw_out = outs
    i = pl.program_id(1)
    widx = _widx_batch(i, rows, w, n_per_w)
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
    pen_path = jnp.zeros_like(x)
    pen_ang = jnp.zeros_like(x)
    opl = jnp.zeros_like(x)
    z_prev = None

    for k in range(n_surf):
        mu = _mu_of_batch(mu_ref, k, widx, w)
        (x, y, z, cx, cy, cz, ok2), loc = _fwd_surface(
            c_ref[0, 0, k], t_ref[0, 0, k], mu, x, y, z, cx, cy, cz, ok)
        if opl_mode:
            # OPL leg k travels in the medium BEFORE surface k, n_ref[k]
            # (see pallas_trace._fwd_kernel's opl mode; padded gaps carry
            # n = 1 and zero-length legs, matching the XLA "dist" path).
            opl = opl + loc["dist"] * _mu_of_batch(n_ref, k, widx, w)
        if k > 0:
            # Backward bookkeeping skips dummy (padded) previous surfaces —
            # per-system mask rides in SMEM (`ray_tracing_lite.py:625-632`).
            went_bw = ((loc["delta_z"] < 0) & loc["ok1"]
                       & (mask_ref[0, 0, k - 1] > 0))
            if allow_backward:
                bw = bw | went_bw
            else:
                x, y, z, cx, cy, cz, ok2 = _kill_backward(
                    went_bw, t_ref[0, 0, k], x, y, z, cx, cy, cz, ok2)
        ok = ok2
        # Padding surfaces of heterogeneous batches contribute NOTHING to
        # the penalties — the XLA path masks its aggregate stacks the same
        # way (`simulator.compute_loss_out` surface_mask; the reference
        # traces each sample at natural length, `optical_loss.py:105-111`).
        valid_k = mask_ref[0, 0, k] > 0
        if lu:
            pen_th = pen_th + jnp.where(
                valid_k, _theta_norm(loc["cos2"], ok), 0.0)
            pen_tp = pen_tp + jnp.where(
                valid_k, _theta_norm(loc["cos2p"], ok), 0.0)
            pen_z = pen_z + jnp.where(valid_k, jnp.maximum(z, 0.0), 0.0)
        if full:
            # Angle + path hinges, as in pallas_trace._fwd_kernel's full
            # branch (homogeneous batch: per-gap bounds are static/shared,
            # per-system ref_z rides in SMEM).
            pen_ang = pen_ang + jnp.where(
                valid_k,
                jnp.maximum(angle_thr - loc["cos2"], 0.0)
                + jnp.maximum(angle_thr - loc["cos2p"], 0.0), 0.0)
            if k > 0:
                delta = ((z + ref_ref[0, 0, k])
                         - (z_prev + ref_ref[0, 0, k - 1]))
                pen_path = pen_path + _hinge(delta, *path_bounds[k - 1])
            z_prev = z
    if full:
        delta = ref_ref[0, 0, n_surf] - (z_prev + ref_ref[0, 0, n_surf - 1])
        pen_path = pen_path + _hinge(delta, *path_bounds[n_surf - 1])

    delta_z = -z
    dist = delta_z / cz
    x = x + dist * cx
    y = y + dist * cy
    if opl_mode:
        # Final leg: last surface -> image plane, in image-space n_ref[S].
        opl = opl + dist * _mu_of_batch(n_ref, n_surf, widx, w)
    last_real = mask_ref[0, 0, n_surf - 1] > 0
    if allow_backward:
        bw = bw | ((delta_z < 0) & ok & last_real)
    else:
        ok = ok & ~((delta_z < 0) & ok & last_real)

    x_out[...] = x
    y_out[...] = y
    cx_out[...] = cx
    cy_out[...] = cy
    ok_out[...] = ok
    bw_out[...] = bw
    if lu:
        pth_out[...] = pen_th
        ptp_out[...] = pen_tp
        pz_out[...] = pen_z
    if full:
        ppath_out[...] = pen_path
        pang_out[...] = pen_ang
    if opl_mode:
        opl_out[...] = opl


def _bwd_kernel_b(n_surf, w, rows, penalties, allow_backward, path_bounds,
                  angle_thr, n_per_w, z0_ref, c_ref, t_ref, mu_ref, mask_ref,
                  *rest):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    lu = bool(penalties) and not opl_mode
    ref_ref = None
    if full:
        (ref_ref, xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dpth_ref, dptp_ref, dpz_ref,
         dppath_ref, dpang_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dt_out, dmu_out,
         dref_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
    elif opl_mode:
        (n_ref, xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dopl_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dt_out, dmu_out,
         dn_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
        dpth_ref = dptp_ref = dpz_ref = None
    elif lu:
        (xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dpth_ref, dptp_ref, dpz_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dt_out, dmu_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
    else:
        (xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dt_out, dmu_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
        dpth_ref = dptp_ref = dpz_ref = None
    i = pl.program_id(1)
    widx = _widx_batch(i, rows, w, n_per_w)

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
        if not allow_backward and k > 0:
            x, y, z, cx, cy, cz, ok = _kill_backward(
                (loc["delta_z"] < 0) & loc["ok1"]
                & (mask_ref[0, 0, k - 1] > 0),
                t_ref[0, 0, k], x, y, z, cx, cy, cz, ok)
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
    dopl = None
    if opl_mode:
        # opl += dist_f * n_S: inject into the final-leg distance adjoint.
        dopl = dopl_ref[...]
        ddist = ddist + dopl * _mu_of_batch(n_ref, n_surf, widx, w)
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
        if full:
            for k in range(n_surf + 1):
                dref_out[0, 0, k] = 0.0
        if opl_mode:
            for k in range(n_surf + 1):
                for wi in range(w):
                    dn_out[0, 0, k, wi] = 0.0

    if opl_mode:
        for wi in range(w):
            dn_out[0, 0, n_surf, wi] += jnp.sum(
                jnp.where(widx == wi, dopl * dist_f, 0.0))

    if lu:
        dpth = dpth_ref[...]
        dptp = dptp_ref[...]
        dpz = dpz_ref[...]
    if full:
        dppath = dppath_ref[...]
        dpang = dpang_ref[...]

        def zpost(m):
            return st_z[m + 1] if m + 1 < n_surf else z

        def hinge_cot(j):
            if j == n_surf - 1:
                delta = ref_ref[0, 0, n_surf] - (zpost(n_surf - 1)
                                                 + ref_ref[0, 0, n_surf - 1])
            else:
                delta = ((zpost(j + 1) + ref_ref[0, 0, j + 1])
                         - (zpost(j) + ref_ref[0, 0, j]))
            return dppath * _hinge_grad(delta, *path_bounds[j])

    for k in range(n_surf - 1, -1, -1):
        pre = (st_x[k], st_y[k], st_z[k], st_cx[k], st_cy[k], st_cz[k],
               st_ok[k])
        mu = _mu_of_batch(mu_ref, k, widx, w)
        loc = {name: st_locf[li, k] for li, name in enumerate(_LOC_F32)}
        loc.update({name: st_locb[li, k]
                    for li, name in enumerate(_LOC_BOOL)})
        kill = None
        if not allow_backward and k > 0:
            kill = ((loc["dist"] * st_cz[k] < 0) & loc["ok1"]
                    & (mask_ref[0, 0, k - 1] > 0))
        dcos2_extra = dcos2p_extra = ddist_extra = None
        # Adjoint of the forward's padding-surface masking: no penalty
        # cotangent flows through padded surfaces.
        valid_k = mask_ref[0, 0, k] > 0
        if opl_mode:
            # opl += dist_k * n_k (pre-kill accumulation in the forward).
            ddist_extra = dopl * _mu_of_batch(n_ref, k, widx, w)
            for wi in range(w):
                dn_out[0, 0, k, wi] += jnp.sum(
                    jnp.where(widx == wi, dopl * loc["dist"], 0.0))
        if lu:
            ok_end = loc["ok1"] & ~loc["fail2"]
            if kill is not None:
                ok_end = ok_end & ~kill
            z_next = st_z[k + 1] if k + 1 < n_surf else z
            dz = dz + dpz * ((z_next > 0) & valid_k)
            dcos2_extra = jnp.where(
                valid_k, _theta_norm_adjoint(loc["cos2"], ok_end, dpth), 0.0)
            dcos2p_extra = jnp.where(
                valid_k, _theta_norm_adjoint(loc["cos2p"], ok_end, dptp),
                0.0)
        if full:
            # Path/angle adjoints (see pallas_trace._bwd_kernel full branch).
            hp_k = hinge_cot(k)
            dz = dz - hp_k
            if k > 0:
                dz = dz + hinge_cot(k - 1)
            dref_out[0, 0, k + 1] += jnp.sum(hp_k)
            dref_out[0, 0, k] += -jnp.sum(hp_k)
            dcos2_extra = dcos2_extra - jnp.where(
                valid_k,
                dpang * (loc["cos2"] < angle_thr).astype(jnp.float32), 0.0)
            dcos2p_extra = dcos2p_extra - jnp.where(
                valid_k,
                dpang * (loc["cos2p"] < angle_thr).astype(jnp.float32), 0.0)
        dt_kill = None
        if kill is not None:
            dt_kill = -jnp.sum(jnp.where(kill, dz, 0.0))
            dx = jnp.where(kill, 0.0, dx)
            dy = jnp.where(kill, 0.0, dy)
            dz = jnp.where(kill, 0.0, dz)
            dcx = jnp.where(kill, 0.0, dcx)
            dcy = jnp.where(kill, 0.0, dcy)
            dcz = jnp.where(kill, 0.0, dcz)
        (dx, dy, dz, dcx, dcy, dcz), dc_ray, dt_ray, dmu_ray = _bwd_surface(
            c_ref[0, 0, k], t_ref[0, 0, k], mu, pre, loc,
            (dx, dy, dz, dcx, dcy, dcz), dcos2_extra, dcos2p_extra,
            ddist_extra)
        dc_k = jnp.sum(dc_ray)
        dt_k = jnp.sum(dt_ray)
        if dt_kill is not None:
            dt_k = dt_k + dt_kill
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


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def trace_fused_batch(xp, yp, cy, z0, c, t, mu, rows=DEFAULT_ROWS,
                      penalties=False, allow_backward=True, mask=None,
                      n_per_w=None):
    """Fused spherical trace of a lens population.

    Args:
      xp, yp, cy: (B, N) per-system flat ray blocks (wavelength innermost;
        pass static ``n_per_w=F*P`` for wavelength-OUTERMOST (W, F, P)
        flat blocks — the relayout-free layout, see ``_widx_batch``).
      z0: (B,) entrance-pupil positions.
      c, t: (B, S); mu: (B, S, W).
      allow_backward: False removes backward rays instead of flagging them.
      mask: static per-system surface-validity mask as a hashable tuple of
        0/1 tuples (heterogeneous padded populations); None means all valid.

    Returns per-system (B, N) outputs (x, y, cx, cy, ok, bw[, pen...]).
    """
    return _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties,
                      allow_backward, mask, n_per_w=n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def trace_fused_batch_full(xp, yp, cy, z0, c, t, mu, ref_z,
                           rows=DEFAULT_ROWS, allow_backward=True,
                           mask=None, path_bounds=(), angle_thr=0.25,
                           n_per_w=None):
    """``trace_fused_batch`` with the FULL weighted-loss penalty set
    accumulated in-kernel, the population analogue of
    ``pallas_trace.trace_fused_full``. Homogeneous batches only (one
    generator lens type): the static per-gap ``path_bounds`` are shared;
    each system's differentiable absolute vertex positions ride in
    ``ref_z`` (B, S+1). Returns the 6 trace outputs plus (pen_theta,
    pen_theta_p, pen_zrelu, pen_path, pen_angle), each (B, N)."""
    return _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, "full",
                      allow_backward, mask, ref_z, path_bounds, angle_thr,
                      n_per_w=n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def trace_fused_batch_opl(xp, yp, cy, z0, c, t, mu, n_legs,
                          rows=DEFAULT_ROWS, allow_backward=True, mask=None,
                          n_per_w=None):
    """``trace_fused_batch`` with the in-kernel optical-path-length
    accumulator — the population analogue of
    ``pallas_trace.trace_fused_opl``. ``n_legs`` is the differentiable
    (B, S+1, W) per-leg refractive-index table (air row first; padded gaps
    carry n = 1 and zero-length legs, so they contribute nothing — the XLA
    "dist"-aggregate semantics). Returns the 6 trace outputs plus ``opl``
    (B, N); launch plane-wave phase is added host-side."""
    return _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, "opl", allow_backward,
                      mask, n_per_w=n_per_w, n_legs=n_legs)


def _fused_opl_fwd_b(xp, yp, cy, z0, c, t, mu, n_legs, rows, allow_backward,
                     mask, n_per_w):
    out = _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, "opl", allow_backward,
                     mask, n_per_w=n_per_w, n_legs=n_legs)
    return out, (xp, yp, cy, z0, c, t, mu, n_legs)


def _fused_opl_bwd_b(rows, allow_backward, mask, n_per_w, residuals,
                     cotangents):
    return _run_bwd_b(residuals, cotangents, rows, "opl", allow_backward,
                      mask, n_per_w=n_per_w)


trace_fused_batch_opl.defvjp(_fused_opl_fwd_b, _fused_opl_bwd_b)


def _mask_array(mask, B, n_surf):
    if mask is None:
        return jnp.ones((B, 1, n_surf), jnp.float32)
    arr = jnp.asarray(mask, jnp.float32).reshape(B, 1, n_surf)
    return arr


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


def _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties, allow_backward,
               mask, ref_z=None, path_bounds=None, angle_thr=None,
               n_per_w=None, n_legs=None):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    B, n = xp.shape
    if rows is None:
        rows = auto_rows(n)
    n_surf = c.shape[1]
    w = mu.shape[2]
    xp2 = _prep(xp.astype(jnp.float32), rows)
    yp2 = _prep(yp.astype(jnp.float32), rows)
    cy2 = _prep(cy.astype(jnp.float32), rows)
    n_rows = xp2.shape[1]
    grid = (B, n_rows // rows)

    ray_spec, z0_spec, ct_spec, mu_spec = _specs_common(
        rows, n_surf, w, n_rows)
    n_out = 11 if full else (7 if opl_mode else (9 if penalties else 6))
    out_shapes = (
        [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.bool_)] * 2
        + [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32)]
        * (n_out - 6))
    ref_spec = pl.BlockSpec((1, 1, n_surf + 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    nlegs_spec = pl.BlockSpec((1, 1, n_surf + 1, w),
                              lambda b, i: (b, 0, 0, 0),
                              memory_space=pltpu.SMEM)
    if full:
        ref_in = [ref_z.reshape(B, 1, -1).astype(jnp.float32)]
        ref_specs = [ref_spec]
    elif opl_mode:
        ref_in = [n_legs[:, None].astype(jnp.float32)]   # (B, 1, S+1, W)
        ref_specs = [nlegs_spec]
    else:
        ref_in, ref_specs = [], []

    outs = pl.pallas_call(
        partial(_fwd_kernel_b, n_surf, w, rows, penalties, allow_backward,
                path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[z0_spec, ct_spec, ct_spec, mu_spec, ct_spec]
        + ref_specs + [ray_spec, ray_spec, ray_spec],
        out_specs=tuple([ray_spec] * n_out),
        out_shape=tuple(out_shapes),
    )(z0.reshape(-1, 1, 1).astype(jnp.float32),
      c[:, None].astype(jnp.float32), t[:, None].astype(jnp.float32),
      mu[:, None].astype(jnp.float32), _mask_array(mask, B, n_surf),
      *ref_in, xp2, yp2, cy2)

    unpad = lambda a: a.reshape(B, -1)[:, :n]
    return tuple(unpad(o) for o in outs)


def _fused_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties, allow_backward,
                 mask, n_per_w):
    out = _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, penalties,
                     allow_backward, mask, n_per_w=n_per_w)
    return out, (xp, yp, cy, z0, c, t, mu)


def _fused_full_fwd_b(xp, yp, cy, z0, c, t, mu, ref_z, rows, allow_backward,
                      mask, path_bounds, angle_thr, n_per_w):
    out = _run_fwd_b(xp, yp, cy, z0, c, t, mu, rows, "full", allow_backward,
                     mask, ref_z, path_bounds, angle_thr, n_per_w=n_per_w)
    return out, (xp, yp, cy, z0, c, t, mu, ref_z)


def _run_bwd_b(residuals, cotangents, rows, penalties, allow_backward,
               mask, path_bounds=None, angle_thr=None, n_per_w=None):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    n_legs = dopl = None
    if full:
        xp, yp, cy, z0, c, t, mu, ref_z = residuals
        (dx, dy, dcx, dcy, _dok, _dbw,
         dpth, dptp, dpz, dppath, dpang) = cotangents
    elif opl_mode:
        xp, yp, cy, z0, c, t, mu, n_legs = residuals
        dx, dy, dcx, dcy, _dok, _dbw, dopl = cotangents
        ref_z = dpth = dptp = dpz = dppath = dpang = None
    elif penalties:
        xp, yp, cy, z0, c, t, mu = residuals
        dx, dy, dcx, dcy, _dok, _dbw, dpth, dptp, dpz = cotangents
        ref_z = dppath = dpang = None
    else:
        xp, yp, cy, z0, c, t, mu = residuals
        dx, dy, dcx, dcy, _dok, _dbw = cotangents
        ref_z = dpth = dptp = dpz = dppath = dpang = None

    B, n = xp.shape
    if rows is None:
        rows = auto_rows(n)
    n_surf = c.shape[1]
    w = mu.shape[2]
    prep = lambda a: _prep(a.astype(jnp.float32), rows)
    xp2, yp2, cy2 = prep(xp), prep(yp), prep(cy)
    dx2, dy2, dcx2, dcy2 = prep(dx), prep(dy), prep(dcx), prep(dcy)
    if opl_mode:
        pen_in = [prep(dopl)]
    elif penalties:
        pen_in = [prep(dpth), prep(dptp), prep(dpz)]
    else:
        pen_in = []
    if full:
        pen_in += [prep(dppath), prep(dpang)]
    n_rows = xp2.shape[1]
    grid = (B, n_rows // rows)

    ray_spec, z0_spec, ct_spec, mu_spec = _specs_common(
        rows, n_surf, w, n_rows)
    ref_spec = pl.BlockSpec((1, 1, n_surf + 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    nlegs_spec = pl.BlockSpec((1, 1, n_surf + 1, w),
                              lambda b, i: (b, 0, 0, 0),
                              memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, n_surf), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, n_surf), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, n_surf, w), jnp.float32),
    )
    out_specs = [ray_spec, ray_spec, ray_spec, z0_spec, ct_spec, ct_spec,
                 pl.BlockSpec((1, 1, n_surf, w), lambda b, i: (b, 0, 0, 0),
                              memory_space=pltpu.SMEM)]
    ref_in, ref_specs = [], []
    if full:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((B, 1, n_surf + 1), jnp.float32),)
        out_specs.append(ref_spec)
        ref_in = [ref_z.reshape(B, 1, -1).astype(jnp.float32)]
        ref_specs = [ref_spec]
    elif opl_mode:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((B, 1, n_surf + 1, w), jnp.float32),)
        out_specs.append(nlegs_spec)
        ref_in = [n_legs[:, None].astype(jnp.float32)]
        ref_specs = [nlegs_spec]
    scratch = [pltpu.VMEM((n_surf, 1, rows, LANES), jnp.float32)
               for _ in range(6)]
    scratch.append(pltpu.VMEM((n_surf, 1, rows, LANES), jnp.bool_))
    scratch.append(pltpu.VMEM((_N_LOC_F32, n_surf, 1, rows, LANES),
                              jnp.float32))
    scratch.append(pltpu.VMEM((_N_LOC_BOOL, n_surf, 1, rows, LANES),
                              jnp.bool_))

    outs = pl.pallas_call(
        partial(_bwd_kernel_b, n_surf, w, rows, penalties, allow_backward,
                path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[z0_spec, ct_spec, ct_spec, mu_spec, ct_spec]
        + ref_specs
        + [ray_spec, ray_spec, ray_spec,
           ray_spec, ray_spec, ray_spec, ray_spec]
        + [ray_spec] * len(pen_in),
        out_specs=tuple(out_specs),
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(z0.reshape(-1, 1, 1).astype(jnp.float32),
      c[:, None].astype(jnp.float32), t[:, None].astype(jnp.float32),
      mu[:, None].astype(jnp.float32), _mask_array(mask, B, n_surf),
      *ref_in, xp2, yp2, cy2, dx2, dy2, dcx2, dcy2, *pen_in)

    dxp2, dyp2, dcy2o, dz0, dc, dt, dmu = outs[:7]
    unpad = lambda a: a.reshape(B, -1)[:, :n]
    grads = (unpad(dxp2), unpad(dyp2), unpad(dcy2o),
             dz0.reshape(jnp.shape(z0)), dc[:, 0], dt[:, 0], dmu[:, 0])
    if full:
        grads = grads + (outs[7][:, 0].reshape(jnp.shape(ref_z)),)
    elif opl_mode:
        grads = grads + (outs[7][:, 0].reshape(jnp.shape(n_legs)),)
    return grads


def _fused_bwd_b(rows, penalties, allow_backward, mask, n_per_w, residuals,
                 cotangents):
    return _run_bwd_b(residuals, cotangents, rows, penalties,
                      allow_backward, mask, n_per_w=n_per_w)


def _fused_full_bwd_b(rows, allow_backward, mask, path_bounds, angle_thr,
                      n_per_w, residuals, cotangents):
    return _run_bwd_b(residuals, cotangents, rows, "full", allow_backward,
                      mask, path_bounds, angle_thr, n_per_w=n_per_w)


trace_fused_batch.defvjp(_fused_fwd_b, _fused_bwd_b)
trace_fused_batch_full.defvjp(_fused_full_fwd_b, _fused_full_bwd_b)


# ---------------------------------------------------------------------------
# High-level batched objective
# ---------------------------------------------------------------------------


def _static_mask(structure):
    """Hashable per-system surface mask (None when nothing is padded)."""
    if bool(np.all(structure.mask)):
        return None
    return tuple(tuple(int(v) for v in row) for row in structure.mask)


def prepare_fused_inputs_batch(specs, lens, cfg, key=None, xy=None,
                               use_vig=True, w_order="inner"):
    """Batched front-end mirroring ``pallas_trace.prepare_fused_inputs``:
    dispersion, pupil placement, sampling, vignetting, ray aiming, EPD
    scaling, flatten to per-system (B, N) ray blocks.

    ``w_order="inner"`` (default) flattens broadcast (F, P, W) blocks —
    wavelength innermost, matching the packaged result layout but paying a
    strided relayout on TPU. ``w_order="outer"`` flattens (W, F, P) blocks
    via the same per-(system, field, λ) affine-probe trick as the
    single-system fast path (`pallas_trace.prepare_fused_inputs`): the
    vignetting→aiming→EPD chain is affine in the pupil coordinates, so two
    probe evaluations extract its coefficients and the big block is built
    directly in the relayout-free P-minor layout. Pair with the kernels'
    ``n_per_w=F*P`` wavelength indexing.

    Returns (xpb, ypb, cyb, z0, mu, (B, F, P, W))."""
    from torchoptics_tpu.ops import abcd as abcd_mod
    from torchoptics_tpu.ops import pupil as pupil_mod

    B = len(lens)
    n = lens.get_refractive_indices(cfg.wavelengths)     # (B, S, W)
    n_full = jnp.concatenate((jnp.ones_like(n[:, :1, :]), n), axis=1)
    mu = n_full[:, :-1, :] / n_full[:, 1:, :]            # (B, S, W)
    z0 = abcd_mod.compute_pupil_position(lens)           # (B,)

    if xy is None:
        xp_rel, yp_rel = pupil_mod.sample_pupil(cfg.mode, cfg.n_rays, B,
                                                key=key)
    else:
        xp_rel, yp_rel = xy

    F = len(cfg.rel_fields)
    W = len(cfg.wavelengths)

    if w_order == "outer":
        assert xp_rel.shape[1] == 1 and xp_rel.shape[3] == 1, (
            "w_order='outer' needs plain (B?, 1, P, 1) pupil samples")
        px = xp_rel[:, 0, :, 0]                          # (Bp, P)
        py = yp_rel[:, 0, :, 0]
        P = px.shape[1]

        def chain(vx, vy):
            if use_vig and cfg.vig_fn is not None and cfg.mode != "chief":
                fields = jnp.asarray(cfg.rel_fields, jnp.float32)[None, :]
                vig_up = cfg.vig_fn(fields, specs.vig_up)
                vig_down = cfg.vig_fn(fields, specs.vig_down)
                vig_x = cfg.vig_fn(fields, specs.vig_x)
                vy = pupil_mod.apply_vignetting(vy, vig_up, vig_down)
                vx = pupil_mod.apply_vignetting(vx, vig_x, vig_x)
            if cfg.n_ray_aiming_iter > 0:
                from torchoptics_tpu.ops import aiming
                fn = aiming.ray_aiming(specs, lens.detach(), cfg, use_vig)
                vx, vy = fn(vx, vy)
            return vx, vy

        zero = jnp.zeros((B, F, 1, W), jnp.float32)
        one = jnp.ones((B, F, 1, W), jnp.float32)
        ox, oy = chain(zero, zero)
        sx, sy = chain(one, one)
        sx = sx - ox
        sy = sy - oy
        # (B?, F, 1, W) -> (B, W, F, 1): puts the large P axis minor.
        wf = lambda a: jnp.transpose(
            jnp.broadcast_to(a, (B, F, 1, W)), (0, 3, 1, 2))
        pxb = jnp.broadcast_to(px[:, None, None, :], (B, W, F, P))
        pyb = jnp.broadcast_to(py[:, None, None, :], (B, W, F, P))
        xrel = pxb * wf(sx) + wf(ox)                     # (B, W, F, P)
        yrel = pyb * wf(sy) + wf(oy)
        if cfg.n_ray_aiming_iter > 0:
            # Same clamp + constant treatment as the jnp engine
            # (`ray_tracing_lite.py:108-110`).
            xrel = jax.lax.stop_gradient(jnp.clip(xrel, -2.0, 2.0))
            yrel = jax.lax.stop_gradient(jnp.clip(yrel, -2.0, 2.0))
        half_epd = specs.epd[:, None, None, None] / 2.0
        xpb = (xrel * half_epd).reshape(B, -1)
        ypb = (yrel * half_epd).reshape(B, -1)
        u = specs.hfov[:, None] * jnp.asarray(cfg.rel_fields,
                                              jnp.float32)[None, :]
        cyb = jnp.broadcast_to(jnp.sin(u)[:, None, :, None],
                               (B, W, F, P)).reshape(B, -1)
        return xpb, ypb, cyb, z0, mu, (B, F, P, W)

    if use_vig and cfg.vig_fn is not None and cfg.mode != "chief":
        fields = jnp.asarray(cfg.rel_fields, jnp.float32)[None, :]
        vig_up = cfg.vig_fn(fields, specs.vig_up)
        vig_down = cfg.vig_fn(fields, specs.vig_down)
        vig_x = cfg.vig_fn(fields, specs.vig_x)
        yp_rel = pupil_mod.apply_vignetting(yp_rel, vig_up, vig_down)
        xp_rel = pupil_mod.apply_vignetting(xp_rel, vig_x, vig_x)
    if cfg.n_ray_aiming_iter > 0:
        from torchoptics_tpu.ops import aiming
        aiming_fn = aiming.ray_aiming(specs, lens.detach(), cfg, use_vig)
        xp_rel, yp_rel = [jax.lax.stop_gradient(jnp.clip(v, -2.0, 2.0))
                          for v in aiming_fn(xp_rel, yp_rel)]
    xp = pupil_mod.scale_to_epd(xp_rel, specs.epd)
    yp = pupil_mod.scale_to_epd(yp_rel, specs.epd)

    u = specs.hfov[:, None] * jnp.asarray(cfg.rel_fields,
                                          jnp.float32)[None, :]
    cy = jnp.sin(u)                                      # (B, F)
    P = xp.shape[2]
    xpb = jnp.broadcast_to(xp, (B, F, P, W)).reshape(B, -1)
    ypb = jnp.broadcast_to(yp, (B, F, P, W)).reshape(B, -1)
    cyb = jnp.broadcast_to(cy[:, :, None, None], (B, F, P, W)).reshape(B, -1)
    return xpb, ypb, cyb, z0, mu, (B, F, P, W)


def rms2d_flat_wouter_batch(y_flat, ok_flat, F, P, W):
    """``metrics.compute_rms2d`` on flat wavelength-OUTERMOST batched kernel
    outputs (B, N): all reductions run on a (B, W, F, P) view whose minor
    axis is the large contiguous P — no (F, P, W) relayout materializes.
    Semantics match `ray_tracing_lite.py:678-702` (see
    ``pallas_trace.rms2d_flat_wouter``); returns per-system RMS, (B,)."""
    B = y_flat.shape[0]
    y4 = y_flat.reshape(B, W, F, P)
    ok4 = ok_flat.reshape(B, W, F, P)
    ycent = jnp.mean(y4, axis=3)                     # (B, W, F)
    ymean = jnp.mean(ycent, axis=1)                  # (B, F)
    dev2 = jnp.where(ok4, (y4 - ymean[:, None, :, None]) ** 2, 0.0)
    ss = jnp.sum(dev2, axis=(1, 3))                  # (B, F)
    pos = ss > 0
    rms_f = jnp.where(pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / (P * W)), 0.0)
    return jnp.mean(rms_f, axis=1)


def spot_rms_xy_flat_wouter_batch(x_flat, y_flat, ok_flat, F, P, W):
    """``metrics.compute_spot_rms_xy`` field-mean on flat W-outer batched
    kernel outputs (B, N); returns (B,). Masked centroid/count, safe sqrt —
    see ``pallas_trace.spot_rms_xy_flat_wouter``."""
    B = x_flat.shape[0]
    x4 = x_flat.reshape(B, W, F, P)
    y4 = y_flat.reshape(B, W, F, P)
    ok4 = ok_flat.reshape(B, W, F, P)
    w = ok4.astype(x4.dtype)
    count = jnp.maximum(jnp.sum(w, axis=(1, 3)), 1.0)        # (B, F)
    xc = jnp.sum(x4 * w, axis=(1, 3)) / count
    yc = jnp.sum(y4 * w, axis=(1, 3)) / count
    d2 = ((x4 - xc[:, None, :, None]) ** 2
          + (y4 - yc[:, None, :, None]) ** 2)
    ss = jnp.sum(jnp.where(ok4, d2, 0.0), axis=(1, 3))       # (B, F)
    pos = ss > 0
    rms_f = jnp.where(pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / count), 0.0)
    return jnp.mean(rms_f, axis=1)


def spot_rms_flat_wouter_batch(outs, F, P, W, spot_metric: str = "y"):
    """Dispatch the per-system spot reduction on flat W-outer batched kernel
    outputs (see ``pallas_trace.spot_rms_flat_wouter``); returns (B,)."""
    if spot_metric == "y":
        return rms2d_flat_wouter_batch(outs[1], outs[4], F, P, W)
    if spot_metric == "xy":
        return spot_rms_xy_flat_wouter_batch(outs[0], outs[1], outs[4],
                                             F, P, W)
    raise ValueError(f"spot metric must be 'y' or 'xy', got {spot_metric!r}")


def trace_rays_fused_batch(specs, lens, config,
                           key: Optional[jax.Array] = None,
                           xy=None, rows=DEFAULT_ROWS,
                           penalties: bool = False, use_vig: bool = True):
    """``trace_rays`` on the fused batch kernel (B ≥ 1, spherical;
    heterogeneous padded structures supported via static per-system masks).

    Returns a ``TraceResult`` shaped (B, F, P, W); with ``penalties`` also
    the per-ray penalty sums, as in ``pallas_trace.trace_rays_fused``.
    Traces W-outer and transposes into the packaged contract (see
    ``pallas_trace.package_fused_result``)."""
    from torchoptics_tpu.ops.pallas_trace import _wouter_ok

    assert lens.is_spherical, "batched fused kernel is spherical"
    assert not config.double_precision, (
        "fused kernels are float32; double_precision needs ops.trace")
    w_order = "outer" if _wouter_ok(xy) else "inner"
    xpb, ypb, cyb, z0, mu, shape = prepare_fused_inputs_batch(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order=w_order)
    B, F, P, W = shape
    outs = trace_fused_batch(xpb, ypb, cyb, z0, lens.c, lens.t, mu,
                             rows, penalties, config.allow_backward_rays,
                             _static_mask(lens.structure),
                             F * P if w_order == "outer" else None)
    return package_fused_result_batch(outs, shape, penalties, w_order)


def package_fused_result_batch(outs, shape, penalties, w_order="inner"):
    """Package flat (B, N) kernel outputs as a (B, F, P, W) TraceResult
    (see ``pallas_trace.package_fused_result``)."""
    from torchoptics_tpu.ops import trace as trace_mod
    B, F, P, W = shape
    if w_order == "outer":
        pack = lambda a: jnp.transpose(a.reshape(B, W, F, P), (0, 2, 3, 1))
    else:
        pack = lambda a: a.reshape(shape)
    x, y, cx, cy_out, ok, bw = outs[:6]
    result = trace_mod.TraceResult(
        pack(x), pack(y), pack(cx), pack(cy_out), pack(ok), pack(bw), None)
    if penalties:
        return result, tuple(pack(p) for p in outs[6:])
    return result


def batched_compute_losses_fused(specs, lens, config,
                                 g=None, catalog_g=None,
                                 key: Optional[jax.Array] = None,
                                 rows=DEFAULT_ROWS):
    """The FULL weighted loss (spot + ray-path + ray-angle + glass + Lu)
    for a homogeneous lens population in one fused launch — the batched
    analogue of ``pallas_trace.compute_losses_fused``. Matches
    ``simulator.compute_losses``'s XLA batch reductions (hinge sums are
    means over all (B, F, P, W) rays; Lu terms follow the per-sample
    semantics of `optical_loss.py:105-111`)."""
    import math as _math
    from torchoptics_tpu.ops import metrics as metrics_mod
    from torchoptics_tpu.ops.pallas_trace import _path_bounds
    from torchoptics_tpu import simulator as sim_mod

    cfg = config.trace_config()
    assert len(set(lens.structure.sequence)) == 1, (
        "batched fused full loss expects a homogeneous population (one "
        "generator lens type); use trace_engine='unroll' for mixed batches")
    B = len(lens)
    bounds = _path_bounds(lens.structure, config.ray_path_lower_thresholds,
                          config.ray_path_upper_thresholds)
    angle_thr = _math.cos(_math.radians(config.ray_angle_threshold)) ** 2

    # W-outer front-end + flat reductions: no (F, P, W) relayout ever
    # materializes (see `pallas_trace.spot_rms_fused`).
    xpb, ypb, cyb, z0, mu, shape = prepare_fused_inputs_batch(
        specs, lens, cfg, key=key, w_order="outer")
    B, F, P, W = shape
    vertex_z = jnp.cumsum(lens.t, axis=1)                      # (B, S)
    ref_z = jnp.concatenate((vertex_z, vertex_z[:, -1:]), axis=1)

    if lens.is_spherical:
        outs = trace_fused_batch_full(
            xpb, ypb, cyb, z0, lens.c, lens.t, mu, ref_z, rows,
            cfg.allow_backward_rays, _static_mask(lens.structure), bounds,
            angle_thr, F * P)
    else:
        from torchoptics_tpu.ops import pallas_asphere
        lens_a = lens
        if lens_a.kappa is None:
            lens_a = lens_a.replace(kappa=jnp.zeros_like(lens_a.c))
        if lens_a.asph is None:
            lens_a = lens_a.replace(asph=jnp.zeros(lens_a.c.shape + (1,)))
        outs = pallas_asphere.trace_fused_asphere_batch_full(
            xpb, ypb, cyb, z0, lens_a.c, lens_a.kappa, lens_a.t, mu,
            lens_a.asph, ref_z, rows, cfg.newton_iters,
            cfg.allow_backward_rays, _static_mask(lens.structure), bounds,
            angle_thr, F * P)
    pth, ptp, pz, ppath, pang = outs[6:]

    n_rays_total = B * F * P * W
    rms_b = spot_rms_flat_wouter_batch(outs, F, P, W,
                                       config.spot_metric)     # (B,)
    n_seq = jnp.asarray(lens.structure.n_surfaces, rms_b.dtype)
    sumQ_b = (jnp.sum(pth, axis=1) + jnp.sum(ptp, axis=1)
              + jnp.sum(pz, axis=1)) / n_seq
    Lu_b = rms_b + config.penalty_rate * sumQ_b
    loss_dict = {
        "loss_unsup": jnp.mean(Lu_b), "rms": jnp.mean(rms_b),
        "penalty": jnp.mean(sumQ_b),
        "spot_size": jnp.mean(rms_b),
        "ray_path": jnp.sum(ppath) / n_rays_total,
        "ray_angle": jnp.sum(pang) / n_rays_total,
    }
    if g is not None:
        loss_dict["glass"] = sim_mod.compute_glass_penalty(
            lens.structure, g, catalog_g)
    weights = config.loss_weights
    total = sum(loss_dict[k] * w for k, w in weights.items()
                if k in loss_dict and w is not None)
    return total, loss_dict


def batched_unsupervised_loss(specs, lens, config,
                              key: Optional[jax.Array] = None,
                              rows=DEFAULT_ROWS):
    """Unsupervised loss Lu for a whole lens population in one fused launch.

    This is the TPU-native form of the reference's generator-training loss
    (`optical_loss.py:99-122`, a serial per-sample Python loop there):
    parameters and specs are batched along axis 0; heterogeneous padded
    populations normalize each system's Q by its own surface count.

    Returns (mean_Lu, {"loss_unsup": (B,), "rms": (B,), "penalty": (B,)}).
    """
    cfg = config.trace_config()
    assert not cfg.double_precision, (
        "fused kernels are float32; double_precision needs ops.trace")
    # W-outer front-end + flat reductions (see batched_compute_losses_fused).
    xpb, ypb, cyb, z0, mu, shape = prepare_fused_inputs_batch(
        specs, lens, cfg, key=key, w_order="outer")
    B, F, P, W = shape
    if lens.is_spherical:
        outs = trace_fused_batch(xpb, ypb, cyb, z0, lens.c, lens.t, mu,
                                 rows, True, cfg.allow_backward_rays,
                                 _static_mask(lens.structure), F * P)
    else:
        from torchoptics_tpu.ops import pallas_asphere
        lens_a = lens
        if lens_a.kappa is None:
            lens_a = lens_a.replace(kappa=jnp.zeros_like(lens_a.c))
        if lens_a.asph is None:
            lens_a = lens_a.replace(asph=jnp.zeros(lens_a.c.shape + (1,)))
        outs = pallas_asphere.trace_fused_asphere_batch(
            xpb, ypb, cyb, z0, lens_a.c, lens_a.kappa, lens_a.t, mu,
            lens_a.asph, rows, True, cfg.newton_iters,
            cfg.allow_backward_rays, _static_mask(lens.structure), F * P)
    pth, ptp, pz = outs[6:9]
    rms = spot_rms_flat_wouter_batch(outs, F, P, W,
                                     config.spot_metric)      # (B,)
    n_seq = jnp.asarray(lens.structure.n_surfaces, dtype=rms.dtype)  # (B,)
    sumQ = (jnp.sum(pth, axis=1) + jnp.sum(ptp, axis=1)
            + jnp.sum(pz, axis=1)) / n_seq
    Lu = rms + config.penalty_rate * sumQ
    return jnp.mean(Lu), {"loss_unsup": Lu, "rms": rms, "penalty": sumQ}


def optical_paths_fused_batch(specs, lens, config,
                              key: Optional[jax.Array] = None,
                              xy=None, rows=DEFAULT_ROWS,
                              use_vig: bool = True):
    """``ops.wavefront.optical_path_lengths`` on the batched spherical
    kernel (B ≥ 1, f32): returns (TraceResult, OPL) with OPL (B, F, P, W)
    in mm, launch plane-wave phase included — the population analogue of
    ``pallas_trace.optical_paths_fused`` (heterogeneous padded structures
    supported: padded legs have zero length and n = 1)."""
    from torchoptics_tpu.ops.pallas_trace import _wouter_ok

    assert lens.is_spherical, "batched fused OPL kernel is spherical"
    assert not config.double_precision, (
        "fused kernels are float32; double_precision needs ops.trace")
    n = lens.get_refractive_indices(config.wavelengths)      # (B, S, W)
    n_legs = jnp.concatenate((jnp.ones_like(n[:, :1, :]), n),
                             axis=1)                         # (B, S+1, W)
    w_order = "outer" if _wouter_ok(xy) else "inner"
    xpb, ypb, cyb, z0, mu, shape = prepare_fused_inputs_batch(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order=w_order)
    B, F, P, W = shape
    outs = trace_fused_batch_opl(
        xpb, ypb, cyb, z0, lens.c, lens.t, mu, n_legs, rows,
        config.allow_backward_rays, _static_mask(lens.structure),
        F * P if w_order == "outer" else None)
    res = package_fused_result_batch(outs[:6], shape, False, w_order)
    opl_flat = outs[6] + ypb * cyb
    if w_order == "outer":
        opl = jnp.transpose(opl_flat.reshape(B, W, F, P), (0, 2, 3, 1))
    else:
        opl = opl_flat.reshape(shape)
    return res, opl
