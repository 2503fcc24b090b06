"""Pallas TPU kernel for the fused spherical ray trace (fwd + custom VJP).

Why a kernel when XLA already fuses the unrolled trace: the *backward* pass.
XLA autodiff saves per-surface residuals to HBM (~40 floats/ray for an
11-surface chain), making fwd+bwd HBM-bound. This kernel's custom VJP
recomputes the forward per ray tile **inside VMEM** and applies a
hand-derived adjoint chain, so the whole fwd+bwd touches HBM only for kernel
inputs/outputs (~13 floats/ray): an order-of-magnitude traffic reduction on
the north-star benchmark (BASELINE.json: ≥100M differentiable ray-surface
intersections/s/chip).

Scope (the flagship hot path): single system (B == 1), spherical surfaces,
no dead padded surfaces, wavelength innermost in the flattened ray order.
Heterogeneous batches / aspheres use the XLA engines in ``ops.trace``.

The math mirrors ``ops.surfaces`` (itself reference-parity with
`ray_tracing_lite.py:514-675`), including every failure-mask select — the
adjoint of each ``where`` keeps gradients of failed lanes exactly zero.
Correctness is pinned by tests against ``jax.grad`` of the jnp engine.
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

EPS = 1e-6
LANES = 128
DEFAULT_ROWS = 32  # rows per tile => 32*128 = 4096 rays/tile


def _widx(i, rows, w, n_per_w=None):
    """Wavelength index of each ray in the (rows, 128) tile of grid step i.

    ``n_per_w=None``: wavelength innermost in the flat ray order (λ = i%W —
    the layout of a broadcast (F, P, W) block). Static ``n_per_w``:
    wavelength OUTERMOST (λ = i//n_per_w, clamped for the padded tail) —
    the layout of a (W, F, P) block, whose flatten is relayout-free on TPU
    (the W-inner flatten costs a ~10× slower strided relayout because W
    lands in the 128-lane minor dimension)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = (i * rows + row) * LANES + col
    if n_per_w is None:
        return flat % w
    return jnp.minimum(flat // n_per_w, w - 1)


def _mu_of(mu_ref, k, widx, w):
    """Per-ray mu for surface k via W-way select from the (S, W) table."""
    mu = jnp.zeros(widx.shape, jnp.float32)
    for wi in range(w):
        mu = jnp.where(widx == wi, mu_ref[k, wi], mu)
    return mu


def _fwd_surface(c, t, mu, x, y, z, cx, cy, cz, ok):
    """One spherical surface step; returns post-state and locals needed by
    the adjoint. Mirrors `ops.surfaces` exactly."""
    e = -(x * cx + y * cy + z * cz)
    mz = z + e * cz
    m2 = x * x + y * y + z * z - e * e
    temp = c * m2 - 2.0 * mz
    cos2 = cz * cz - c * temp
    fail1 = cos2 - EPS < 0
    cos = jnp.sqrt(jnp.where(fail1, 1.0, cos2))
    denom = cz + cos
    dist = e + temp / denom

    xA = x + dist * cx
    yA = y + dist * cy
    zA = z + dist * cz
    delta_z = dist * cz

    ok1 = ok & ~fail1
    xB = jnp.where(ok1, xA, 0.0)
    yB = jnp.where(ok1, yA, 0.0)
    zB = jnp.where(ok1, zA, 0.0)
    cxB = jnp.where(ok1, cx, 0.0)
    cyB = jnp.where(ok1, cy, 0.0)

    cos2p = 1.0 - mu * mu * (1.0 - cos * cos)
    fail2a = cos2p - EPS < 0
    cosp = jnp.sqrt(jnp.where(fail2a, 1.0, cos2p))
    g = cosp - mu * cos
    cxC = mu * cxB - g * c * xB
    cyC = mu * cyB - g * c * yB
    cz2 = 1.0 - (cxC * cxC + cyC * cyC)
    fail2 = fail2a | (cz2 - EPS < 0)
    czC = jnp.sqrt(jnp.where(fail2, 1.0, cz2))

    ok2 = ok1 & ~fail2
    xD = jnp.where(ok2, xB, 0.0)
    yD = jnp.where(ok2, yB, 0.0)
    zD = jnp.where(ok2, zB, 0.0) - t
    cxD = jnp.where(ok2, cxC, 0.0)
    cyD = jnp.where(ok2, cyC, 0.0)
    czD = jnp.where(ok2, czC, 1.0)

    return ((xD, yD, zD, cxD, cyD, czD, ok2),
            dict(delta_z=delta_z, ok1=ok1, fail1=fail1, fail2a=fail2a,
                 fail2=fail2, cos=cos, cosp=cosp, g=g, denom=denom,
                 dist=dist, temp=temp, m2=m2, e=e, xB=xB, yB=yB,
                 cxB=cxB, cyB=cyB, cxC=cxC, cyC=cyC, czC=czC,
                 cos2=cos2, cos2p=cos2p))


def _bwd_surface(c, t, mu, pre, loc, d, dcos2_extra=None, dcos2p_extra=None,
                 ddist_extra=None):
    """Adjoint of ``_fwd_surface``. ``pre`` = pre-surface state,
    ``loc`` = recomputed locals, ``d`` = (dxD, dyD, dzD, dcxD, dcyD, dczD);
    ``dcos2*_extra`` inject penalty-term cotangents on the raw cos² locals;
    ``ddist_extra`` injects an OPL-accumulator cotangent on the marching
    distance (the ``"opl"`` kernel mode).

    Returns (d_pre_state, dc_ray, dt_ray, dmu_ray) — the parameter
    cotangents are PER-RAY contributions; the caller reduces them over the
    axes its parameter granularity requires (whole tile for single-system
    kernels, per-row for the packed population kernel)."""
    x, y, z, cx, cy, cz, ok = pre
    dxD, dyD, dzD, dcxD, dcyD, dczD = d
    ok1 = loc["ok1"]
    ok2 = ok1 & ~loc["fail2"]
    cos, cosp, g = loc["cos"], loc["cosp"], loc["g"]
    denom, dist, temp, m2, e = (loc["denom"], loc["dist"], loc["temp"],
                                loc["m2"], loc["e"])
    xB, yB, cxB, cyB = loc["xB"], loc["yB"], loc["cxB"], loc["cyB"]
    cxC, cyC, czC = loc["cxC"], loc["cyC"], loc["czC"]

    dt_ray = -dzD  # z_next = zD - t

    dczC = jnp.where(ok2, dczD, 0.0)
    dcz2 = jnp.where(loc["fail2"], 0.0, dczC / (2.0 * czC))
    dcxC = jnp.where(ok2, dcxD, 0.0) - 2.0 * cxC * dcz2
    dcyC = jnp.where(ok2, dcyD, 0.0) - 2.0 * cyC * dcz2

    dxB = jnp.where(ok2, dxD, 0.0) - dcxC * g * c
    dyB = jnp.where(ok2, dyD, 0.0) - dcyC * g * c
    dzB = jnp.where(ok2, dzD, 0.0)
    dcxB = mu * dcxC
    dcyB = mu * dcyC

    dg = -(dcxC * c * xB + dcyC * c * yB)
    dc_ray = -(dcxC * g * xB + dcyC * g * yB)
    dmu_ray = dcxC * cxB + dcyC * cyB

    dcosp = dg
    dmu_ray = dmu_ray - dg * cos
    dcos = -dg * mu

    dcos2p = jnp.where(loc["fail2a"], 0.0, dcosp / (2.0 * cosp))
    if dcos2p_extra is not None:
        dcos2p = dcos2p + dcos2p_extra
    dmu_ray = dmu_ray + dcos2p * (-2.0 * mu * (1.0 - cos * cos))
    dcos = dcos + dcos2p * (2.0 * mu * mu * cos)

    # reset1 adjoint (czB is dead: snell rebuilds cz from renormalization).
    dxA = jnp.where(ok1, dxB, 0.0)
    dyA = jnp.where(ok1, dyB, 0.0)
    dzA = jnp.where(ok1, dzB, 0.0)
    dcx = jnp.where(ok1, dcxB, 0.0)
    dcy = jnp.where(ok1, dcyB, 0.0)

    # update_ray_coordinates adjoint
    ddist = dxA * cx + dyA * cy + dzA * cz
    if ddist_extra is not None:
        ddist = ddist + ddist_extra
    dx = dxA
    dy = dyA
    dz = dzA
    dcx = dcx + dxA * dist
    dcy = dcy + dyA * dist
    dcz = dzA * dist

    # dist = e + temp/denom
    de = ddist
    dtemp = ddist / denom
    ddenom = -ddist * temp / (denom * denom)
    dcz = dcz + ddenom
    dcos = dcos + ddenom

    dcos2 = jnp.where(loc["fail1"], 0.0, dcos / (2.0 * cos))
    if dcos2_extra is not None:
        dcos2 = dcos2 + dcos2_extra

    # cos2 = cz^2 - c*temp
    dcz = dcz + 2.0 * cz * dcos2
    dc_ray = dc_ray - dcos2 * temp
    dtemp = dtemp - c * dcos2

    # temp = c*m2 - 2*mz
    dc_ray = dc_ray + dtemp * m2
    dm2 = c * dtemp
    dmz = -2.0 * dtemp

    # m2 = x^2+y^2+z^2-e^2
    dx = dx + 2.0 * x * dm2
    dy = dy + 2.0 * y * dm2
    dz = dz + 2.0 * z * dm2
    de = de - 2.0 * e * dm2

    # mz = z + e*cz
    dz = dz + dmz
    de = de + dmz * cz
    dcz = dcz + dmz * e

    # e = -(x cx + y cy + z cz)
    dx = dx - de * cx
    dy = dy - de * cy
    dz = dz - de * cz
    dcx = dcx - de * x
    dcy = dcy - de * y
    dcz = dcz - de * z

    return (dx, dy, dz, dcx, dcy, dcz), dc_ray, dt_ray, dmu_ray


_EPS_CLIP = 1e-7
_HALF_PI = math.pi / 2.0


# Mosaic lowers no inverse-trig primitives, so acos is built from scratch:
# acos(u) = 2 atan(w), w = sqrt((1-u)/(1+u)) ∈ [0, 1] for u ∈ [0, 1], with
# atan approximated by an odd degree-17 least-squares polynomial on [0, 1]
# (max error 2e-8; the assembled f32 acos is exact to ~3 ulp — validated in
# tests against jnp.arccos).
_ATAN_COEFS = (
    0.9999998999940906, -0.3333267446706789, 0.19987155360552825,
    -0.14170082701091266, 0.10531722142762913, -0.07302857152572637,
    0.04057691209386289, -0.014891471622638923, 0.0025802113163714622,
)


def _acos(u):
    """arccos for u ∈ [0, 1] (our u is a clipped sqrt, always ≥ 0)."""
    w = jnp.sqrt(jnp.maximum((1.0 - u) / (1.0 + u), 0.0))
    w2 = w * w
    h = jnp.full_like(w, _ATAN_COEFS[-1])
    for coef in _ATAN_COEFS[-2::-1]:
        h = h * w2 + coef
    return 2.0 * h * w


def _theta_norm(cos2, ok_end):
    """Normalized incidence angle with pinned failed lanes — must match
    ``ops.trace._agg_entry`` bit for bit (same guards)."""
    pos = cos2 > 0
    safe = jnp.where(pos, jnp.sqrt(jnp.where(pos, cos2, 1.0)), 0.0)
    theta = _acos(jnp.clip(safe, -1.0 + _EPS_CLIP,
                           1.0 - _EPS_CLIP)) / _HALF_PI
    return jnp.where(ok_end, theta, 1.0)


def _theta_norm_adjoint(cos2, ok_end, dpen):
    """d(theta_norm)/d(cos2) * dpen, zero on pinned/clipped lanes."""
    pos = cos2 > 0
    u = jnp.sqrt(jnp.where(pos, cos2, 1.0))
    active = ok_end & pos & (u < 1.0 - _EPS_CLIP)
    # d theta/du = -1/sqrt(1-u^2); du/dcos2 = 1/(2u)
    denom = jnp.sqrt(jnp.where(active, 1.0 - u * u, 1.0))
    d = -dpen / (_HALF_PI * denom * 2.0 * u)
    return jnp.where(active, d, 0.0)


def _kill_backward(kill, t_k, x, y, z, cx, cy, cz, ok):
    """Apply the reference's allow_backward_rays=False semantics after a
    surface step: backward rays are failed and reset before the z -= t
    re-centering (`ray_tracing_lite.py:629-639`) — so their z lands at -t."""
    ok = ok & ~kill
    x = jnp.where(kill, 0.0, x)
    y = jnp.where(kill, 0.0, y)
    z = jnp.where(kill, -t_k, z)
    cx = jnp.where(kill, 0.0, cx)
    cy = jnp.where(kill, 0.0, cy)
    cz = jnp.where(kill, 1.0, cz)
    return x, y, z, cx, cy, cz, ok


def _hinge(delta, lo, hi):
    """Path-bound hinge max(lo - d, 0) + max(d - hi, 0); lo/hi are static
    python floats (±inf disables a side) — matches
    ``simulator.compute_ray_path_penalty``."""
    pen = jnp.zeros_like(delta)
    if lo != -math.inf:
        pen = pen + jnp.maximum(lo - delta, 0.0)
    if hi != math.inf:
        pen = pen + jnp.maximum(delta - hi, 0.0)
    return pen


def _hinge_grad(delta, lo, hi):
    """d(_hinge)/d(delta): -1 below lo, +1 above hi, 0 inside."""
    g = jnp.zeros_like(delta)
    if lo != -math.inf:
        g = g - (delta < lo).astype(jnp.float32)
    if hi != math.inf:
        g = g + (delta > hi).astype(jnp.float32)
    return g


def _fwd_kernel(n_surf, w, rows, penalties, allow_backward, path_bounds,
                angle_thr, n_per_w, z0_ref, c_ref, t_ref, mu_ref, *refs):
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
    i = pl.program_id(0)
    widx = _widx(i, rows, w, n_per_w)
    x = xp_ref[...]
    y = yp_ref[...]
    cy = cy_ref[...]
    z = jnp.full(x.shape, z0_ref[0, 0])
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
        mu = _mu_of(mu_ref, k, widx, w)
        (x, y, z, cx, cy, cz, ok2), loc = _fwd_surface(
            c_ref[k], t_ref[k], mu, x, y, z, cx, cy, cz, ok)
        if opl_mode:
            # OPL leg k travels in the medium BEFORE surface k, n_ref[k]
            # (the "dist" aggregate semantics, `ops.trace.trace_skew`;
            # consumed by ops.wavefront.optical_path_lengths).
            opl = opl + loc["dist"] * _mu_of(n_ref, k, widx, w)
        if k > 0:
            went_bw = (loc["delta_z"] < 0) & loc["ok1"]
            if allow_backward:
                bw = bw | went_bw
            else:
                x, y, z, cx, cy, cz, ok2 = _kill_backward(
                    went_bw, t_ref[k], x, y, z, cx, cy, cz, ok2)
        ok = ok2
        if lu:
            pen_th = pen_th + _theta_norm(loc["cos2"], ok)
            pen_tp = pen_tp + _theta_norm(loc["cos2p"], ok)
            pen_z = pen_z + jnp.maximum(z, 0.0)
        if full:
            # Angle hinge on both raw cos² locals
            # (`optics_simulator_lite.py:641-643`).
            pen_ang = (pen_ang + jnp.maximum(angle_thr - loc["cos2"], 0.0)
                       + jnp.maximum(angle_thr - loc["cos2p"], 0.0))
            # Path hinge on the absolute inter-vertex ray Δz
            # (`optics_simulator_lite.py:615-638`): abs_z_k = z_k + ref_z[k].
            if k > 0:
                delta = (z + ref_ref[0, k]) - (z_prev + ref_ref[0, k - 1])
                pen_path = pen_path + _hinge(delta, *path_bounds[k - 1])
            z_prev = z
    if full:
        # Image-plane entry: z_stack[S] == 0 in its own frame,
        # ref_z[S] repeats the last vertex (`optics_simulator_lite.py:624`).
        delta = ref_ref[0, n_surf] - (z_prev + ref_ref[0, n_surf - 1])
        pen_path = pen_path + _hinge(delta, *path_bounds[n_surf - 1])

    # transfer to image plane
    delta_z = -z
    dist = delta_z / cz
    x = x + dist * cx
    y = y + dist * cy
    if opl_mode:
        # Final leg: last surface -> image plane, in the image-space medium
        # n_ref[S] (air for every shipped system).
        opl = opl + dist * _mu_of(n_ref, n_surf, widx, w)
    if allow_backward:
        bw = bw | ((delta_z < 0) & ok)
    else:
        ok = ok & ~((delta_z < 0) & ok)

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



# Locals stashed by the backward kernel's forward pass (so the reverse loop
# applies the adjoint without recomputation). Order is load-bearing.
_LOC_F32 = ("cos", "cosp", "g", "denom", "dist", "temp", "m2", "e",
            "xB", "yB", "cxB", "cyB", "cxC", "cyC", "czC", "cos2", "cos2p")
_LOC_BOOL = ("ok1", "fail1", "fail2a", "fail2")
_N_LOC_F32 = len(_LOC_F32)
_N_LOC_BOOL = len(_LOC_BOOL)


def _bwd_kernel(n_surf, w, rows, penalties, allow_backward, path_bounds,
                angle_thr, n_per_w, z0_ref, c_ref, t_ref, mu_ref, *rest):
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
    i = pl.program_id(0)
    widx = _widx(i, rows, w, n_per_w)

    # ---- recompute forward, stashing pre-surface states in VMEM ----
    x = xp_ref[...]
    y = yp_ref[...]
    cy = cyin_ref[...]
    z = jnp.full(x.shape, z0_ref[0, 0])
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
        mu = _mu_of(mu_ref, k, widx, w)
        (x, y, z, cx, cy, cz, ok), loc = _fwd_surface(
            c_ref[k], t_ref[k], mu, x, y, z, cx, cy, cz, ok)
        if not allow_backward and k > 0:
            x, y, z, cx, cy, cz, ok = _kill_backward(
                (loc["delta_z"] < 0) & loc["ok1"], t_ref[k],
                x, y, z, cx, cy, cz, ok)
        for li, name in enumerate(_LOC_F32):
            st_locf[li, k] = loc[name]
        for li, name in enumerate(_LOC_BOOL):
            st_locb[li, k] = loc[name]

    # ---- image-transfer adjoint ----
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
        ddist = ddist + dopl * _mu_of(n_ref, n_surf, widx, w)
    dz = -ddist / cz
    dcz = ddist * (z / (cz * cz))
    dx = dx_img
    dy = dy_img

    # Param-grad outputs are shared across the (sequential) TPU grid:
    # zero them on the first tile, accumulate on the rest.
    @pl.when(i == 0)
    def _():
        dz0_out[0, 0] = 0.0
        for k in range(n_surf):
            dc_out[0, k] = 0.0
            dt_out[0, k] = 0.0
            for wi in range(w):
                dmu_out[0, k, wi] = 0.0
        if full:
            for k in range(n_surf + 1):
                dref_out[0, k] = 0.0
        if opl_mode:
            for k in range(n_surf + 1):
                for wi in range(w):
                    dn_out[0, k, wi] = 0.0

    if opl_mode:
        for wi in range(w):
            dn_out[0, n_surf, wi] += jnp.sum(
                jnp.where(widx == wi, dopl * dist_f, 0.0))

    if lu:
        dpth = dpth_ref[...]
        dptp = dptp_ref[...]
        dpz = dpz_ref[...]
    if full:
        dppath = dppath_ref[...]
        dpang = dpang_ref[...]

        def zpost(m):
            """Post-surface-m z state (st_z holds pre-states)."""
            return st_z[m + 1] if m + 1 < n_surf else z

        def hinge_cot(j):
            """dppath · d(hinge_j)/d(delta_j) for path gap j."""
            if j == n_surf - 1:
                delta = ref_ref[0, n_surf] - (zpost(n_surf - 1)
                                              + ref_ref[0, n_surf - 1])
            else:
                delta = ((zpost(j + 1) + ref_ref[0, j + 1])
                         - (zpost(j) + ref_ref[0, j]))
            return dppath * _hinge_grad(delta, *path_bounds[j])

    # ---- reverse surface loop over the stashed locals (no recompute) ----
    for k in range(n_surf - 1, -1, -1):
        pre = (st_x[k], st_y[k], st_z[k], st_cx[k], st_cy[k], st_cz[k],
               st_ok[k])
        mu = _mu_of(mu_ref, k, widx, w)
        loc = {name: st_locf[li, k] for li, name in enumerate(_LOC_F32)}
        loc.update({name: st_locb[li, k]
                    for li, name in enumerate(_LOC_BOOL)})
        kill = None
        if not allow_backward and k > 0:
            # delta_z = dist * cz_pre (matches _fwd_surface)
            kill = (loc["dist"] * st_cz[k] < 0) & loc["ok1"]
        dcos2_extra = dcos2p_extra = ddist_extra = None
        if opl_mode:
            # opl += dist_k * n_k (pre-kill accumulation in the forward, so
            # no kill masking here — matching _fwd_kernel's order).
            ddist_extra = dopl * _mu_of(n_ref, k, widx, w)
            for wi in range(w):
                dn_out[0, k, wi] += jnp.sum(
                    jnp.where(widx == wi, dopl * loc["dist"], 0.0))
        if lu:
            ok_end = loc["ok1"] & ~loc["fail2"]
            if kill is not None:
                ok_end = ok_end & ~kill
            # z_next = zD - t with zD = where(ok2, zB, 0); zB is the state z
            # BEFORE the next surface = st_z[k+1] (or the post-loop z).
            z_next = st_z[k + 1] if k + 1 < n_surf else z
            # pen_z += relu(z_next): inject into the incoming z adjoint.
            dz = dz + dpz * (z_next > 0)
            dcos2_extra = _theta_norm_adjoint(loc["cos2"], ok_end, dpth)
            dcos2p_extra = _theta_norm_adjoint(loc["cos2p"], ok_end, dptp)
        if full:
            # Path-penalty adjoint: z_state_k enters delta_{k-1} (+) and
            # delta_k (−); ref_z mirrors the same pattern, accumulated as a
            # differentiable kernel output (host chains it into cumsum(t)).
            hp_k = hinge_cot(k)
            dz = dz - hp_k
            if k > 0:
                dz = dz + hinge_cot(k - 1)
            dref_out[0, k + 1] += jnp.sum(hp_k)
            dref_out[0, k] += -jnp.sum(hp_k)
            # Angle-penalty adjoint on the raw cos² locals.
            dcos2_extra = dcos2_extra - dpang * (
                loc["cos2"] < angle_thr).astype(jnp.float32)
            dcos2p_extra = dcos2p_extra - dpang * (
                loc["cos2p"] < angle_thr).astype(jnp.float32)
        dt_kill = None
        if kill is not None:
            # Adjoint of _kill_backward: killed lanes got z = -t (dz flows to
            # dt) and zeroed state (all other cotangents cut).
            dt_kill = -jnp.sum(jnp.where(kill, dz, 0.0))
            dx = jnp.where(kill, 0.0, dx)
            dy = jnp.where(kill, 0.0, dy)
            dz = jnp.where(kill, 0.0, dz)
            dcx = jnp.where(kill, 0.0, dcx)
            dcy = jnp.where(kill, 0.0, dcy)
            dcz = jnp.where(kill, 0.0, dcz)
        (dx, dy, dz, dcx, dcy, dcz), dc_ray, dt_ray, dmu_ray = _bwd_surface(
            c_ref[k], t_ref[k], mu, pre, loc, (dx, dy, dz, dcx, dcy, dcz),
            dcos2_extra, dcos2p_extra, ddist_extra)
        dt_k = jnp.sum(dt_ray)
        if dt_kill is not None:
            dt_k = dt_k + dt_kill
        dc_out[0, k] += jnp.sum(dc_ray)
        dt_out[0, k] += dt_k
        for wi in range(w):
            dmu_out[0, k, wi] += jnp.sum(
                jnp.where(widx == wi, dmu_ray, 0.0))

    # ---- launch adjoint: cz0 = sqrt(1 - cy^2), cx0 = 0 (constant) ----
    dcy = dcy + dcz * (-cy / cz0)
    dxp_out[...] = dx
    dyp_out[...] = dy
    dcyin_out[...] = dcy
    dz0_out[0, 0] += jnp.sum(dz)


def _pad_len(n: int, rows: int) -> int:
    tile = rows * LANES
    return int(math.ceil(n / tile) * tile)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def trace_fused(xp, yp, cy, z0, c, t, mu, rows=DEFAULT_ROWS,
                penalties=False, allow_backward=True, n_per_w=None):
    """Fused spherical trace of a flat ray block on one chip.

    Args:
      xp, yp: (N,) absolute pupil coordinates.
      cy: (N,) launch direction sine (per-ray field angle).
      z0: scalar entrance-pupil axial position.
      c, t: (S,) curvatures / thicknesses.
      mu: (S, W) index-ratio table; ray i uses column i % W.
      penalties: also accumulate the unsupervised-loss penalty terms
        in-kernel (sums over surfaces of theta_norm, theta_prime_norm,
        relu(z) per ray) — the whole Lu objective then never materializes
        per-surface stacks in HBM.
      allow_backward: False applies the reference's backward-ray *removal*
        (`ray_tracing_lite.py:629-632`) instead of bookkeeping.

    Returns (x, y, cx, cy, ray_ok, ray_backward[, pen_theta, pen_theta_p,
    pen_zrelu]), each (N,).
    """
    return _run_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties,
                    allow_backward, n_per_w=n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def trace_fused_full(xp, yp, cy, z0, c, t, mu, ref_z, rows=DEFAULT_ROWS,
                     allow_backward=True, path_bounds=(), angle_thr=0.25,
                     n_per_w=None):
    """``trace_fused`` with the FULL weighted-loss penalty set accumulated
    in-kernel: the Lu terms plus the ray-path hinge (vs ``ref_z`` absolute
    vertex positions and static per-gap ``path_bounds`` (lo, hi) tuples,
    `optics_simulator_lite.py:615-638`) and the ray-angle hinge vs static
    ``angle_thr`` = cos²(threshold) (`optics_simulator_lite.py:641-643`).

    ``ref_z`` is (S+1,) differentiable (host passes cumsum(t) + repeat-last
    and chains the returned cotangent). Returns the 6 trace outputs plus
    (pen_theta, pen_theta_p, pen_zrelu, pen_path, pen_angle), each (N,).
    """
    return _run_fwd(xp, yp, cy, z0, c, t, mu, rows, "full", allow_backward,
                    ref_z, path_bounds, angle_thr, n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def trace_fused_opl(xp, yp, cy, z0, c, t, mu, n_legs, rows=DEFAULT_ROWS,
                    allow_backward=True, n_per_w=None):
    """``trace_fused`` with an in-kernel optical-path-length accumulator:
    per ray, OPL = Σ_k n_legs[k]·dist_k over the surface legs plus the
    final image leg in n_legs[S] — the fused form of the XLA engine's
    ``aggregate=("dist",)`` contraction that ``ops.wavefront`` consumes
    (reference aggregate semantics: `ray_tracing.py:637-646`), without
    ever materializing the (S+1, N) stack in HBM.

    ``n_legs`` is the differentiable (S+1, W) per-leg refractive-index
    table (air row first). Returns the 6 trace outputs plus ``opl`` (N,).
    The launch plane-wave phase (y_p·sin u) is NOT included — add it
    host-side (it needs the pre-trace pupil coordinates)."""
    return _run_fwd(xp, yp, cy, z0, c, t, mu, rows, "opl", allow_backward,
                    n_per_w=n_per_w, n_legs=n_legs)


def _run_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties, allow_backward,
             ref_z=None, path_bounds=None, angle_thr=None, n_per_w=None,
             n_legs=None):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    n = xp.shape[0]
    n_surf = c.shape[0]
    w = mu.shape[1]
    n_pad = _pad_len(n, rows)
    pad = lambda a: jnp.pad(a, (0, n_pad - n)) if n_pad != n else a
    xp2 = pad(xp).reshape(-1, LANES)
    yp2 = pad(yp).reshape(-1, LANES)
    cy2 = pad(cy).reshape(-1, LANES)
    n_rows = xp2.shape[0]
    grid = (n_rows // rows,)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_f32 = (4 + (1 if opl_mode else 0)
             + (3 if penalties and not opl_mode else 0) + (2 if full else 0))
    out_shapes = (
        [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.bool_)] * 2
        + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * (n_f32 - 4))

    ref_in = []
    if full:
        ref_in = [jnp.reshape(ref_z, (1, -1)).astype(jnp.float32)]
    elif opl_mode:
        ref_in = [n_legs.astype(jnp.float32)]       # (S+1, W) SMEM table

    outs = pl.pallas_call(
        partial(_fwd_kernel, n_surf, w, rows, penalties, allow_backward,
                path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[smem] * (4 + len(ref_in)) + [ray_spec] * 3,
        out_specs=tuple([ray_spec] * len(out_shapes)),
        out_shape=tuple(out_shapes),
    )(jnp.reshape(z0, (1, 1)).astype(jnp.float32),
      c.astype(jnp.float32), t.astype(jnp.float32), mu.astype(jnp.float32),
      *ref_in, xp2, yp2, cy2)

    unpad = lambda a: a.reshape(-1)[:n]
    return tuple(unpad(o) for o in outs)


def _fused_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties, allow_backward,
               n_per_w):
    out = _run_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties, allow_backward,
                   n_per_w=n_per_w)
    return out, (xp, yp, cy, z0, c, t, mu)


def _fused_full_fwd(xp, yp, cy, z0, c, t, mu, ref_z, rows, allow_backward,
                    path_bounds, angle_thr, n_per_w):
    out = _run_fwd(xp, yp, cy, z0, c, t, mu, rows, "full", allow_backward,
                   ref_z, path_bounds, angle_thr, n_per_w)
    return out, (xp, yp, cy, z0, c, t, mu, ref_z)


def _run_bwd(residuals, cotangents, rows, penalties, allow_backward,
             path_bounds=None, angle_thr=None, n_per_w=None):
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

    n = xp.shape[0]
    n_surf = c.shape[0]
    w = mu.shape[1]
    n_pad = _pad_len(n, rows)
    pad = lambda a: jnp.pad(a, (0, n_pad - n)) if n_pad != n else a
    as2d = lambda a: pad(a).reshape(-1, LANES)
    xp2, yp2, cy2 = as2d(xp), as2d(yp), as2d(cy)
    dx2, dy2 = as2d(dx), as2d(dy)
    dcx2, dcy2 = as2d(dcx), as2d(dcy)
    pen_in = []
    if opl_mode:
        pen_in = [as2d(dopl)]
    elif penalties:
        pen_in = [as2d(dpth), as2d(dptp), as2d(dpz)]
    if full:
        pen_in += [as2d(dppath), as2d(dpang)]
    n_rows = xp2.shape[0]
    n_tiles = n_rows // rows
    grid = (n_tiles,)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Param-grad outputs: whole-array SMEM blocks shared by every grid step
    # (TPU grids are sequential), accumulated in-kernel. Scalars cannot be
    # stored to VMEM, and partial blocks in SMEM must match the array shape.
    scalar_tile = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (0,) + (0,) * len(shape),
        memory_space=pltpu.SMEM)

    out_shape = [
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # dxp
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # dyp
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # dcy
        jax.ShapeDtypeStruct((1, 1), jnp.float32),           # dz0
        jax.ShapeDtypeStruct((1, n_surf), jnp.float32),      # dc
        jax.ShapeDtypeStruct((1, n_surf), jnp.float32),      # dt
        jax.ShapeDtypeStruct((1, n_surf, w), jnp.float32),   # dmu
    ]
    out_specs = [
        ray_spec, ray_spec, ray_spec,
        scalar_tile((1,)),
        scalar_tile((n_surf,)),
        scalar_tile((n_surf,)),
        scalar_tile((n_surf, w)),
    ]
    ref_in = []
    if full:
        out_shape.append(
            jax.ShapeDtypeStruct((1, n_surf + 1), jnp.float32))  # dref_z
        out_specs.append(scalar_tile((n_surf + 1,)))
        ref_in = [jnp.reshape(ref_z, (1, -1)).astype(jnp.float32)]
    elif opl_mode:
        out_shape.append(
            jax.ShapeDtypeStruct((1, n_surf + 1, w), jnp.float32))  # dn_legs
        out_specs.append(scalar_tile((n_surf + 1, w)))
        ref_in = [n_legs.astype(jnp.float32)]

    scratch = [pltpu.VMEM((n_surf, rows, LANES), jnp.float32)
               for _ in range(6)]
    scratch.append(pltpu.VMEM((n_surf, rows, LANES), jnp.bool_))
    scratch.append(pltpu.VMEM((_N_LOC_F32, n_surf, rows, LANES), jnp.float32))
    scratch.append(pltpu.VMEM((_N_LOC_BOOL, n_surf, rows, LANES), jnp.bool_))

    outs = pl.pallas_call(
        partial(_bwd_kernel, n_surf, w, rows, penalties, allow_backward,
                path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[smem] * (4 + len(ref_in))
        + [ray_spec] * (7 + len(pen_in)),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
    )(jnp.reshape(z0, (1, 1)).astype(jnp.float32),
      c.astype(jnp.float32), t.astype(jnp.float32), mu.astype(jnp.float32),
      *ref_in, xp2, yp2, cy2, dx2, dy2, dcx2, dcy2, *pen_in)

    if full or opl_mode:
        dxp2, dyp2, dcy2_out, dz0_p, dc_p, dt_p, dmu_p, dref_p = outs
    else:
        dxp2, dyp2, dcy2_out, dz0_p, dc_p, dt_p, dmu_p = outs
        dref_p = None
    unpad = lambda a: a.reshape(-1)[:n]
    dxp = unpad(dxp2)
    dyp = unpad(dyp2)
    dcy_out = unpad(dcy2_out)
    dz0 = dz0_p.reshape(jnp.shape(z0))
    grads = (dxp, dyp, dcy_out, dz0, dc_p[0], dt_p[0], dmu_p[0])
    if full:
        grads = grads + (dref_p[0].reshape(jnp.shape(ref_z)),)
    elif opl_mode:
        grads = grads + (dref_p[0].reshape(jnp.shape(n_legs)),)
    return grads


def _fused_bwd(rows, penalties, allow_backward, n_per_w, residuals,
               cotangents):
    return _run_bwd(residuals, cotangents, rows, penalties, allow_backward,
                    n_per_w=n_per_w)


def _fused_full_bwd(rows, allow_backward, path_bounds, angle_thr, n_per_w,
                    residuals, cotangents):
    return _run_bwd(residuals, cotangents, rows, "full", allow_backward,
                    path_bounds, angle_thr, n_per_w)


def _fused_opl_fwd(xp, yp, cy, z0, c, t, mu, n_legs, rows, allow_backward,
                   n_per_w):
    out = _run_fwd(xp, yp, cy, z0, c, t, mu, rows, "opl", allow_backward,
                   n_per_w=n_per_w, n_legs=n_legs)
    return out, (xp, yp, cy, z0, c, t, mu, n_legs)


def _fused_opl_bwd(rows, allow_backward, n_per_w, residuals, cotangents):
    return _run_bwd(residuals, cotangents, rows, "opl", allow_backward,
                    n_per_w=n_per_w)


trace_fused.defvjp(_fused_fwd, _fused_bwd)
trace_fused_full.defvjp(_fused_full_fwd, _fused_full_bwd)
trace_fused_opl.defvjp(_fused_opl_fwd, _fused_opl_bwd)


# ---------------------------------------------------------------------------
# High-level wrapper mirroring trace_rays for the flagship configuration.
# ---------------------------------------------------------------------------


def _assert_fused_config(lens, config):
    assert len(lens) == 1, "fused kernel is single-system; use ops.trace"
    assert bool(np.all(lens.structure.mask)), (
        "fused kernel expects no padded surfaces; compress the tail first "
        "(compress_padded_tail)")
    assert not config.double_precision, (
        "fused kernel is float32; double_precision needs ops.trace")


def compress_padded_tail(lens):
    """Strip trailing padded surface slots from a single-system Lens.

    Padded slots are static (mask is host numpy) and sit at the tail; the
    XLA engine traces through them as flat/air identity surfaces, which the
    fused kernels skip instead. x/y/ray_ok/gradients are identical; the only
    divergence is ``ray_backward`` flags on already-past-focus rays, which
    the padded XLA chain raises at the first dummy slot and the compressed
    chain raises at the image transfer — the same predicate (see
    `ray_tracing_lite.py:625-670` mask handling)."""
    from torchoptics_tpu.models.structure import Lens, Structure
    st = lens.structure
    if bool(np.all(st.mask)):
        return lens
    assert len(lens) == 1, "tail compression is for single-system lenses"
    n = int(st.n_surfaces[0])
    new_st = Structure(st.stop_idx, st.sequence)
    return Lens(new_st, lens.c[:, :n], lens.t[:, :n],
                lens.nd[:, :n], lens.v[:, :n],
                kappa=None if lens.kappa is None else lens.kappa[:, :n],
                asph=None if lens.asph is None else lens.asph[:, :n])


def prepare_fused_inputs(specs, lens, config, key=None, xy=None,
                         use_vig=True, w_order="inner"):
    """Shared front-end for the fused wrappers (spherical and asphere):
    dispersion, pupil placement, sampling, vignetting, ray aiming (jnp
    engine, stop-gradient), EPD scaling, and the flatten to the kernel's ray
    order.

    ``w_order="inner"`` (default) flattens a broadcast (F, P, W) block —
    wavelength innermost, matching ``trace_rays``'s result layout but
    costing a strided relayout on TPU (W=3 lands in the 128-lane minor
    dim). ``w_order="outer"`` flattens (W, F, P) — a relayout-free
    broadcast (~10× cheaper front-end); pair it with the kernels'
    ``n_per_w=F*P`` wavelength indexing and the flat-layout reductions
    (``rms2d_flat_wouter``).

    Returns (xp_flat, yp_flat, cy_flat, z0, mu, (1, F, P, W))."""
    from torchoptics_tpu.ops import abcd as abcd_mod
    from torchoptics_tpu.ops import pupil as pupil_mod

    n = lens.get_refractive_indices(config.wavelengths)  # (1, S, W)
    n_full = jnp.concatenate((jnp.ones_like(n[:, :1, :]), n), axis=1)
    mu = n_full[0, :-1, :] / n_full[0, 1:, :]  # (S, W)

    z0 = abcd_mod.compute_pupil_position(lens)[0]

    if xy is None:
        xp_rel, yp_rel = pupil_mod.sample_pupil(
            config.mode, config.n_rays, 1, key=key)
    else:
        xp_rel, yp_rel = xy

    F = len(config.rel_fields)
    W = len(config.wavelengths)

    if w_order == "outer":
        # Fast path: everything between pupil sampling and the kernel —
        # vignetting, the aiming correction, EPD scaling — is AFFINE in the
        # pupil coordinates, separately in x and y (`apply_vignetting` is
        # scale+offset, `ray_aiming`'s closure is built from 3 tee rays and
        # applies per-(field, λ) scale/offset, `scale_to_epd` is a scalar
        # multiply). So instead of mapping the big (F, P, W) block through
        # that chain (which materializes W-minor intermediates whose flatten
        # is a ~10× slower strided relayout), evaluate the chain on two
        # (1, F, 1, W) probes to extract the per-(field, λ) affine
        # coefficients, and apply them once while building the (W, F, P)
        # block — whose P-minor flatten is relayout-free.
        assert xp_rel.shape[0] == 1 and xp_rel.shape[1] == 1 \
            and xp_rel.shape[3] == 1, (
                "w_order='outer' needs plain (1, 1, P, 1) pupil samples")
        px = xp_rel[0, 0, :, 0]                                 # (P,)
        py = yp_rel[0, 0, :, 0]
        P = px.shape[0]

        def chain(vx, vy):
            if use_vig and config.vig_fn is not None and config.mode != "chief":
                fields = jnp.asarray(config.rel_fields, jnp.float32)[None, :]
                vig_up = config.vig_fn(fields, specs.vig_up)
                vig_down = config.vig_fn(fields, specs.vig_down)
                vig_x = config.vig_fn(fields, specs.vig_x)
                vy = pupil_mod.apply_vignetting(vy, vig_up, vig_down)
                vx = pupil_mod.apply_vignetting(vx, vig_x, vig_x)
            if config.n_ray_aiming_iter > 0:
                from torchoptics_tpu.ops import aiming
                fn = aiming.ray_aiming(specs, lens.detach(), config, use_vig)
                vx, vy = fn(vx, vy)
            return vx, vy

        zero = jnp.zeros((1, F, 1, W), jnp.float32)
        one = jnp.ones((1, F, 1, W), jnp.float32)
        ox, oy = chain(zero, zero)
        sx, sy = chain(one, one)
        sx = sx - ox
        sy = sy - oy
        wf = lambda a: jnp.broadcast_to(a, (1, F, 1, W))[0, :, 0, :].T[
            :, :, None]                                         # (W, F, 1)
        xrel = px[None, None, :] * wf(sx) + wf(ox)              # (W, F, P)
        yrel = py[None, None, :] * wf(sy) + wf(oy)
        if config.n_ray_aiming_iter > 0:
            # Same clamp + constant treatment as the jnp engine
            # (`ray_tracing_lite.py:108-110`).
            xrel = jax.lax.stop_gradient(jnp.clip(xrel, -2.0, 2.0))
            yrel = jax.lax.stop_gradient(jnp.clip(yrel, -2.0, 2.0))
        half_epd = specs.epd[0] / 2.0
        xpb = xrel * half_epd
        ypb = yrel * half_epd
        u = specs.hfov[:, None] * jnp.asarray(config.rel_fields,
                                              jnp.float32)[None, :]
        cyb = jnp.broadcast_to(jnp.sin(u)[0][None, :, None], (W, F, P))
        return (xpb.reshape(-1), ypb.reshape(-1), cyb.reshape(-1), z0, mu,
                (1, F, P, W))

    if use_vig and config.vig_fn is not None and config.mode != "chief":
        # Same pre-kernel vignetting as the jnp engine
        # (`ray_tracing.py:96-103`).
        fields = jnp.asarray(config.rel_fields, jnp.float32)[None, :]
        vig_up = config.vig_fn(fields, specs.vig_up)
        vig_down = config.vig_fn(fields, specs.vig_down)
        vig_x = config.vig_fn(fields, specs.vig_x)
        yp_rel = pupil_mod.apply_vignetting(yp_rel, vig_up, vig_down)
        xp_rel = pupil_mod.apply_vignetting(xp_rel, vig_x, vig_x)

    if config.n_ray_aiming_iter > 0:
        from torchoptics_tpu.ops import aiming
        aiming_fn = aiming.ray_aiming(specs, lens.detach(), config, use_vig)
        xp_rel, yp_rel = [jax.lax.stop_gradient(jnp.clip(v, -2.0, 2.0))
                          for v in aiming_fn(xp_rel, yp_rel)]

    xp = pupil_mod.scale_to_epd(xp_rel, specs.epd)
    yp = pupil_mod.scale_to_epd(yp_rel, specs.epd)

    u = specs.hfov[:, None] * jnp.asarray(config.rel_fields,
                                          jnp.float32)[None, :]
    cy = jnp.sin(u)[0]  # (F,)

    P = xp.shape[2]
    # Broadcast to the (F, P, W) block, wavelength innermost, then flatten.
    xpb = jnp.broadcast_to(xp, (1, F, xp.shape[2], W))[0]
    ypb = jnp.broadcast_to(yp, (1, F, yp.shape[2], W))[0]
    cyb = jnp.broadcast_to(cy[:, None, None], (F, P, W))
    return (xpb.reshape(-1), ypb.reshape(-1), cyb.reshape(-1), z0, mu,
            (1, F, P, W))


def package_fused_result(outs, shape, penalties, w_order="inner"):
    """Package flat kernel outputs as the (1, F, P, W) TraceResult.

    ``w_order="inner"``: plain reshape of W-inner flat outputs.
    ``w_order="outer"``: the flat outputs are (W, F, P)-ordered; emit the
    packaged block via an output-side transpose. Measured 2.4× faster
    end-to-end at 2.46M rays than tracing in the W-inner layout
    (`benchmarks/probe_packaging.py`): the input-side broadcast relayout
    the W-inner front-end pays dwarfs this one output transpose."""
    from torchoptics_tpu.ops import trace as trace_mod
    _, F, P, W = shape
    if w_order == "outer":
        pack = lambda a: jnp.transpose(a.reshape(W, F, P), (1, 2, 0))[None]
    else:
        pack = lambda a: a.reshape(shape)
    x, y, cx, cy_out, ok, bw = outs[:6]
    result = trace_mod.TraceResult(
        pack(x), pack(y), pack(cx), pack(cy_out), pack(ok), pack(bw), None)
    if penalties:
        return result, tuple(pack(p) for p in outs[6:])
    return result


def _wouter_ok(xy) -> bool:
    """The W-outer front-end needs plain (·, 1, P, 1) pupil samples (its
    affine probes factor the per-(field, λ) chain); default sampling always
    satisfies this — explicit ``xy`` must match to take the fast layout."""
    if xy is None:
        return True
    xp = xy[0]
    return xp.ndim == 4 and xp.shape[1] == 1 and xp.shape[3] == 1


def trace_rays_fused(specs, lens, config, key: Optional[jax.Array] = None,
                     xy: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                     rows: int = DEFAULT_ROWS, penalties: bool = False,
                     use_vig: bool = True):
    """``trace_rays`` on the fused Pallas kernel (B == 1, spherical).

    Ray aiming (if configured) runs on the jnp engine — it is a tiny tee-ray
    solve whose output is stop-gradient — and feeds the fused kernel.
    Vignetting, ``allow_backward_rays=False``, and padded surface tails are
    all supported (the tail is compressed away host-side).
    Returns a ``TraceResult`` shaped (1, F, P, W) like the jnp engine; with
    ``penalties`` it returns ``(TraceResult, (pen_theta, pen_theta_p,
    pen_zrelu))`` where each penalty is the per-ray sum over surfaces.

    Internally traces in the relayout-free W-outer layout and transposes
    the outputs into the packaged (F, P, W) contract
    (`ray_tracing_lite.py:80-127`) — 2.4× the end-to-end rate of tracing
    W-inner at 2.46M rays (`benchmarks/probe_packaging.py`).
    """
    assert lens.is_spherical, "fused kernel is spherical; use ops.trace"
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, config)
    w_order = "outer" if _wouter_ok(xy) else "inner"
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order=w_order)
    _, F, P, W = shape
    outs = trace_fused(xp, yp, cyb, z0, lens.c[0], lens.t[0], mu, rows,
                       penalties, config.allow_backward_rays,
                       F * P if w_order == "outer" else None)
    return package_fused_result(outs, shape, penalties, w_order)


def rms2d_flat_wouter(y_flat, ok_flat, F, P, W):
    """``metrics.compute_rms2d`` (B=1) on flat wavelength-OUTERMOST kernel
    outputs — all reductions run on a (W, F, P) view whose minor axis is the
    large contiguous P, so no (F, P, W) relayout ever materializes (that
    relayout costs more than the fused forward kernel itself).

    Semantics bit-match `ray_tracing_lite.py:678-702` / compute_rms2d: the
    per-(field, wavelength) centroid is the plain mean over ALL rays, the
    squared deviations sum over valid rays only, the denominator counts all
    rays."""
    y3 = y_flat.reshape(W, F, P)
    ok3 = ok_flat.reshape(W, F, P)
    ycent = jnp.mean(y3, axis=2)                     # (W, F)
    ymean = jnp.mean(ycent, axis=0)                  # (F,)
    dev2 = jnp.where(ok3, (y3 - ymean[None, :, None]) ** 2, 0.0)
    ss = jnp.sum(dev2, axis=(0, 2))                  # (F,)
    pos = ss > 0
    rms_f = jnp.where(pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / (P * W)), 0.0)
    return jnp.mean(rms_f)


def spot_rms_xy_flat_wouter(x_flat, y_flat, ok_flat, F, P, W):
    """``metrics.compute_spot_rms_xy`` (B=1), field-mean, on flat
    wavelength-OUTERMOST kernel outputs — same relayout-free (W, F, P)
    reduction layout as ``rms2d_flat_wouter``. Masked centroid, masked
    count denominator, gradient-safe sqrt (see the metrics docstring)."""
    x3 = x_flat.reshape(W, F, P)
    y3 = y_flat.reshape(W, F, P)
    ok3 = ok_flat.reshape(W, F, P)
    w = ok3.astype(x3.dtype)
    count = jnp.maximum(jnp.sum(w, axis=(0, 2)), 1.0)       # (F,)
    xc = jnp.sum(x3 * w, axis=(0, 2)) / count
    yc = jnp.sum(y3 * w, axis=(0, 2)) / count
    d2 = ((x3 - xc[None, :, None]) ** 2 + (y3 - yc[None, :, None]) ** 2)
    ss = jnp.sum(jnp.where(ok3, d2, 0.0), axis=(0, 2))      # (F,)
    pos = ss > 0
    rms_f = jnp.where(pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / count), 0.0)
    return jnp.mean(rms_f)


def spot_rms_flat_wouter(outs, F, P, W, spot_metric: str = "y"):
    """Dispatch the per-system spot reduction on flat W-outer kernel
    outputs: ``'y'`` = reference-parity ``rms2d_flat_wouter``; ``'xy'`` =
    radial ``spot_rms_xy_flat_wouter`` (x is ``outs[0]``)."""
    if spot_metric == "y":
        return rms2d_flat_wouter(outs[1], outs[4], F, P, W)
    if spot_metric == "xy":
        return spot_rms_xy_flat_wouter(outs[0], outs[1], outs[4], F, P, W)
    raise ValueError(f"spot metric must be 'y' or 'xy', got {spot_metric!r}")


def spot_rms_fused(specs, lens, config, key: Optional[jax.Array] = None,
                   xy: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                   rows: int = DEFAULT_ROWS, use_vig: bool = True,
                   spot_metric: str = "y"):
    """Mean RMS spot size of a single spherical system on the fused fast
    path: W-outer front-end (relayout-free) → fused kernel → flat-layout
    reduction. Numerically equal to ``compute_rms2d(trace_rays_fused(...))``
    (same math, friendlier layout); ~2× faster end-to-end because neither
    the (F, P, W) broadcast nor the result reshape ever relayouts.
    ``spot_metric='xy'`` selects the radial 2-D metric instead."""
    assert lens.is_spherical, "fused kernel is spherical; use ops.trace"
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, config)
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order="outer")
    _, F, P, W = shape
    outs = trace_fused(xp, yp, cyb, z0, lens.c[0], lens.t[0], mu, rows,
                       False, config.allow_backward_rays, F * P)
    return spot_rms_flat_wouter(outs, F, P, W, spot_metric)


def optical_paths_fused(specs, lens, config, key: Optional[jax.Array] = None,
                        xy: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                        rows: int = DEFAULT_ROWS, use_vig: bool = True):
    """``ops.wavefront.optical_path_lengths`` on the fused kernel (B == 1,
    spherical, f32): returns (TraceResult, OPL) with OPL (1, F, P, W) in mm,
    launch plane-wave phase included — same contract as the XLA path, but
    the per-surface distance stack never touches HBM (the OPL accumulates
    in-kernel with a hand-derived adjoint; fully differentiable through
    c, t, and the dispersion model)."""
    assert lens.is_spherical, "fused OPL kernel is spherical; use ops.trace"
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, config)
    n = lens.get_refractive_indices(config.wavelengths)      # (1, S, W)
    n_legs = jnp.concatenate((jnp.ones_like(n[:, :1, :]), n),
                             axis=1)[0]                      # (S+1, W)
    w_order = "outer" if _wouter_ok(xy) else "inner"
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order=w_order)
    _, F, P, W = shape
    outs = trace_fused_opl(xp, yp, cyb, z0, lens.c[0], lens.t[0], mu,
                           n_legs, rows, config.allow_backward_rays,
                           F * P if w_order == "outer" else None)
    res = package_fused_result(outs[:6], shape, False, w_order)
    # Plane-wave launch phase y_p·sin(u): yp is the absolute launch height,
    # cyb is sin(u) per ray (see ops.wavefront.optical_path_lengths).
    opl_flat = outs[6] + yp * cyb
    if w_order == "outer":
        opl = jnp.transpose(opl_flat.reshape(W, F, P), (1, 2, 0))[None]
    else:
        opl = opl_flat.reshape(shape)
    return res, opl


def _path_bounds(structure, lower, upper):
    """Static per-gap (lo, hi) hinge bounds for a single compressed system —
    the reference's air/glass/image thickness maps
    (`optics_simulator_lite.py:617-630`)."""
    lo = [(-math.inf if v is None else float(v)) for v in lower]
    hi = [(math.inf if v is None else float(v)) for v in upper]
    lo_air, lo_glass, lo_image = lo
    hi_air, hi_glass, hi_image = hi
    mask_G = structure.mask_G[0]
    S = int(structure.n_surfaces[0])
    bounds = [(lo_glass, hi_glass) if mask_G[k] else (lo_air, hi_air)
              for k in range(S)]
    bounds[S - 1] = (lo_image, hi_image)
    return tuple(bounds)


def compute_losses_fused(specs, lens, config,
                         g=None, catalog_g=None,
                         key: Optional[jax.Array] = None,
                         rows: int = DEFAULT_ROWS):
    """The FULL weighted loss (spot + ray-path + ray-angle + glass + Lu) on
    one fused kernel launch — the fused variant of
    ``simulator.compute_losses`` (`optics_simulator_lite.py:411-454` intent).
    No per-surface stack ever touches HBM: the path/angle hinges accumulate
    in-kernel with hand-derived adjoints.

    ``config`` is a ``simulator.SimulatorConfig``. Returns
    (total, loss_dict) matching the XLA path numerically (tested in
    interpret mode)."""
    from torchoptics_tpu import simulator as sim_mod

    cfg = config.trace_config()
    assert lens.is_spherical, (
        "compute_losses_fused is spherical; use simulator.compute_losses")
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, cfg)

    bounds = _path_bounds(lens.structure, config.ray_path_lower_thresholds,
                          config.ray_path_upper_thresholds)
    angle_thr = math.cos(math.radians(config.ray_angle_threshold)) ** 2

    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, cfg, key=key, w_order="outer")
    _, F, P, W = shape
    vertex_z = jnp.cumsum(lens.t[0])
    ref_z = jnp.concatenate((vertex_z, vertex_z[-1:]))

    outs = trace_fused_full(xp, yp, cyb, z0, lens.c[0], lens.t[0], mu,
                            ref_z, rows, cfg.allow_backward_rays, bounds,
                            angle_thr, F * P)
    pth, ptp, pz, ppath, pang = outs[6:]

    n_rays = shape[1] * shape[2] * shape[3]
    rms = spot_rms_flat_wouter(outs, F, P, W, config.spot_metric)
    n_sequence = int(lens.structure.n_surfaces[0])
    sumQ = (jnp.sum(pth) + jnp.sum(ptp) + jnp.sum(pz)) / n_sequence
    Lu = rms + config.penalty_rate * sumQ

    loss_dict = {
        "loss_unsup": Lu, "rms": rms, "penalty": sumQ,
        "spot_size": rms,
        # sum over gaps of the per-ray mean == total / n_rays
        # (`simulator.compute_ray_path_penalty` reduction).
        "ray_path": jnp.sum(ppath) / n_rays,
        "ray_angle": jnp.sum(pang) / n_rays,
    }
    if g is not None:
        loss_dict["glass"] = sim_mod.compute_glass_penalty(
            lens.structure, g, catalog_g)
    weights = config.loss_weights
    total = sum(loss_dict[k] * w for k, w in weights.items()
                if k in loss_dict and w is not None)
    return total, loss_dict


def unsupervised_loss_fused(specs, lens, config,
                            key: Optional[jax.Array] = None,
                            rows: int = DEFAULT_ROWS):
    """The full unsupervised lens-design objective Lu = rms + rate·ΣQ on the
    fused kernel — no per-surface stacks ever touch HBM.

    ``config`` is a ``simulator.SimulatorConfig``. Matches
    ``simulator.do_ray_tracing``'s loss_dict numerically (tested).
    Returns (Lu, loss_dict).
    """
    cfg = config.trace_config()
    assert lens.is_spherical, "fused kernel is spherical; use ops.trace"
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, cfg)
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, cfg, key=key, w_order="outer")
    _, F, P, W = shape
    outs = trace_fused(xp, yp, cyb, z0, lens.c[0], lens.t[0], mu, rows,
                       True, cfg.allow_backward_rays, F * P)
    pth, ptp, pz = outs[6:9]
    rms = spot_rms_flat_wouter(outs, F, P, W, config.spot_metric)
    n_sequence = int(lens.structure.n_surfaces[0])
    sumQ = (jnp.sum(pth) + jnp.sum(ptp) + jnp.sum(pz)) / n_sequence
    Lu = rms + config.penalty_rate * sumQ
    return Lu, {"loss_unsup": Lu, "rms": rms, "penalty": sumQ}
