"""Pallas TPU kernel for the fused conic + even-asphere trace (fwd + VJP).

Completes the north-star requirement ("Newton-iteration intersection with
conic+aspheric sag becomes Pallas kernels", BASELINE.json): the per-surface
Newton solve runs unrolled inside the kernel, and the hand-derived backward
replicates the XLA engine's implicit-differentiation semantics exactly —
``n_iter`` Newton steps are treated as constants and one differentiable
polish step carries all first-order sensitivity (see
``ops.surfaces.find_marching_distance_asphere``).

Closed forms used for the adjoints (u = (1+κ)c²r², w = √(1−u)):

    sag(r²)  = c r²/(1+w) + Σₖ aₖ (r²)^{k+2}
    g = ∂sag/∂r² = c/(2w) + Σₖ aₖ (k+2)(r²)^{k+1}
    h = ∂g/∂r²   = c(1+κ)c²/(4w³) + Σₖ aₖ (k+2)(k+1)(r²)^k
    ∂sag/∂c = r²/(1+w) + u r²/(w(1+w)²)      ∂g/∂c = 1/(2w) + u/(2w³)
    ∂sag/∂κ = c³ r⁴/(2w(1+w)²)               ∂g/∂κ = c³ r²/(4w³)
    ∂sag/∂aₖ = (r²)^{k+2}                    ∂g/∂aₖ = (k+2)(r²)^{k+1}

Failure-mask semantics mirror the XLA engine (sag-domain guard, stationary
Newton derivative, non-convergence, cos² floor, TIR, cz² collapse), with
zero gradient through failed lanes. Parity is pinned by tests against
``jax.grad`` of the jnp asphere engine.
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
    LANES, _hinge, _hinge_grad, _kill_backward, _theta_norm,
    _theta_norm_adjoint, _widx, _mu_of, _pad_len)

EPS = 1e-6
DEFAULT_ROWS = 32
NEWTON_ITERS = 10
NEWTON_TOL = 1e-5


def _sag_terms(c, kappa, a_ref, k_surf, n_asph, r2):
    """sag, g and the domain guard at r²  (a_ref: SMEM (S, K) or None)."""
    beta = (1.0 + kappa) * c * c
    u = beta * r2
    guard = 1.0 - u < EPS
    w = jnp.sqrt(jnp.where(guard, 1.0, 1.0 - u))
    sag = c * r2 / (1.0 + w)
    g = c / (2.0 * w)
    for k in range(n_asph):
        ak = a_ref[k_surf, k]
        sag = sag + ak * r2 ** (k + 2)
        g = g + ak * (k + 2.0) * r2 ** (k + 1)
    return sag, g, guard, w, u


def _g_partials(c, kappa, a_ref, k_surf, n_asph, r2, w, u):
    """(h, g_c, g_kappa, sag_c, sag_kappa) at r² (aₖ partials are powers)."""
    beta = (1.0 + kappa) * c * c
    w3 = w * w * w
    h = c * beta / (4.0 * w3)
    g_c = 1.0 / (2.0 * w) + u / (2.0 * w3)
    g_kap = c * c * c * r2 / (4.0 * w3)
    opw = 1.0 + w
    sag_c = r2 / opw + u * r2 / (w * opw * opw)
    sag_kap = c * c * c * r2 * r2 / (2.0 * w * opw * opw)
    for k in range(n_asph):
        ak = a_ref[k_surf, k]
        h = h + ak * (k + 2.0) * (k + 1.0) * r2 ** k
    return h, g_c, g_kap, sag_c, sag_kap


def _newton_dist(c, kappa, a_ref, k_surf, n_asph, x, y, z, cx, cy, cz,
                 n_iter=NEWTON_ITERS):
    """Initial sphere/plane guess + NEWTON_ITERS steps + polish.

    Returns (dist, s_pre, f, fp, fp_safe, stationary, not_conv) where f/fp
    are evaluated at s_pre (the pre-polish point — the values the polish
    step and its adjoint need)."""
    # closed-form sphere guess (reference ray_tracing_lite.py:525-545)
    e = -(x * cx + y * cy + z * cz)
    mz = z + e * cz
    m2 = x * x + y * y + z * z - e * e
    temp = c * m2 - 2.0 * mz
    cos2_s = cz * cz - c * temp
    fail_s = cos2_s - EPS < 0
    cos_s = jnp.sqrt(jnp.where(fail_s, 1.0, cos2_s))
    dist_s = e + temp / (cz + cos_s)
    plane_ok = jnp.abs(cz) > EPS
    plane = jnp.where(plane_ok, -z / jnp.where(plane_ok, cz, 1.0), 0.0)
    s = jnp.where(fail_s, plane, dist_s)

    def f_fp(s):
        xs = x + s * cx
        ys = y + s * cy
        r2 = xs * xs + ys * ys
        sag, g, guard, w, u = _sag_terms(c, kappa, a_ref, k_surf, n_asph, r2)
        f = (z + s * cz) - sag
        fp = cz - 2.0 * g * (xs * cx + ys * cy)
        return f, fp, guard

    for _ in range(n_iter):
        f, fp, _ = f_fp(s)
        fp_s = jnp.where(jnp.abs(fp) > EPS, fp,
                         jnp.where(fp >= 0, EPS, -EPS))
        s = s - f / fp_s

    # polish (the only differentiable step; s is constant for the adjoint)
    f, fp, guard_pre = f_fp(s)
    stationary = jnp.abs(fp) < EPS
    fp_safe = jnp.where(stationary, 1.0, fp)
    dist = s - f / fp_safe
    not_conv = jnp.abs(f) > NEWTON_TOL
    return dist, s, f, fp, fp_safe, stationary, not_conv, guard_pre


def _fwd_surface_a(c, kappa, t, mu, a_ref, k_surf, n_asph,
                   x, y, z, cx, cy, cz, ok, n_iter=NEWTON_ITERS):
    """One conic/asphere surface step; mirrors the jnp asphere engine
    (ops.surfaces.find_marching_distance_asphere + apply_snell_general)."""
    (dist, s_pre, f, fp, fp_safe, stationary, not_conv,
     guard_pre) = _newton_dist(
        c, kappa, a_ref, k_surf, n_asph, x, y, z, cx, cy, cz, n_iter)

    xs = x + dist * cx
    ys = y + dist * cy
    zA = z + dist * cz
    delta_z = dist * cz
    r2 = xs * xs + ys * ys
    _, g, guard2, w, u = _sag_terms(c, kappa, a_ref, k_surf, n_asph, r2)
    norm2 = 1.0 + 4.0 * r2 * g * g
    inv_norm = jax.lax.rsqrt(norm2)
    dots = xs * cx + ys * cy
    cosr = (cz - 2.0 * g * dots) * inv_norm
    cos2 = cosr * cosr

    fail1 = guard_pre | guard2 | stationary | not_conv | (cos2 - EPS < 0)
    cos = jnp.sqrt(jnp.where(fail1, 1.0, cos2))

    ok1 = ok & ~fail1
    xB = jnp.where(ok1, xs, 0.0)
    yB = jnp.where(ok1, ys, 0.0)
    zB = jnp.where(ok1, zA, 0.0)
    cxB = jnp.where(ok1, cx, 0.0)
    cyB = jnp.where(ok1, cy, 0.0)

    # Snell with the true normal at (xB, yB) (matches apply_snell_general)
    r2B = xB * xB + yB * yB
    _, gB, _, wB, uB = _sag_terms(c, kappa, a_ref, k_surf, n_asph, r2B)
    norm2B = 1.0 + 4.0 * r2B * gB * gB
    inv_normB = jax.lax.rsqrt(norm2B)
    cos2p = 1.0 - mu * mu * (1.0 - cos * cos)
    fail2a = cos2p - EPS < 0
    cosp = jnp.sqrt(jnp.where(fail2a, 1.0, cos2p))
    gsn = cosp - mu * cos
    nx = 2.0 * xB * gB * inv_normB
    ny = 2.0 * yB * gB * inv_normB
    cxC = mu * cxB - gsn * nx
    cyC = mu * cyB - gsn * ny
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

    loc = dict(dist=dist, s_pre=s_pre, f=f, fp=fp, fp_safe=fp_safe,
               stationary=stationary, delta_z=delta_z,
               xs=xs, ys=ys, r2=r2, g=g, w=w, u=u, inv_norm=inv_norm,
               dots=dots, cosr=cosr, cos2=cos2, cos=cos,
               fail1=fail1, ok1=ok1, xB=xB, yB=yB, cxB=cxB, cyB=cyB,
               r2B=r2B, gB=gB, wB=wB, uB=uB, inv_normB=inv_normB,
               cos2p=cos2p, fail2a=fail2a, cosp=cosp, gsn=gsn,
               nx=nx, ny=ny, cxC=cxC, cyC=cyC, czC=czC, fail2=fail2,
               ok2=ok2)
    return (xD, yD, zD, cxD, cyD, czD, ok2), loc


def _bwd_surface_a(c, kappa, t, mu, a_ref, k_surf, n_asph, pre, loc, d,
                   dcos2_extra=None, dcos2p_extra=None, ddist_extra=None):
    """Adjoint of ``_fwd_surface_a``. ``ddist_extra`` injects an
    OPL-accumulator cotangent on the marching distance (the ``"opl"``
    kernel mode — see ``pallas_trace._bwd_surface``). Returns
    (d_pre_state, dc, dkappa, dt, dmu_ray, da_list)."""
    x, y, z, cx, cy, cz, ok = pre
    dxD, dyD, dzD, dcxD, dcyD, dczD = d
    ok1, ok2 = loc["ok1"], loc["ok2"]
    dist, s_pre = loc["dist"], loc["s_pre"]
    xs, ys, r2, g, w, u = (loc["xs"], loc["ys"], loc["r2"], loc["g"],
                           loc["w"], loc["u"])
    inv_norm, dots, cosr, cos = (loc["inv_norm"], loc["dots"], loc["cosr"],
                                 loc["cos"])
    xB, yB, cxB, cyB = loc["xB"], loc["yB"], loc["cxB"], loc["cyB"]
    r2B, gB, wB, uB, inv_normB = (loc["r2B"], loc["gB"], loc["wB"],
                                  loc["uB"], loc["inv_normB"])
    cosp, gsn, nx, ny = loc["cosp"], loc["gsn"], loc["nx"], loc["ny"]
    cxC, cyC, czC = loc["cxC"], loc["cyC"], loc["czC"]

    da = [jnp.zeros_like(dxD) for _ in range(n_asph)]

    dt_k = -jnp.sum(dzD)

    # reset2 + cz renormalization
    dczC = jnp.where(ok2, dczD, 0.0)
    dcz2 = jnp.where(loc["fail2"], 0.0, dczC / (2.0 * czC))
    dcxC = jnp.where(ok2, dcxD, 0.0) - 2.0 * cxC * dcz2
    dcyC = jnp.where(ok2, dcyD, 0.0) - 2.0 * cyC * dcz2

    # snell: cxC = mu cxB - gsn nx
    dxB = jnp.where(ok2, dxD, 0.0)
    dyB = jnp.where(ok2, dyD, 0.0)
    dzB = jnp.where(ok2, dzD, 0.0)
    dcxB = mu * dcxC
    dcyB = mu * dcyC
    dmu_ray = dcxC * cxB + dcyC * cyB
    dgsn = -(dcxC * nx + dcyC * ny)
    dnx = -dcxC * gsn
    dny = -dcyC * gsn

    # nx = 2 xB gB inv_normB
    dxB = dxB + dnx * 2.0 * gB * inv_normB
    dyB = dyB + dny * 2.0 * gB * inv_normB
    dgB = (dnx * xB + dny * yB) * 2.0 * inv_normB
    dinv_normB = (dnx * xB + dny * yB) * 2.0 * gB
    # inv_normB = rsqrt(1 + 4 r2B gB^2)
    dnorm2B = dinv_normB * (-0.5) * inv_normB ** 3
    dr2B = dnorm2B * 4.0 * gB * gB
    dgB = dgB + dnorm2B * 8.0 * r2B * gB

    # gsn = cosp - mu cos
    dcosp = dgsn
    dmu_ray = dmu_ray - dgsn * cos
    dcos = -dgsn * mu
    dcos2p = jnp.where(loc["fail2a"], 0.0, dcosp / (2.0 * cosp))
    if dcos2p_extra is not None:
        dcos2p = dcos2p + dcos2p_extra
    dmu_ray = dmu_ray + dcos2p * (-2.0 * mu * (1.0 - cos * cos))
    dcos = dcos + dcos2p * (2.0 * mu * mu * cos)

    # gB(r2B; params)
    hB, gB_c, gB_kap, _, _ = _g_partials(c, kappa, a_ref, k_surf, n_asph,
                                         r2B, wB, uB)
    dc_ray = dgB * gB_c
    dkap_ray = dgB * gB_kap
    for k in range(n_asph):
        da[k] = da[k] + dgB * (k + 2.0) * r2B ** (k + 1)
    dr2B = dr2B + dgB * hB
    # r2B = xB^2 + yB^2
    dxB = dxB + 2.0 * xB * dr2B
    dyB = dyB + 2.0 * yB * dr2B

    # reset1 (czB dead — snell renormalizes cz)
    dxs = jnp.where(ok1, dxB, 0.0)
    dys = jnp.where(ok1, dyB, 0.0)
    dzA = jnp.where(ok1, dzB, 0.0)
    dcx = jnp.where(ok1, dcxB, 0.0)
    dcy = jnp.where(ok1, dcyB, 0.0)

    # cos chain: cos = sqrt(sel(fail1, 1, cos2)), cos2 = cosr^2,
    # cosr = (cz - 2 g dots) * inv_norm
    dcos2 = jnp.where(loc["fail1"], 0.0, dcos / (2.0 * cos))
    if dcos2_extra is not None:
        dcos2 = dcos2 + dcos2_extra
    dcosr = 2.0 * cosr * dcos2
    dFsv = dcosr * inv_norm          # adjoint of (cz - 2 g dots)
    dinv_norm = dcosr * (cz - 2.0 * g * dots)
    dnorm2 = dinv_norm * (-0.5) * inv_norm ** 3
    dr2 = dnorm2 * 4.0 * g * g
    dg = dnorm2 * 8.0 * r2 * g
    dcz = dFsv
    dg = dg - dFsv * 2.0 * dots
    ddots = -dFsv * 2.0 * g
    dxs = dxs + ddots * cx
    dcx = dcx + ddots * xs
    dys = dys + ddots * cy
    dcy = dcy + ddots * ys

    # g(r2; params) at the hit point
    h_, g_c, g_kap, sag_c, sag_kap = _g_partials(c, kappa, a_ref, k_surf,
                                                 n_asph, r2, w, u)
    dc_ray = dc_ray + dg * g_c
    dkap_ray = dkap_ray + dg * g_kap
    for k in range(n_asph):
        da[k] = da[k] + dg * (k + 2.0) * r2 ** (k + 1)
    dr2 = dr2 + dg * h_
    # r2 = xs^2 + ys^2
    dxs = dxs + 2.0 * xs * dr2
    dys = dys + 2.0 * ys * dr2

    # position update at dist: xs = x + dist cx, zA = z + dist cz
    ddist = dxs * cx + dys * cy + dzA * cz
    if ddist_extra is not None:
        ddist = ddist + ddist_extra
    dx = dxs
    dy = dys
    dz = dzA
    dcx = dcx + dxs * dist
    dcy = dcy + dys * dist
    dcz = dcz + dzA * dist

    # polish step: dist = s_pre - f/fp_safe  (s_pre constant)
    fp_safe = loc["fp_safe"]
    df = -ddist / fp_safe
    dfp = jnp.where(loc["stationary"], 0.0,
                    ddist * loc["f"] / (fp_safe * fp_safe))

    # f and fp are evaluated at s_pre: recompute that point's locals.
    xsp = x + s_pre * cx
    ysp = y + s_pre * cy
    r2p = xsp * xsp + ysp * ysp
    sag_p, g_p, _, wp, up = _sag_terms(c, kappa, a_ref, k_surf, n_asph, r2p)
    hp, gp_c, gp_kap, sagp_c, sagp_kap = _g_partials(
        c, kappa, a_ref, k_surf, n_asph, r2p, wp, up)
    dotsp = xsp * cx + ysp * cy

    # f = (z + s_pre cz) - sag(r2p)
    dz = dz + df
    dcz = dcz + df * s_pre
    dsag = -df
    dc_ray = dc_ray + dsag * sagp_c
    dkap_ray = dkap_ray + dsag * sagp_kap
    for k in range(n_asph):
        da[k] = da[k] + dsag * r2p ** (k + 2)
    dr2p = dsag * g_p  # d sag/d r2 = g

    # fp = cz - 2 g_p dotsp
    dcz = dcz + dfp
    dgp = -dfp * 2.0 * dotsp
    ddotsp = -dfp * 2.0 * g_p
    dc_ray = dc_ray + dgp * gp_c
    dkap_ray = dkap_ray + dgp * gp_kap
    for k in range(n_asph):
        da[k] = da[k] + dgp * (k + 2.0) * r2p ** (k + 1)
    dr2p = dr2p + dgp * hp

    dxsp = 2.0 * xsp * dr2p + ddotsp * cx
    dysp = 2.0 * ysp * dr2p + ddotsp * cy
    dcx = dcx + ddotsp * xsp
    dcy = dcy + ddotsp * ysp
    # xsp = x + s_pre cx (s_pre constant)
    dx = dx + dxsp
    dy = dy + dysp
    dcx = dcx + dxsp * s_pre
    dcy = dcy + dysp * s_pre

    return ((dx, dy, dz, dcx, dcy, dcz),
            jnp.sum(dc_ray), jnp.sum(dkap_ray), dt_k, dmu_ray,
            [jnp.sum(v) for v in da])


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel_a(n_surf, w, rows, n_asph, penalties, n_iter, allow_backward,
                  path_bounds, angle_thr, n_per_w,
                  z0_ref, c_ref, kap_ref, t_ref, mu_ref, a_ref, *refs):
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
        (x, y, z, cx, cy, cz, ok2), loc = _fwd_surface_a(
            c_ref[k], kap_ref[k], t_ref[k], mu, a_ref, k, n_asph,
            x, y, z, cx, cy, cz, ok, n_iter)
        if opl_mode:
            # OPL leg k travels in the medium BEFORE surface k, n_ref[k]
            # (same semantics as pallas_trace._fwd_kernel's opl mode).
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
            # Angle + path hinges (see pallas_trace._fwd_kernel full branch).
            pen_ang = (pen_ang + jnp.maximum(angle_thr - loc["cos2"], 0.0)
                       + jnp.maximum(angle_thr - loc["cos2p"], 0.0))
            if k > 0:
                delta = (z + ref_ref[0, k]) - (z_prev + ref_ref[0, k - 1])
                pen_path = pen_path + _hinge(delta, *path_bounds[k - 1])
            z_prev = z
    if full:
        delta = ref_ref[0, n_surf] - (z_prev + ref_ref[0, n_surf - 1])
        pen_path = pen_path + _hinge(delta, *path_bounds[n_surf - 1])

    delta_z = -z
    dist = delta_z / cz
    x = x + dist * cx
    y = y + dist * cy
    if opl_mode:
        # Final leg: last surface -> image plane, in image-space n_ref[S].
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



# Locals stashed by the backward kernel's forward pass so the reverse loop
# applies the adjoint without re-running the Newton solve. Order matters.
_LOC_F32_A = ("dist", "s_pre", "f", "fp_safe", "xs", "ys", "r2", "g", "w",
              "u", "inv_norm", "dots", "cosr", "cos2", "cos", "xB", "yB",
              "cxB", "cyB", "r2B", "gB", "wB", "uB", "inv_normB", "cos2p",
              "cosp", "gsn", "nx", "ny", "cxC", "cyC", "czC")
_LOC_BOOL_A = ("stationary", "fail1", "ok1", "fail2a", "fail2", "ok2")
_N_LOC_F32_A = len(_LOC_F32_A)
_N_LOC_BOOL_A = len(_LOC_BOOL_A)


def _bwd_kernel_a(n_surf, w, rows, n_asph, penalties, n_iter, allow_backward,
                  path_bounds, angle_thr, n_per_w,
                  z0_ref, c_ref, kap_ref, t_ref, mu_ref, a_ref, *rest):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    lu = bool(penalties) and not opl_mode
    ref_ref = None
    if full:
        (ref_ref, xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dpth_ref, dptp_ref, dpz_ref,
         dppath_ref, dpang_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out, dref_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
    elif opl_mode:
        (n_ref, xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dopl_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out, dn_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
        dpth_ref = dptp_ref = dpz_ref = None
    elif lu:
        (xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dpth_ref, dptp_ref, dpz_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
    else:
        (xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
        dpth_ref = dptp_ref = dpz_ref = None
    i = pl.program_id(0)
    widx = _widx(i, rows, w, n_per_w)

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
        (x, y, z, cx, cy, cz, ok), loc = _fwd_surface_a(
            c_ref[k], kap_ref[k], t_ref[k], mu, a_ref, k, n_asph,
            x, y, z, cx, cy, cz, ok, n_iter)
        if not allow_backward and k > 0:
            x, y, z, cx, cy, cz, ok = _kill_backward(
                (loc["delta_z"] < 0) & loc["ok1"], t_ref[k],
                x, y, z, cx, cy, cz, ok)
        for li, name in enumerate(_LOC_F32_A):
            st_locf[li, k] = loc[name]
        for li, name in enumerate(_LOC_BOOL_A):
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
        ddist = ddist + dopl * _mu_of(n_ref, n_surf, widx, w)
    dz = -ddist / cz
    dcz = ddist * (z / (cz * cz))
    dx = dx_img
    dy = dy_img

    @pl.when(i == 0)
    def _():
        dz0_out[0, 0] = 0.0
        for k in range(n_surf):
            dc_out[0, k] = 0.0
            dkap_out[0, k] = 0.0
            dt_out[0, k] = 0.0
            for wi in range(w):
                dmu_out[0, k, wi] = 0.0
            for ai in range(n_asph):
                da_out[0, k, ai] = 0.0
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
            return st_z[m + 1] if m + 1 < n_surf else z

        def hinge_cot(j):
            if j == n_surf - 1:
                delta = ref_ref[0, n_surf] - (zpost(n_surf - 1)
                                              + ref_ref[0, n_surf - 1])
            else:
                delta = ((zpost(j + 1) + ref_ref[0, j + 1])
                         - (zpost(j) + ref_ref[0, j]))
            return dppath * _hinge_grad(delta, *path_bounds[j])

    for k in range(n_surf - 1, -1, -1):
        pre = (st_x[k], st_y[k], st_z[k], st_cx[k], st_cy[k], st_cz[k],
               st_ok[k])
        mu = _mu_of(mu_ref, k, widx, w)
        loc = {name: st_locf[li, k] for li, name in enumerate(_LOC_F32_A)}
        loc.update({name: st_locb[li, k]
                    for li, name in enumerate(_LOC_BOOL_A)})
        kill = None
        if not allow_backward and k > 0:
            # delta_z = dist * cz_pre (delta_z itself is not stashed)
            kill = (loc["dist"] * st_cz[k] < 0) & loc["ok1"]
        dcos2_extra = dcos2p_extra = ddist_extra = None
        if opl_mode:
            # opl += dist_k * n_k (pre-kill accumulation in the forward, so
            # no kill masking here — matching _fwd_kernel_a's order).
            ddist_extra = dopl * _mu_of(n_ref, k, widx, w)
            for wi in range(w):
                dn_out[0, k, wi] += jnp.sum(
                    jnp.where(widx == wi, dopl * loc["dist"], 0.0))
        if lu:
            ok_end = loc["ok2"]
            if kill is not None:
                ok_end = ok_end & ~kill
            z_next = st_z[k + 1] if k + 1 < n_surf else z
            dz = dz + dpz * (z_next > 0)
            dcos2_extra = _theta_norm_adjoint(loc["cos2"], ok_end, dpth)
            dcos2p_extra = _theta_norm_adjoint(loc["cos2p"], ok_end, dptp)
        if full:
            # Path/angle adjoints (see pallas_trace._bwd_kernel full branch).
            hp_k = hinge_cot(k)
            dz = dz - hp_k
            if k > 0:
                dz = dz + hinge_cot(k - 1)
            dref_out[0, k + 1] += jnp.sum(hp_k)
            dref_out[0, k] += -jnp.sum(hp_k)
            dcos2_extra = dcos2_extra - dpang * (
                loc["cos2"] < angle_thr).astype(jnp.float32)
            dcos2p_extra = dcos2p_extra - dpang * (
                loc["cos2p"] < angle_thr).astype(jnp.float32)
        dt_kill = None
        if kill is not None:
            dt_kill = -jnp.sum(jnp.where(kill, dz, 0.0))
            dx = jnp.where(kill, 0.0, dx)
            dy = jnp.where(kill, 0.0, dy)
            dz = jnp.where(kill, 0.0, dz)
            dcx = jnp.where(kill, 0.0, dcx)
            dcy = jnp.where(kill, 0.0, dcy)
            dcz = jnp.where(kill, 0.0, dcz)
        ((dx, dy, dz, dcx, dcy, dcz), dc_k, dkap_k, dt_k, dmu_ray,
         da_k) = _bwd_surface_a(
            c_ref[k], kap_ref[k], t_ref[k], mu, a_ref, k, n_asph, pre, loc,
            (dx, dy, dz, dcx, dcy, dcz), dcos2_extra, dcos2p_extra,
            ddist_extra)
        if dt_kill is not None:
            dt_k = dt_k + dt_kill
        dc_out[0, k] += dc_k
        dkap_out[0, k] += dkap_k
        dt_out[0, k] += dt_k
        for wi in range(w):
            dmu_out[0, k, wi] += jnp.sum(
                jnp.where(widx == wi, dmu_ray, 0.0))
        for ai in range(n_asph):
            da_out[0, k, ai] += da_k[ai]

    dcy = dcy + dcz * (-cy / cz0)
    dxp_out[...] = dx
    dyp_out[...] = dy
    dcyin_out[...] = dcy
    dz0_out[0, 0] += jnp.sum(dz)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def trace_fused_asphere(xp, yp, cy, z0, c, kappa, t, mu, asph,
                        rows=DEFAULT_ROWS, penalties=False,
                        n_iter=NEWTON_ITERS, allow_backward=True,
                        n_per_w=None):
    """Fused conic/asphere trace of a flat ray block (single system).

    Args are as in ``pallas_trace.trace_fused`` plus ``kappa`` (S,) conic
    constants and ``asph`` (S, K) even-asphere coefficients. Static
    ``n_per_w=F*P`` selects wavelength-OUTERMOST flat ray order (see
    ``pallas_trace._widx``).
    """
    return _run_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows,
                      penalties, n_iter, allow_backward, n_per_w=n_per_w)


def _run_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, penalties,
               n_iter, allow_backward, ref_z=None, path_bounds=None,
               angle_thr=None, n_per_w=None, n_legs=None):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    n = xp.shape[0]
    n_surf = c.shape[0]
    w = mu.shape[1]
    n_asph = asph.shape[1]
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
    n_out = 11 if full else (7 if opl_mode else (9 if penalties else 6))
    out_shapes = (
        [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.bool_)] * 2
        + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * (n_out - 6))
    if full:
        ref_in = [jnp.reshape(ref_z, (1, -1)).astype(jnp.float32)]
    elif opl_mode:
        ref_in = [n_legs.astype(jnp.float32)]       # (S+1, W) SMEM table
    else:
        ref_in = []

    outs = pl.pallas_call(
        partial(_fwd_kernel_a, n_surf, w, rows, n_asph, penalties, n_iter,
                allow_backward, path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[smem] * (6 + len(ref_in)) + [ray_spec] * 3,
        out_specs=tuple([ray_spec] * n_out),
        out_shape=tuple(out_shapes),
    )(jnp.reshape(z0, (1, 1)).astype(jnp.float32),
      c.astype(jnp.float32), kappa.astype(jnp.float32),
      t.astype(jnp.float32), mu.astype(jnp.float32),
      asph.astype(jnp.float32), *ref_in, xp2, yp2, cy2)

    unpad = lambda a: a.reshape(-1)[:n]
    return tuple(unpad(o) for o in outs)


def _fused_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, penalties,
                 n_iter, allow_backward, n_per_w):
    out = _run_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, penalties,
                     n_iter, allow_backward, n_per_w=n_per_w)
    return out, (xp, yp, cy, z0, c, kappa, t, mu, asph)


def _run_bwd_a(residuals, cotangents, rows, penalties, n_iter,
               allow_backward, path_bounds=None, angle_thr=None,
               n_per_w=None):
    full = penalties == "full"
    opl_mode = penalties == "opl"
    n_legs = dopl = None
    if full:
        xp, yp, cy, z0, c, kappa, t, mu, asph, ref_z = residuals
        (dx, dy, dcx, dcy, _dok, _dbw,
         dpth, dptp, dpz, dppath, dpang) = cotangents
    elif opl_mode:
        xp, yp, cy, z0, c, kappa, t, mu, asph, n_legs = residuals
        dx, dy, dcx, dcy, _dok, _dbw, dopl = cotangents
        ref_z = dpth = dptp = dpz = dppath = dpang = None
    elif penalties:
        xp, yp, cy, z0, c, kappa, t, mu, asph = residuals
        dx, dy, dcx, dcy, _dok, _dbw, dpth, dptp, dpz = cotangents
        ref_z = dppath = dpang = None
    else:
        xp, yp, cy, z0, c, kappa, t, mu, asph = residuals
        dx, dy, dcx, dcy, _dok, _dbw = cotangents
        ref_z = dpth = dptp = dpz = dppath = dpang = None

    n = xp.shape[0]
    n_surf = c.shape[0]
    w = mu.shape[1]
    n_asph = asph.shape[1]
    n_pad = _pad_len(n, rows)
    pad = lambda a: jnp.pad(a, (0, n_pad - n)) if n_pad != n else a
    as2d = lambda a: pad(a).reshape(-1, LANES)
    xp2, yp2, cy2 = as2d(xp), as2d(yp), as2d(cy)
    dx2, dy2 = as2d(dx), as2d(dy)
    dcx2, dcy2 = as2d(dcx), as2d(dcy)
    if opl_mode:
        pen_in = [as2d(dopl)]
    elif penalties:
        pen_in = [as2d(dpth), as2d(dptp), as2d(dpz)]
    else:
        pen_in = []
    if full:
        pen_in += [as2d(dppath), as2d(dpang)]
    n_rows = xp2.shape[0]
    grid = (n_rows // rows,)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scalar_tile = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (0,) + (0,) * len(shape),
        memory_space=pltpu.SMEM)

    out_shape = [
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),           # dz0
        jax.ShapeDtypeStruct((1, n_surf), jnp.float32),      # dc
        jax.ShapeDtypeStruct((1, n_surf), jnp.float32),      # dkappa
        jax.ShapeDtypeStruct((1, n_surf), jnp.float32),      # dt
        jax.ShapeDtypeStruct((1, n_surf, w), jnp.float32),   # dmu
        jax.ShapeDtypeStruct((1, n_surf, n_asph), jnp.float32),  # dasph
    ]
    out_specs = [
        ray_spec, ray_spec, ray_spec,
        scalar_tile((1,)),
        scalar_tile((n_surf,)),
        scalar_tile((n_surf,)),
        scalar_tile((n_surf,)),
        scalar_tile((n_surf, w)),
        scalar_tile((n_surf, n_asph)),
    ]
    ref_in = []
    if full:
        out_shape.append(jax.ShapeDtypeStruct((1, n_surf + 1), jnp.float32))
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
    scratch.append(pltpu.VMEM((_N_LOC_F32_A, n_surf, rows, LANES),
                              jnp.float32))
    scratch.append(pltpu.VMEM((_N_LOC_BOOL_A, n_surf, rows, LANES),
                              jnp.bool_))

    outs = pl.pallas_call(
        partial(_bwd_kernel_a, n_surf, w, rows, n_asph, penalties, n_iter,
                allow_backward, path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[smem] * (6 + len(ref_in))
        + [ray_spec] * (7 + len(pen_in)),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
    )(jnp.reshape(z0, (1, 1)).astype(jnp.float32),
      c.astype(jnp.float32), kappa.astype(jnp.float32),
      t.astype(jnp.float32), mu.astype(jnp.float32),
      asph.astype(jnp.float32), *ref_in,
      xp2, yp2, cy2, dx2, dy2, dcx2, dcy2, *pen_in)

    (dxp2, dyp2, dcy2o, dz0, dc, dkap, dt, dmu, dasph) = outs[:9]
    unpad = lambda a: a.reshape(-1)[:n]
    grads = (unpad(dxp2), unpad(dyp2), unpad(dcy2o),
             dz0.reshape(jnp.shape(z0)), dc[0], dkap[0], dt[0], dmu[0],
             dasph[0])
    if full:
        grads = grads + (outs[9][0].reshape(jnp.shape(ref_z)),)
    elif opl_mode:
        grads = grads + (outs[9][0].reshape(jnp.shape(n_legs)),)
    return grads


def _fused_bwd_a(rows, penalties, n_iter, allow_backward, n_per_w, residuals,
                 cotangents):
    return _run_bwd_a(residuals, cotangents, rows, penalties, n_iter,
                      allow_backward, n_per_w=n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def trace_fused_asphere_full(xp, yp, cy, z0, c, kappa, t, mu, asph, ref_z,
                             rows=DEFAULT_ROWS, n_iter=NEWTON_ITERS,
                             allow_backward=True, path_bounds=(),
                             angle_thr=0.25, n_per_w=None):
    """``trace_fused_asphere`` with the FULL weighted-loss penalty set
    accumulated in-kernel — the conic/asphere analogue of
    ``pallas_trace.trace_fused_full`` (same ref_z/path_bounds/angle_thr
    contract). Returns the 6 trace outputs plus (pen_theta, pen_theta_p,
    pen_zrelu, pen_path, pen_angle), each (N,)."""
    return _run_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "full",
                      n_iter, allow_backward, ref_z, path_bounds, angle_thr,
                      n_per_w=n_per_w)


def _fused_full_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, ref_z, rows,
                      n_iter, allow_backward, path_bounds, angle_thr,
                      n_per_w):
    out = _run_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "full",
                     n_iter, allow_backward, ref_z, path_bounds, angle_thr,
                     n_per_w=n_per_w)
    return out, (xp, yp, cy, z0, c, kappa, t, mu, asph, ref_z)


def _fused_full_bwd_a(rows, n_iter, allow_backward, path_bounds, angle_thr,
                      n_per_w, residuals, cotangents):
    return _run_bwd_a(residuals, cotangents, rows, "full", n_iter,
                      allow_backward, path_bounds, angle_thr,
                      n_per_w=n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def trace_fused_asphere_opl(xp, yp, cy, z0, c, kappa, t, mu, asph, n_legs,
                            rows=DEFAULT_ROWS, n_iter=NEWTON_ITERS,
                            allow_backward=True, n_per_w=None):
    """``trace_fused_asphere`` with the in-kernel optical-path-length
    accumulator — the conic/asphere analogue of
    ``pallas_trace.trace_fused_opl`` (same ``n_legs`` (S+1, W) contract,
    launch plane-wave phase added host-side). Returns the 6 trace outputs
    plus ``opl`` (N,)."""
    return _run_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "opl",
                      n_iter, allow_backward, n_per_w=n_per_w, n_legs=n_legs)


def _fused_opl_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, n_legs, rows,
                     n_iter, allow_backward, n_per_w):
    out = _run_fwd_a(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "opl",
                     n_iter, allow_backward, n_per_w=n_per_w, n_legs=n_legs)
    return out, (xp, yp, cy, z0, c, kappa, t, mu, asph, n_legs)


def _fused_opl_bwd_a(rows, n_iter, allow_backward, n_per_w, residuals,
                     cotangents):
    return _run_bwd_a(residuals, cotangents, rows, "opl", n_iter,
                      allow_backward, n_per_w=n_per_w)


trace_fused_asphere.defvjp(_fused_fwd_a, _fused_bwd_a)
trace_fused_asphere_full.defvjp(_fused_full_fwd_a, _fused_full_bwd_a)
trace_fused_asphere_opl.defvjp(_fused_opl_fwd_a, _fused_opl_bwd_a)


# ---------------------------------------------------------------------------
# Population-batched asphere kernels: grid = (systems, ray tiles), per-system
# parameters in SMEM — the conic/asphere counterpart of ops.pallas_batch,
# so an aspherized generator *population* traces fwd+bwd in one launch.
# ---------------------------------------------------------------------------

BATCH_ROWS = None  # None -> auto (pallas_batch.auto_rows)


class _RefView:
    """Adapter presenting a (1, 1, S, K) SMEM block as the (S, K) view the
    shared surface functions index as ``a_ref[k_surf, k]``."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return self._ref[(0, 0) + idx]


def _fwd_kernel_ab(n_surf, w, rows, n_asph, penalties, n_iter,
                   allow_backward, path_bounds, angle_thr, n_per_w,
                   z0_ref, c_ref, kap_ref, t_ref, mu_ref, a_ref, mask_ref,
                   *refs):
    from torchoptics_tpu.ops.pallas_batch import _mu_of_batch, _widx_batch
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
    a_view = _RefView(a_ref)
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
        (x, y, z, cx, cy, cz, ok2), loc = _fwd_surface_a(
            c_ref[0, 0, k], kap_ref[0, 0, k], t_ref[0, 0, k], mu,
            a_view, k, n_asph, x, y, z, cx, cy, cz, ok, n_iter)
        if opl_mode:
            # OPL leg k in the medium before surface k (see
            # pallas_batch._fwd_kernel_b's opl mode).
            opl = opl + loc["dist"] * _mu_of_batch(n_ref, k, widx, w)
        if k > 0:
            went_bw = ((loc["delta_z"] < 0) & loc["ok1"]
                       & (mask_ref[0, 0, k - 1] > 0))
            if allow_backward:
                bw = bw | went_bw
            else:
                x, y, z, cx, cy, cz, ok2 = _kill_backward(
                    went_bw, t_ref[0, 0, k], x, y, z, cx, cy, cz, ok2)
        ok = ok2
        # Padding surfaces contribute nothing to the penalties (see
        # `pallas_batch._fwd_kernel_b` / `simulator.compute_loss_out`).
        valid_k = mask_ref[0, 0, k] > 0
        if lu:
            pen_th = pen_th + jnp.where(
                valid_k, _theta_norm(loc["cos2"], ok), 0.0)
            pen_tp = pen_tp + jnp.where(
                valid_k, _theta_norm(loc["cos2p"], ok), 0.0)
            pen_z = pen_z + jnp.where(valid_k, jnp.maximum(z, 0.0), 0.0)
        if full:
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


def _bwd_kernel_ab(n_surf, w, rows, n_asph, penalties, n_iter,
                   allow_backward, path_bounds, angle_thr, n_per_w,
                   z0_ref, c_ref, kap_ref, t_ref, mu_ref, a_ref, mask_ref,
                   *rest):
    from torchoptics_tpu.ops.pallas_batch import _mu_of_batch, _widx_batch
    full = penalties == "full"
    opl_mode = penalties == "opl"
    lu = bool(penalties) and not opl_mode
    ref_ref = None
    if full:
        (ref_ref, xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dpth_ref, dptp_ref, dpz_ref,
         dppath_ref, dpang_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out, dref_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
    elif opl_mode:
        (n_ref, xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dopl_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out, dn_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
        dpth_ref = dptp_ref = dpz_ref = None
    elif lu:
        (xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref, dpth_ref, dptp_ref, dpz_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
    else:
        (xp_ref, yp_ref, cyin_ref,
         dx_ref, dy_ref, dcx_ref, dcy_ref,
         dxp_out, dyp_out, dcyin_out, dz0_out, dc_out, dkap_out, dt_out,
         dmu_out, da_out,
         st_x, st_y, st_z, st_cx, st_cy, st_cz, st_ok,
         st_locf, st_locb) = rest
        dpth_ref = dptp_ref = dpz_ref = None
    i = pl.program_id(1)
    widx = _widx_batch(i, rows, w, n_per_w)
    a_view = _RefView(a_ref)

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
        (x, y, z, cx, cy, cz, ok), loc = _fwd_surface_a(
            c_ref[0, 0, k], kap_ref[0, 0, k], t_ref[0, 0, k], mu,
            a_view, k, n_asph, x, y, z, cx, cy, cz, ok, n_iter)
        if not allow_backward and k > 0:
            x, y, z, cx, cy, cz, ok = _kill_backward(
                (loc["delta_z"] < 0) & loc["ok1"]
                & (mask_ref[0, 0, k - 1] > 0),
                t_ref[0, 0, k], x, y, z, cx, cy, cz, ok)
        for li, name in enumerate(_LOC_F32_A):
            st_locf[li, k] = loc[name]
        for li, name in enumerate(_LOC_BOOL_A):
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
            dkap_out[0, 0, k] = 0.0
            dt_out[0, 0, k] = 0.0
            for wi in range(w):
                dmu_out[0, 0, k, wi] = 0.0
            for ai in range(n_asph):
                da_out[0, 0, k, ai] = 0.0
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
        loc = {name: st_locf[li, k] for li, name in enumerate(_LOC_F32_A)}
        loc.update({name: st_locb[li, k]
                    for li, name in enumerate(_LOC_BOOL_A)})
        kill = None
        if not allow_backward and k > 0:
            kill = ((loc["dist"] * st_cz[k] < 0) & loc["ok1"]
                    & (mask_ref[0, 0, k - 1] > 0))
        dcos2_extra = dcos2p_extra = ddist_extra = None
        # Adjoint of the forward's padding-surface masking.
        valid_k = mask_ref[0, 0, k] > 0
        if opl_mode:
            # opl += dist_k * n_k (pre-kill accumulation in the forward).
            ddist_extra = dopl * _mu_of_batch(n_ref, k, widx, w)
            for wi in range(w):
                dn_out[0, 0, k, wi] += jnp.sum(
                    jnp.where(widx == wi, dopl * loc["dist"], 0.0))
        if lu:
            ok_end = loc["ok2"]
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
        ((dx, dy, dz, dcx, dcy, dcz), dc_k, dkap_k, dt_k, dmu_ray,
         da_k) = _bwd_surface_a(
            c_ref[0, 0, k], kap_ref[0, 0, k], t_ref[0, 0, k], mu,
            a_view, k, n_asph, pre, loc,
            (dx, dy, dz, dcx, dcy, dcz), dcos2_extra, dcos2p_extra,
            ddist_extra)
        if dt_kill is not None:
            dt_k = dt_k + dt_kill
        dc_out[0, 0, k] += dc_k
        dkap_out[0, 0, k] += dkap_k
        dt_out[0, 0, k] += dt_k
        for wi in range(w):
            dmu_out[0, 0, k, wi] += jnp.sum(
                jnp.where(widx == wi, dmu_ray, 0.0))
        for ai in range(n_asph):
            da_out[0, 0, k, ai] += da_k[ai]

    dcy = dcy + dcz * (-cy / cz0)
    dxp_out[...] = dx
    dyp_out[...] = dy
    dcyin_out[...] = dcy
    dz0_out[0, 0, 0] += jnp.sum(dz)


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def trace_fused_asphere_batch(xp, yp, cy, z0, c, kappa, t, mu, asph,
                              rows=BATCH_ROWS, penalties=False,
                              n_iter=NEWTON_ITERS, allow_backward=True,
                              mask=None, n_per_w=None):
    """Fused conic/asphere trace of a lens population (B systems).

    Args as in ``pallas_batch.trace_fused_batch`` plus ``kappa`` (B, S) and
    ``asph`` (B, S, K). ``mask`` is a static hashable tuple of 0/1 tuples for
    heterogeneous padded populations (None = all valid); static
    ``n_per_w=F*P`` selects wavelength-OUTERMOST flat ray order."""
    return _run_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows,
                       penalties, n_iter, allow_backward, mask,
                       n_per_w=n_per_w)


def _run_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, penalties,
                n_iter, allow_backward, mask, ref_z=None, path_bounds=None,
                angle_thr=None, n_per_w=None, n_legs=None):
    from torchoptics_tpu.ops.pallas_batch import (
        _mask_array, _prep, _specs_common, auto_rows)
    full = penalties == "full"
    opl_mode = penalties == "opl"
    B, n = xp.shape
    if rows is None:
        rows = auto_rows(n)
    n_surf = c.shape[1]
    w = mu.shape[2]
    n_asph = asph.shape[2]
    xp2 = _prep(xp.astype(jnp.float32), rows)
    yp2 = _prep(yp.astype(jnp.float32), rows)
    cy2 = _prep(cy.astype(jnp.float32), rows)
    n_rows = xp2.shape[1]
    grid = (B, n_rows // rows)

    ray_spec, z0_spec, ct_spec, mu_spec = _specs_common(
        rows, n_surf, w, n_rows)
    a_spec = pl.BlockSpec((1, 1, n_surf, n_asph), lambda b, i: (b, 0, 0, 0),
                          memory_space=pltpu.SMEM)
    ref_spec = pl.BlockSpec((1, 1, n_surf + 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    nlegs_spec = pl.BlockSpec((1, 1, n_surf + 1, w),
                              lambda b, i: (b, 0, 0, 0),
                              memory_space=pltpu.SMEM)
    n_out = 11 if full else (7 if opl_mode else (9 if penalties else 6))
    out_shapes = (
        [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.bool_)] * 2
        + [jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32)]
        * (n_out - 6))
    if full:
        ref_in = [ref_z.reshape(B, 1, -1).astype(jnp.float32)]
        ref_specs = [ref_spec]
    elif opl_mode:
        ref_in = [n_legs[:, None].astype(jnp.float32)]   # (B, 1, S+1, W)
        ref_specs = [nlegs_spec]
    else:
        ref_in, ref_specs = [], []

    outs = pl.pallas_call(
        partial(_fwd_kernel_ab, n_surf, w, rows, n_asph, penalties, n_iter,
                allow_backward, path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[z0_spec, ct_spec, ct_spec, ct_spec, mu_spec, a_spec,
                  ct_spec] + ref_specs
        + [ray_spec, ray_spec, ray_spec],
        out_specs=tuple([ray_spec] * n_out),
        out_shape=tuple(out_shapes),
    )(z0.reshape(-1, 1, 1).astype(jnp.float32),
      c[:, None].astype(jnp.float32), kappa[:, None].astype(jnp.float32),
      t[:, None].astype(jnp.float32), mu[:, None].astype(jnp.float32),
      asph[:, None].astype(jnp.float32), _mask_array(mask, B, n_surf),
      *ref_in, xp2, yp2, cy2)

    unpad = lambda a: a.reshape(B, -1)[:, :n]
    return tuple(unpad(o) for o in outs)


def _fused_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, penalties,
                  n_iter, allow_backward, mask, n_per_w):
    out = _run_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows,
                      penalties, n_iter, allow_backward, mask,
                      n_per_w=n_per_w)
    return out, (xp, yp, cy, z0, c, kappa, t, mu, asph)


def _run_bwd_ab(residuals, cotangents, rows, penalties, n_iter,
                allow_backward, mask, path_bounds=None, angle_thr=None,
                n_per_w=None):
    from torchoptics_tpu.ops.pallas_batch import (
        _mask_array, _prep, _specs_common, auto_rows)
    full = penalties == "full"
    opl_mode = penalties == "opl"
    n_legs = dopl = None
    if full:
        xp, yp, cy, z0, c, kappa, t, mu, asph, ref_z = residuals
        (dx, dy, dcx, dcy, _dok, _dbw,
         dpth, dptp, dpz, dppath, dpang) = cotangents
    elif opl_mode:
        xp, yp, cy, z0, c, kappa, t, mu, asph, n_legs = residuals
        dx, dy, dcx, dcy, _dok, _dbw, dopl = cotangents
        ref_z = dpth = dptp = dpz = dppath = dpang = None
    elif penalties:
        xp, yp, cy, z0, c, kappa, t, mu, asph = residuals
        dx, dy, dcx, dcy, _dok, _dbw, dpth, dptp, dpz = cotangents
        ref_z = dppath = dpang = None
    else:
        xp, yp, cy, z0, c, kappa, t, mu, asph = residuals
        dx, dy, dcx, dcy, _dok, _dbw = cotangents
        ref_z = dpth = dptp = dpz = dppath = dpang = None

    B, n = xp.shape
    if rows is None:
        rows = auto_rows(n)
    n_surf = c.shape[1]
    w = mu.shape[2]
    n_asph = asph.shape[2]
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
    a_spec = pl.BlockSpec((1, 1, n_surf, n_asph), lambda b, i: (b, 0, 0, 0),
                          memory_space=pltpu.SMEM)
    ref_spec = pl.BlockSpec((1, 1, n_surf + 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    nlegs_spec = pl.BlockSpec((1, 1, n_surf + 1, w),
                              lambda b, i: (b, 0, 0, 0),
                              memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, n_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, n_surf), jnp.float32),      # dc
        jax.ShapeDtypeStruct((B, 1, n_surf), jnp.float32),      # dkappa
        jax.ShapeDtypeStruct((B, 1, n_surf), jnp.float32),      # dt
        jax.ShapeDtypeStruct((B, 1, n_surf, w), jnp.float32),   # dmu
        jax.ShapeDtypeStruct((B, 1, n_surf, n_asph), jnp.float32),  # dasph
    ]
    out_specs = [ray_spec, ray_spec, ray_spec,
                 z0_spec, ct_spec, ct_spec, ct_spec, mu_spec, a_spec]
    ref_in, ref_specs = [], []
    if full:
        out_shape.append(
            jax.ShapeDtypeStruct((B, 1, n_surf + 1), jnp.float32))
        out_specs.append(ref_spec)
        ref_in = [ref_z.reshape(B, 1, -1).astype(jnp.float32)]
        ref_specs = [ref_spec]
    elif opl_mode:
        out_shape.append(
            jax.ShapeDtypeStruct((B, 1, n_surf + 1, w), jnp.float32))
        out_specs.append(nlegs_spec)
        ref_in = [n_legs[:, None].astype(jnp.float32)]
        ref_specs = [nlegs_spec]
    scratch = [pltpu.VMEM((n_surf, 1, rows, LANES), jnp.float32)
               for _ in range(6)]
    scratch.append(pltpu.VMEM((n_surf, 1, rows, LANES), jnp.bool_))
    scratch.append(pltpu.VMEM((_N_LOC_F32_A, n_surf, 1, rows, LANES),
                              jnp.float32))
    scratch.append(pltpu.VMEM((_N_LOC_BOOL_A, n_surf, 1, rows, LANES),
                              jnp.bool_))

    outs = pl.pallas_call(
        partial(_bwd_kernel_ab, n_surf, w, rows, n_asph, penalties, n_iter,
                allow_backward, path_bounds, angle_thr, n_per_w),
        grid=grid,
        in_specs=[z0_spec, ct_spec, ct_spec, ct_spec, mu_spec, a_spec,
                  ct_spec] + ref_specs
        + [ray_spec, ray_spec, ray_spec,
           ray_spec, ray_spec, ray_spec, ray_spec]
        + [ray_spec] * len(pen_in),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
    )(z0.reshape(-1, 1, 1).astype(jnp.float32),
      c[:, None].astype(jnp.float32), kappa[:, None].astype(jnp.float32),
      t[:, None].astype(jnp.float32), mu[:, None].astype(jnp.float32),
      asph[:, None].astype(jnp.float32), _mask_array(mask, B, n_surf),
      *ref_in, xp2, yp2, cy2, dx2, dy2, dcx2, dcy2, *pen_in)

    (dxp2, dyp2, dcy2o, dz0, dc, dkap, dt, dmu, dasph) = outs[:9]
    unpad = lambda a: a.reshape(B, -1)[:, :n]
    grads = (unpad(dxp2), unpad(dyp2), unpad(dcy2o),
             dz0.reshape(jnp.shape(z0)), dc[:, 0], dkap[:, 0], dt[:, 0],
             dmu[:, 0], dasph[:, 0])
    if full:
        grads = grads + (outs[9][:, 0].reshape(jnp.shape(ref_z)),)
    elif opl_mode:
        grads = grads + (outs[9][:, 0].reshape(jnp.shape(n_legs)),)
    return grads


def _fused_bwd_ab(rows, penalties, n_iter, allow_backward, mask, n_per_w,
                  residuals, cotangents):
    return _run_bwd_ab(residuals, cotangents, rows, penalties, n_iter,
                       allow_backward, mask, n_per_w=n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def trace_fused_asphere_batch_full(xp, yp, cy, z0, c, kappa, t, mu, asph,
                                   ref_z, rows=BATCH_ROWS,
                                   n_iter=NEWTON_ITERS, allow_backward=True,
                                   mask=None, path_bounds=(),
                                   angle_thr=0.25, n_per_w=None):
    """``trace_fused_asphere_batch`` with the FULL weighted-loss penalty
    set accumulated in-kernel (homogeneous aspherized populations; see
    ``pallas_batch.trace_fused_batch_full`` for the contract)."""
    return _run_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "full",
                       n_iter, allow_backward, mask, ref_z, path_bounds,
                       angle_thr, n_per_w=n_per_w)


def _fused_full_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, ref_z, rows,
                       n_iter, allow_backward, mask, path_bounds, angle_thr,
                       n_per_w):
    out = _run_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "full",
                      n_iter, allow_backward, mask, ref_z, path_bounds,
                      angle_thr, n_per_w=n_per_w)
    return out, (xp, yp, cy, z0, c, kappa, t, mu, asph, ref_z)


def _fused_full_bwd_ab(rows, n_iter, allow_backward, mask, path_bounds,
                       angle_thr, n_per_w, residuals, cotangents):
    return _run_bwd_ab(residuals, cotangents, rows, "full", n_iter,
                       allow_backward, mask, path_bounds, angle_thr,
                       n_per_w=n_per_w)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def trace_fused_asphere_batch_opl(xp, yp, cy, z0, c, kappa, t, mu, asph,
                                  n_legs, rows=BATCH_ROWS,
                                  n_iter=NEWTON_ITERS, allow_backward=True,
                                  mask=None, n_per_w=None):
    """``trace_fused_asphere_batch`` with the in-kernel optical-path-length
    accumulator (``n_legs`` (B, S+1, W); see
    ``pallas_batch.trace_fused_batch_opl``). Returns the 6 trace outputs
    plus ``opl`` (B, N)."""
    return _run_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "opl",
                       n_iter, allow_backward, mask, n_per_w=n_per_w,
                       n_legs=n_legs)


def _fused_opl_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, n_legs, rows,
                      n_iter, allow_backward, mask, n_per_w):
    out = _run_fwd_ab(xp, yp, cy, z0, c, kappa, t, mu, asph, rows, "opl",
                      n_iter, allow_backward, mask, n_per_w=n_per_w,
                      n_legs=n_legs)
    return out, (xp, yp, cy, z0, c, kappa, t, mu, asph, n_legs)


def _fused_opl_bwd_ab(rows, n_iter, allow_backward, mask, n_per_w,
                      residuals, cotangents):
    return _run_bwd_ab(residuals, cotangents, rows, "opl", n_iter,
                       allow_backward, mask, n_per_w=n_per_w)


trace_fused_asphere_batch.defvjp(_fused_fwd_ab, _fused_bwd_ab)
trace_fused_asphere_batch_full.defvjp(_fused_full_fwd_ab,
                                      _fused_full_bwd_ab)
trace_fused_asphere_batch_opl.defvjp(_fused_opl_fwd_ab, _fused_opl_bwd_ab)


def trace_rays_fused_asphere_batch(specs, lens, config,
                                   key: Optional[jax.Array] = None,
                                   xy=None, rows=BATCH_ROWS,
                                   penalties: bool = False,
                                   use_vig: bool = True):
    """``trace_rays`` on the batched asphere kernel (B ≥ 1 conic/asphere
    systems, heterogeneous padded structures supported).

    The population analogue of ``trace_rays_fused_asphere``; see
    ``pallas_batch.trace_rays_fused_batch`` for the result contract."""
    from torchoptics_tpu.ops.pallas_batch import (
        _static_mask, package_fused_result_batch, prepare_fused_inputs_batch)
    from torchoptics_tpu.ops.pallas_trace import _wouter_ok

    assert lens.kappa is not None and lens.asph is not None, (
        "asphere kernel expects kappa/asph; use pallas_batch for spheres")
    assert not config.double_precision, (
        "fused kernels are float32; double_precision needs ops.trace")
    w_order = "outer" if _wouter_ok(xy) else "inner"
    xpb, ypb, cyb, z0, mu, shape = prepare_fused_inputs_batch(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order=w_order)
    B, F, P, W = shape
    outs = trace_fused_asphere_batch(
        xpb, ypb, cyb, z0, lens.c, lens.kappa, lens.t, mu, lens.asph,
        rows, penalties, config.newton_iters, config.allow_backward_rays,
        _static_mask(lens.structure),
        F * P if w_order == "outer" else None)
    return package_fused_result_batch(outs, shape, penalties, w_order)


def trace_rays_fused_asphere(specs, lens, config,
                             key: Optional[jax.Array] = None,
                             xy=None, rows: int = DEFAULT_ROWS,
                             penalties: bool = False,
                             use_vig: bool = True):
    """``trace_rays`` on the fused asphere kernel (B == 1, conic/asphere).

    Mirrors ``pallas_trace.trace_rays_fused`` (vignetting, backward-ray
    removal, and padded tails included); the lens must carry ``kappa`` and
    ``asph`` (use ``jnp.zeros`` for absent terms). ``config.newton_iters``
    controls the in-kernel Newton count.
    """
    from torchoptics_tpu.ops.pallas_trace import (
        _assert_fused_config, _wouter_ok, compress_padded_tail,
        package_fused_result, prepare_fused_inputs)

    assert lens.kappa is not None and lens.asph is not None, (
        "asphere kernel expects kappa/asph; use pallas_trace for spheres")
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, config)

    w_order = "outer" if _wouter_ok(xy) else "inner"
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order=w_order)
    _, F, P, W = shape
    outs = trace_fused_asphere(
        xp, yp, cyb, z0, lens.c[0], lens.kappa[0], lens.t[0], mu,
        lens.asph[0], rows, penalties, config.newton_iters,
        config.allow_backward_rays,
        F * P if w_order == "outer" else None)
    return package_fused_result(outs, shape, penalties, w_order)


def optical_paths_fused_asphere_batch(specs, lens, config,
                                      key: Optional[jax.Array] = None,
                                      xy=None, rows=BATCH_ROWS,
                                      use_vig: bool = True):
    """``ops.wavefront.optical_path_lengths`` on the batched conic/asphere
    kernel (B ≥ 1, f32): returns (TraceResult, OPL) with OPL (B, F, P, W)
    in mm, launch plane-wave phase included — the population analogue of
    :func:`optical_paths_fused_asphere`."""
    from torchoptics_tpu.ops.pallas_batch import (
        _static_mask, package_fused_result_batch, prepare_fused_inputs_batch)
    from torchoptics_tpu.ops.pallas_trace import _wouter_ok

    assert lens.kappa is not None and lens.asph is not None, (
        "asphere OPL kernel expects kappa/asph; use pallas_batch for spheres")
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
    outs = trace_fused_asphere_batch_opl(
        xpb, ypb, cyb, z0, lens.c, lens.kappa, lens.t, mu, lens.asph,
        n_legs, rows, config.newton_iters, config.allow_backward_rays,
        _static_mask(lens.structure),
        F * P if w_order == "outer" else None)
    res = package_fused_result_batch(outs[:6], shape, False, w_order)
    opl_flat = outs[6] + ypb * cyb
    if w_order == "outer":
        opl = jnp.transpose(opl_flat.reshape(B, W, F, P), (0, 2, 3, 1))
    else:
        opl = opl_flat.reshape(shape)
    return res, opl


def optical_paths_fused_asphere(specs, lens, config,
                                key: Optional[jax.Array] = None,
                                xy=None, rows: int = DEFAULT_ROWS,
                                use_vig: bool = True):
    """``ops.wavefront.optical_path_lengths`` on the fused conic/asphere
    kernel (B == 1, f32): returns (TraceResult, OPL) with OPL (1, F, P, W)
    in mm, launch plane-wave phase included — the asphere analogue of
    ``pallas_trace.optical_paths_fused`` (per-surface distance stacks never
    touch HBM; differentiable through c, kappa, t, asph and dispersion)."""
    from torchoptics_tpu.ops.pallas_trace import (
        _assert_fused_config, _wouter_ok, compress_padded_tail,
        package_fused_result)

    assert lens.kappa is not None and lens.asph is not None, (
        "asphere OPL kernel expects kappa/asph; use pallas_trace for spheres")
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, config)
    n = lens.get_refractive_indices(config.wavelengths)      # (1, S, W)
    n_legs = jnp.concatenate((jnp.ones_like(n[:, :1, :]), n),
                             axis=1)[0]                      # (S+1, W)
    from torchoptics_tpu.ops.pallas_trace import prepare_fused_inputs
    w_order = "outer" if _wouter_ok(xy) else "inner"
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, config, key=key, xy=xy, use_vig=use_vig,
        w_order=w_order)
    _, F, P, W = shape
    outs = trace_fused_asphere_opl(
        xp, yp, cyb, z0, lens.c[0], lens.kappa[0], lens.t[0], mu,
        lens.asph[0], n_legs, rows, config.newton_iters,
        config.allow_backward_rays, F * P if w_order == "outer" else None)
    res = package_fused_result(outs[:6], shape, False, w_order)
    # Plane-wave launch phase y_p·sin(u) (see pallas_trace.optical_paths_fused).
    opl_flat = outs[6] + yp * cyb
    if w_order == "outer":
        opl = jnp.transpose(opl_flat.reshape(W, F, P), (1, 2, 0))[None]
    else:
        opl = opl_flat.reshape(shape)
    return res, opl


def compute_losses_fused_asphere(specs, lens, config,
                                 g=None, catalog_g=None,
                                 key: Optional[jax.Array] = None,
                                 rows: int = DEFAULT_ROWS):
    """The FULL weighted loss on the fused conic/asphere kernel — the
    asphere analogue of ``pallas_trace.compute_losses_fused`` (single
    system). Returns (total, loss_dict) matching the XLA stacks path."""
    import math as _math
    from torchoptics_tpu.ops.pallas_trace import (
        _assert_fused_config, _path_bounds, compress_padded_tail,
        prepare_fused_inputs, spot_rms_flat_wouter)
    from torchoptics_tpu import simulator as sim_mod

    cfg = config.trace_config()
    assert lens.kappa is not None and lens.asph is not None, (
        "compute_losses_fused_asphere expects kappa/asph")
    lens = compress_padded_tail(lens)
    _assert_fused_config(lens, cfg)

    bounds = _path_bounds(lens.structure, config.ray_path_lower_thresholds,
                          config.ray_path_upper_thresholds)
    angle_thr = _math.cos(_math.radians(config.ray_angle_threshold)) ** 2

    # W-outer front-end + flat reductions: no (F, P, W) relayout ever
    # materializes (see `pallas_trace.spot_rms_fused`).
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, cfg, key=key, w_order="outer")
    _, F, P, W = shape
    vertex_z = jnp.cumsum(lens.t[0])
    ref_z = jnp.concatenate((vertex_z, vertex_z[-1:]))

    outs = trace_fused_asphere_full(
        xp, yp, cyb, z0, lens.c[0], lens.kappa[0], lens.t[0], mu,
        lens.asph[0], ref_z, rows, cfg.newton_iters,
        cfg.allow_backward_rays, bounds, angle_thr, F * P)
    pth, ptp, pz, ppath, pang = outs[6:]

    n_rays = F * P * W
    rms = spot_rms_flat_wouter(outs, F, P, W, config.spot_metric)
    n_sequence = int(lens.structure.n_surfaces[0])
    sumQ = (jnp.sum(pth) + jnp.sum(ptp) + jnp.sum(pz)) / n_sequence
    Lu = rms + config.penalty_rate * sumQ
    loss_dict = {
        "loss_unsup": Lu, "rms": rms, "penalty": sumQ,
        "spot_size": rms,
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
