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


def _widx(i, rows, w):
    """Wavelength index of each ray in the (rows, 128) tile of grid step i
    (wavelength is innermost in the flattened ray order)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = (i * rows + row) * LANES + col
    return flat % w


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


def _bwd_surface(c, t, mu, pre, loc, d, dcos2_extra=None, dcos2p_extra=None):
    """Adjoint of ``_fwd_surface``. ``pre`` = pre-surface state,
    ``loc`` = recomputed locals, ``d`` = (dxD, dyD, dzD, dcxD, dcyD, dczD);
    ``dcos2*_extra`` inject penalty-term cotangents on the raw cos² locals.

    Returns (d_pre_state, dc_k, dt_k, dmu_ray)."""
    x, y, z, cx, cy, cz, ok = pre
    dxD, dyD, dzD, dcxD, dcyD, dczD = d
    ok1 = loc["ok1"]
    ok2 = ok1 & ~loc["fail2"]
    cos, cosp, g = loc["cos"], loc["cosp"], loc["g"]
    denom, dist, temp, m2, e = (loc["denom"], loc["dist"], loc["temp"],
                                loc["m2"], loc["e"])
    xB, yB, cxB, cyB = loc["xB"], loc["yB"], loc["cxB"], loc["cyB"]
    cxC, cyC, czC = loc["cxC"], loc["cyC"], loc["czC"]

    dt_k = -jnp.sum(dzD)  # z_next = zD - t

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

    return (dx, dy, dz, dcx, dcy, dcz), jnp.sum(dc_ray), dt_k, dmu_ray


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


def _fwd_kernel(n_surf, w, rows, penalties, z0_ref, c_ref, t_ref, mu_ref,
                xp_ref, yp_ref, cy_ref, *outs):
    if penalties:
        (x_out, y_out, cx_out, cy_out, ok_out, bw_out,
         pth_out, ptp_out, pz_out) = outs
    else:
        x_out, y_out, cx_out, cy_out, ok_out, bw_out = outs
    i = pl.program_id(0)
    widx = _widx(i, rows, w)
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

    for k in range(n_surf):
        mu = _mu_of(mu_ref, k, widx, w)
        (x, y, z, cx, cy, cz, ok2), loc = _fwd_surface(
            c_ref[k], t_ref[k], mu, x, y, z, cx, cy, cz, ok)
        if k > 0:
            bw = bw | ((loc["delta_z"] < 0) & loc["ok1"])
        ok = ok2
        if penalties:
            pen_th = pen_th + _theta_norm(loc["cos2"], ok)
            pen_tp = pen_tp + _theta_norm(loc["cos2p"], ok)
            pen_z = pen_z + jnp.maximum(z, 0.0)

    # transfer to image plane
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



# Locals stashed by the backward kernel's forward pass (so the reverse loop
# applies the adjoint without recomputation). Order is load-bearing.
_LOC_F32 = ("cos", "cosp", "g", "denom", "dist", "temp", "m2", "e",
            "xB", "yB", "cxB", "cyB", "cxC", "cyC", "czC", "cos2", "cos2p")
_LOC_BOOL = ("ok1", "fail1", "fail2a", "fail2")
_N_LOC_F32 = len(_LOC_F32)
_N_LOC_BOOL = len(_LOC_BOOL)


def _bwd_kernel(n_surf, w, rows, penalties, z0_ref, c_ref, t_ref, mu_ref,
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
    i = pl.program_id(0)
    widx = _widx(i, rows, w)

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

    if penalties:
        dpth = dpth_ref[...]
        dptp = dptp_ref[...]
        dpz = dpz_ref[...]

    # ---- reverse surface loop over the stashed locals (no recompute) ----
    for k in range(n_surf - 1, -1, -1):
        pre = (st_x[k], st_y[k], st_z[k], st_cx[k], st_cy[k], st_cz[k],
               st_ok[k])
        mu = _mu_of(mu_ref, k, widx, w)
        loc = {name: st_locf[li, k] for li, name in enumerate(_LOC_F32)}
        loc.update({name: st_locb[li, k]
                    for li, name in enumerate(_LOC_BOOL)})
        dcos2_extra = dcos2p_extra = None
        if penalties:
            ok_end = loc["ok1"] & ~loc["fail2"]
            # z_next = zD - t with zD = where(ok2, zB, 0); zB is the state z
            # BEFORE the next surface = st_z[k+1] (or the post-loop z).
            z_next = st_z[k + 1] if k + 1 < n_surf else z
            # pen_z += relu(z_next): inject into the incoming z adjoint.
            dz = dz + dpz * (z_next > 0)
            dcos2_extra = _theta_norm_adjoint(loc["cos2"], ok_end, dpth)
            dcos2p_extra = _theta_norm_adjoint(loc["cos2p"], ok_end, dptp)
        (dx, dy, dz, dcx, dcy, dcz), dc_k, dt_k, dmu_ray = _bwd_surface(
            c_ref[k], t_ref[k], mu, pre, loc, (dx, dy, dz, dcx, dcy, dcz),
            dcos2_extra, dcos2p_extra)
        dc_out[0, k] += dc_k
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


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def trace_fused(xp, yp, cy, z0, c, t, mu, rows=DEFAULT_ROWS,
                penalties=False):
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

    Returns (x, y, cx, cy, ray_ok, ray_backward[, pen_theta, pen_theta_p,
    pen_zrelu]), each (N,).
    """
    return _run_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties)


def _run_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties):
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
    n_f32 = 4 + (3 if penalties else 0)
    out_shapes = (
        [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.bool_)] * 2
        + [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * (n_f32 - 4))

    outs = pl.pallas_call(
        partial(_fwd_kernel, n_surf, w, rows, penalties),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # z0 (1,1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # c (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t (S,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mu (S,W)
            ray_spec, ray_spec, ray_spec,
        ],
        out_specs=tuple([ray_spec] * len(out_shapes)),
        out_shape=tuple(out_shapes),
    )(jnp.reshape(z0, (1, 1)).astype(jnp.float32),
      c.astype(jnp.float32), t.astype(jnp.float32), mu.astype(jnp.float32),
      xp2, yp2, cy2)

    unpad = lambda a: a.reshape(-1)[:n]
    return tuple(unpad(o) for o in outs)


def _fused_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties):
    out = _run_fwd(xp, yp, cy, z0, c, t, mu, rows, penalties)
    return out, (xp, yp, cy, z0, c, t, mu)


def _fused_bwd(rows, penalties, residuals, cotangents):
    xp, yp, cy, z0, c, t, mu = residuals
    if penalties:
        dx, dy, dcx, dcy, _dok, _dbw, dpth, dptp, dpz = cotangents
    else:
        dx, dy, dcx, dcy, _dok, _dbw = cotangents
        dpth = dptp = dpz = None

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
    if penalties:
        pen_in = [as2d(dpth), as2d(dptp), as2d(dpz)]
    n_rows = xp2.shape[0]
    n_tiles = n_rows // rows
    grid = (n_tiles,)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # Param-grad outputs: whole-array SMEM blocks shared by every grid step
    # (TPU grids are sequential), accumulated in-kernel. Scalars cannot be
    # stored to VMEM, and partial blocks in SMEM must match the array shape.
    scalar_tile = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (0,) + (0,) * len(shape),
        memory_space=pltpu.SMEM)

    out_shape = (
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # dxp
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # dyp
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),  # dcy
        jax.ShapeDtypeStruct((1, 1), jnp.float32),           # dz0
        jax.ShapeDtypeStruct((1, n_surf), jnp.float32),      # dc
        jax.ShapeDtypeStruct((1, n_surf), jnp.float32),      # dt
        jax.ShapeDtypeStruct((1, n_surf, w), jnp.float32),   # dmu
    )
    scratch = [pltpu.VMEM((n_surf, rows, LANES), jnp.float32)
               for _ in range(6)]
    scratch.append(pltpu.VMEM((n_surf, rows, LANES), jnp.bool_))
    scratch.append(pltpu.VMEM((_N_LOC_F32, n_surf, rows, LANES), jnp.float32))
    scratch.append(pltpu.VMEM((_N_LOC_BOOL, n_surf, rows, LANES), jnp.bool_))

    outs = pl.pallas_call(
        partial(_bwd_kernel, n_surf, w, rows, penalties),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec,
            ray_spec, ray_spec, ray_spec, ray_spec,
        ] + [ray_spec] * len(pen_in),
        out_specs=(
            ray_spec, ray_spec, ray_spec,
            scalar_tile((1,)),
            scalar_tile((n_surf,)),
            scalar_tile((n_surf,)),
            scalar_tile((n_surf, w)),
        ),
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(jnp.reshape(z0, (1, 1)).astype(jnp.float32),
      c.astype(jnp.float32), t.astype(jnp.float32), mu.astype(jnp.float32),
      xp2, yp2, cy2, dx2, dy2, dcx2, dcy2, *pen_in)

    dxp2, dyp2, dcy2_out, dz0_p, dc_p, dt_p, dmu_p = outs
    unpad = lambda a: a.reshape(-1)[:n]
    dxp = unpad(dxp2)
    dyp = unpad(dyp2)
    dcy_out = unpad(dcy2_out)
    dz0 = dz0_p.reshape(jnp.shape(z0))
    return dxp, dyp, dcy_out, dz0, dc_p[0], dt_p[0], dmu_p[0]


trace_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# High-level wrapper mirroring trace_rays for the flagship configuration.
# ---------------------------------------------------------------------------


def _assert_fused_config(lens, config):
    assert len(lens) == 1, "fused kernel is single-system; use ops.trace"
    assert bool(np.all(lens.structure.mask)), (
        "fused kernel expects no padded surfaces")
    assert config.vig_fn is None, (
        "fused kernel does not apply vignetting; use ops.trace")
    assert config.allow_backward_rays, (
        "fused kernel records backward rays but does not remove them; "
        "allow_backward_rays=False needs ops.trace")
    assert not config.double_precision, (
        "fused kernel is float32; double_precision needs ops.trace")


def prepare_fused_inputs(specs, lens, config, key=None, xy=None):
    """Shared front-end for the fused wrappers (spherical and asphere):
    dispersion, pupil placement, sampling, ray aiming (jnp engine,
    stop-gradient), EPD scaling, and the flatten to the kernel's ray order
    (wavelength innermost).

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

    if config.n_ray_aiming_iter > 0:
        from torchoptics_tpu.ops import aiming
        aiming_fn = aiming.ray_aiming(specs, lens.detach(), config, True)
        xp_rel, yp_rel = [jax.lax.stop_gradient(jnp.clip(v, -2.0, 2.0))
                          for v in aiming_fn(xp_rel, yp_rel)]

    xp = pupil_mod.scale_to_epd(xp_rel, specs.epd)
    yp = pupil_mod.scale_to_epd(yp_rel, specs.epd)

    F = len(config.rel_fields)
    W = len(config.wavelengths)
    u = specs.hfov[:, None] * jnp.asarray(config.rel_fields,
                                          jnp.float32)[None, :]
    cy = jnp.sin(u)[0]  # (F,)

    # Broadcast to the (F, P, W) block, wavelength innermost, then flatten.
    xpb = jnp.broadcast_to(xp, (1, F, xp.shape[2], W))[0]
    ypb = jnp.broadcast_to(yp, (1, F, yp.shape[2], W))[0]
    P = xpb.shape[1]
    cyb = jnp.broadcast_to(cy[:, None, None], (F, P, W))
    return (xpb.reshape(-1), ypb.reshape(-1), cyb.reshape(-1), z0, mu,
            (1, F, P, W))


def package_fused_result(outs, shape, penalties):
    """Reshape flat kernel outputs back to the (1, F, P, W) TraceResult."""
    from torchoptics_tpu.ops import trace as trace_mod
    x, y, cx, cy_out, ok, bw = outs[:6]
    result = trace_mod.TraceResult(
        x.reshape(shape), y.reshape(shape), cx.reshape(shape),
        cy_out.reshape(shape), ok.reshape(shape), bw.reshape(shape), None)
    if penalties:
        return result, tuple(p.reshape(shape) for p in outs[6:])
    return result


def trace_rays_fused(specs, lens, config, key: Optional[jax.Array] = None,
                     xy: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                     rows: int = DEFAULT_ROWS, penalties: bool = False):
    """``trace_rays`` on the fused Pallas kernel (B == 1, spherical).

    Ray aiming (if configured) runs on the jnp engine — it is a tiny tee-ray
    solve whose output is stop-gradient — and feeds the fused kernel.
    Returns a ``TraceResult`` shaped (1, F, P, W) like the jnp engine; with
    ``penalties`` it returns ``(TraceResult, (pen_theta, pen_theta_p,
    pen_zrelu))`` where each penalty is the per-ray sum over surfaces.
    """
    assert lens.is_spherical, "fused kernel is spherical; use ops.trace"
    _assert_fused_config(lens, config)
    xp, yp, cyb, z0, mu, shape = prepare_fused_inputs(
        specs, lens, config, key=key, xy=xy)
    outs = trace_fused(xp, yp, cyb, z0, lens.c[0], lens.t[0], mu, rows,
                       penalties)
    return package_fused_result(outs, shape, penalties)


def unsupervised_loss_fused(specs, lens, config,
                            key: Optional[jax.Array] = None,
                            rows: int = DEFAULT_ROWS):
    """The full unsupervised lens-design objective Lu = rms + rate·ΣQ on the
    fused kernel — no per-surface stacks ever touch HBM.

    ``config`` is a ``simulator.SimulatorConfig``. Matches
    ``simulator.do_ray_tracing``'s loss_dict numerically (tested).
    Returns (Lu, loss_dict).
    """
    from torchoptics_tpu.ops import metrics as metrics_mod
    cfg = config.trace_config()
    result, (pth, ptp, pz) = trace_rays_fused(
        specs, lens, cfg, key=key, rows=rows, penalties=True)
    rms = metrics_mod.compute_rms2d(result.x, result.y, result.ray_ok)[0]
    n_sequence = len(lens.structure.sequence[0])
    sumQ = (jnp.sum(pth) + jnp.sum(ptp) + jnp.sum(pz)) / n_sequence
    Lu = rms + config.penalty_rate * sumQ
    return Lu, {"loss_unsup": Lu, "rms": rms, "penalty": sumQ}
