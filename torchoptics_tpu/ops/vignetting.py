"""Vignetting-factor solving.

The reference consumes user-supplied vignetting coefficients through an
opaque ``vig_fn`` and never computes them (`ray_tracing.py:479-490` simply
rescales the pupil sample); real design tools *solve* the factors so each
field's beam just clears the physical apertures. This module provides that
solver as a TPU-build superset:

* :func:`quadratic_vig_fn` — the standard ``v · field²`` coefficient model
  (a ready-made ``TraceConfig.vig_fn``).
* :func:`solve_vignetting` — given per-surface clear semi-apertures, find
  per-field ``vig_up/vig_down/vig_x`` factors such that the vignetted pupil
  is the largest one whose marginal rays pass every aperture. Fully
  jittable end-to-end (round 5): the fan traces, aperture margins, AND the
  first-blocked-crossing edge search are one XLA program — so solved
  factors can sit inside an optimization loop.
* :func:`table_vig_fn` — wrap solved per-field tables as a ``vig_fn``
  (interpolating in relative field) so the default trace auto-vignettes.
* :func:`fit_quadratic_vig` — least-squares projection of a solved table
  onto the quadratic model.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs


def quadratic_vig_fn(fields, coeff):
    """``vig(field) = coeff · field²`` — zero on axis, ``coeff`` at the
    field edge. ``fields`` is (1, F) relative fields, ``coeff`` (B,)."""
    return jnp.reshape(coeff, (-1, 1)) * fields ** 2


def table_vig_fn(solved_fields: Sequence[float], table):
    """Build a ``vig_fn`` that linearly interpolates a solved per-field
    table (B, F_solved) in relative field. The ``coeff`` argument of the
    ``vig_fn`` contract (normally ``specs.vig_*``) is ignored — the table
    already carries the per-system values."""
    sf = np.asarray(solved_fields, np.float64)
    order = np.argsort(sf)
    sf = jnp.asarray(sf[order])
    tb = jnp.asarray(table)[:, order]

    def vig_fn(fields, coeff):
        del coeff
        f = jnp.reshape(jnp.asarray(fields), (-1,))
        return jax.vmap(lambda row: jnp.interp(f, sf, row))(tb)   # (B, F)

    return vig_fn


def solved_tables_vig_fn(solved_fields: Sequence[float]):
    """A ``vig_fn`` that treats the ``specs.vig_*`` coefficient itself as a
    solved (B, F_solved) TABLE, interpolated in relative field.

    Unlike :func:`table_vig_fn` (one fixed table for every component), this
    lets a single ``TraceConfig`` carry DISTINCT up/down/x tables — put the
    solver outputs straight into the specs::

        out = solve_vignetting(specs, lens, fields)
        specs_v = dataclasses.replace(specs, vig_up=out["vig_up"],
                                      vig_down=out["vig_down"],
                                      vig_x=out["vig_x"])
        cfg = TraceConfig(..., vig_fn=solved_tables_vig_fn(fields))
    """
    sf_np = np.asarray(solved_fields, np.float64)
    order = np.argsort(sf_np)
    sf = jnp.asarray(sf_np[order])

    def vig_fn(fields, coeff):
        tb = jnp.asarray(coeff)[:, order]
        f = jnp.reshape(jnp.asarray(fields), (-1,))
        return jax.vmap(lambda row: jnp.interp(f, sf, row))(tb)   # (B, F)

    return vig_fn


def fit_quadratic_vig(rel_fields: Sequence[float], table) -> jnp.ndarray:
    """Least-squares ``coeff`` (B,) with ``table[b, f] ≈ coeff[b]·field²``."""
    f2 = jnp.asarray(np.asarray(rel_fields, np.float64) ** 2,
                     jnp.asarray(table).dtype)
    t = jnp.asarray(table)
    denom = jnp.sum(f2 * f2)
    coeff = jnp.sum(t * f2[None, :], axis=1) / jnp.maximum(denom, 1e-30)
    return jnp.where(denom > 0, coeff, 0.0)


def _edge(margins: jnp.ndarray, pupil: np.ndarray, upper: bool
          ) -> jnp.ndarray:
    """Sub-sample pupil edge from per-ray aperture margins — vectorized
    first-blocked-crossing (jittable; replaces the round-4 host-side
    ``np.ndindex`` walk).

    ``margins`` (..., P): max over surfaces of hit-radius / semi-aperture
    (∞ for rays the trace killed); a ray passes iff margin <= 1.
    ``pupil`` (P,) ascending host array containing 0. Walking outward from
    the chief ray, the first blocked sample scanning up (down) is the
    smallest (largest) blocked index above (below) the chief — a masked
    argmax — and the crossing is linearly interpolated.
    """
    pupil = np.asarray(pupil, np.float64)
    P = pupil.shape[0]
    i0 = int(np.argmin(np.abs(pupil)))        # static: pupil grid is host
    pj = jnp.asarray(pupil, margins.dtype)
    ar = np.arange(P)
    blocked = margins > 1.0

    if upper:
        cand = blocked & jnp.asarray(ar > i0)
        j = jnp.argmax(cand, axis=-1)                       # first True
        default = float(pupil[-1])
    else:
        cand = blocked & jnp.asarray(ar < i0)
        j = P - 1 - jnp.argmax(cand[..., ::-1], axis=-1)    # last True
        default = float(pupil[0])
    has = jnp.any(cand, axis=-1)
    j = jnp.where(has, j, i0 + 1 if upper else i0 - 1)      # safe indices
    i = j - 1 if upper else j + 1                           # last passing

    take = lambda a, idx: jnp.take_along_axis(a, idx[..., None],
                                              axis=-1)[..., 0]
    mi = take(margins, i)
    mj = take(margins, j)
    # Killed rays carry m = inf: the crossing collapses onto the last
    # passing sample (t = 0), exactly the host walk's convention.
    fin = jnp.isfinite(mj)
    t = jnp.where(fin, (1.0 - mi) / jnp.where(fin, mj - mi, 1.0), 0.0)
    edge = pj[i] + t * (pj[j] - pj[i])
    edge = jnp.where(has, edge, default)
    return jnp.where(take(margins, jnp.full_like(j, i0)) > 1.0, 0.0, edge)


def solve_vignetting(specs: Specs, lens: Lens,
                     rel_fields: Sequence[float],
                     semi_apertures: Optional[jnp.ndarray] = None,
                     n_scan: int = 129,
                     n_ray_aiming_iter: int = 1,
                     wavelength: str | float = "d",
                     tol: float = 1e-6) -> Dict[str, jnp.ndarray]:
    """Solve per-field vignetting factors against per-surface apertures.

    Args:
      semi_apertures: (B, S) clear semi-apertures. ``None`` sizes them from
        the axial (field-0) beam — the classical "the stop defines the
        apertures" choice, which yields zero vignetting on axis and clips
        off-axis beams to the axial footprint.
      rel_fields: fields to solve at (include 0.0 and the edge).
      n_scan: meridional/sagittal fan density (edge resolution ~2/n_scan,
        refined by linear interpolation of the aperture margin).

    Returns dict with per-field tables ``vig_up``/``vig_down``/``vig_x``
    (B, F) — ready for :func:`table_vig_fn` — and the fitted quadratic
    coefficients ``q_up``/``q_down``/``q_x`` (B,) for
    :func:`quadratic_vig_fn`.

    Jittable end-to-end (``jax.jit(lambda l: solve_vignetting(specs, l,
    fields))`` compiles; ``rel_fields``/``n_scan`` are static); outputs are
    device arrays.

    Semantics: the solved factors are the largest pupil rescaling
    (`ops.pupil.apply_vignetting`) whose meridional edge rays and sagittal
    edge ray pass every aperture; rays the trace itself kills (miss/TIR)
    count as blocked. Matches hand-set factors on tangent fields
    (``tests/test_vignetting.py``).

    Note on ray aiming: the trace composes vig-then-aim, and the aiming
    map is itself built from vignetted probe rays — so the factors are
    defined in the same pupil parameterization the consuming trace uses
    (self-consistent), but solving with ``n_ray_aiming_iter>0`` against
    apertures generated under a *different* vignetting carries an ~few-%
    aiming-map offset. Use ``n_ray_aiming_iter=0`` for exact round trips.
    """
    from torchoptics_tpu.ops import trace as trace_mod

    cfg = trace_mod.TraceConfig(
        mode="tee", rel_fields=tuple(float(f) for f in rel_fields),
        wavelengths=(wavelength,), n_ray_aiming_iter=n_ray_aiming_iter)
    surf_mask = np.asarray(lens.structure.mask)          # (B, S) static

    def fan_margins(xp, yp, sa):
        """(B, F, P) max over surfaces of hit-radius / semi-aperture."""
        res = trace_mod.trace_rays(specs, lens, cfg, xy=(xp, yp),
                                   aggregate=("x", "y"))
        # _safe_sqrt: the chief ray's hit radius is exactly 0 on every
        # surface at field 0, and sqrt(0) would poison jax.grad through
        # the solver (see CLAUDE.md's sqrt rule).
        r = trace_mod._safe_sqrt(res.stacks["x"] ** 2
                                 + res.stacks["y"] ** 2)  # (S, B, F, P, W)
        r = jnp.moveaxis(r, 0, 1)[..., 0]                # (B, S, F, P)
        m = r / jnp.maximum(sa[:, :, None, None], 1e-12)
        m = jnp.where(jnp.asarray(surf_mask)[:, :, None, None], m, 0.0)
        m = jnp.max(m, axis=1)                           # (B, F, P)
        ok = res.ray_ok[..., 0]                          # (B, F, P)
        return jnp.where(ok, m, jnp.inf)

    if semi_apertures is None:
        # Axial beam footprint: meridional + sagittal fan at field 0 only.
        cfg0 = trace_mod.TraceConfig(
            mode="tee", rel_fields=(0.0,), wavelengths=(wavelength,),
            n_ray_aiming_iter=n_ray_aiming_iter)
        p0 = jnp.linspace(-1.0, 1.0, n_scan).reshape(1, 1, -1, 1)
        res0 = trace_mod.trace_rays(
            specs, lens, cfg0,
            xy=(jnp.concatenate((jnp.zeros_like(p0), p0), axis=2),
                jnp.concatenate((p0, jnp.zeros_like(p0)), axis=2)),
            aggregate=("x", "y"))
        r0 = trace_mod._safe_sqrt(res0.stacks["x"] ** 2
                                  + res0.stacks["y"] ** 2)
        sa = jnp.max(jnp.moveaxis(r0, 0, 1)[..., 0], axis=(2, 3))  # (B, S)
    else:
        sa = jnp.asarray(semi_apertures)
    sa = sa * (1.0 + tol)

    pupil = np.linspace(-1.0, 1.0, n_scan)
    pj = jnp.asarray(pupil, jnp.float32).reshape(1, 1, -1, 1)
    zeros = jnp.zeros_like(pj)

    m_y = fan_margins(zeros, pj, sa)                     # meridional fan
    m_x = fan_margins(pj, zeros, sa)                     # sagittal fan

    up_edge = _edge(m_y, pupil, upper=True)              # (B, F)
    down_edge = _edge(m_y, pupil, upper=False)
    x_hi = _edge(m_x, pupil, upper=True)
    x_lo = _edge(m_x, pupil, upper=False)
    x_edge = jnp.minimum(x_hi, -x_lo)                    # symmetric in x

    out = {
        "vig_up": jnp.clip(1.0 - up_edge, 0.0, None),
        "vig_down": jnp.clip(1.0 + down_edge, 0.0, None),
        "vig_x": jnp.clip(1.0 - x_edge, 0.0, None),
        "semi_apertures": sa / (1.0 + tol),
    }
    rf = [float(f) for f in rel_fields]
    out["q_up"] = fit_quadratic_vig(rf, out["vig_up"])
    out["q_down"] = fit_quadratic_vig(rf, out["vig_down"])
    out["q_x"] = fit_quadratic_vig(rf, out["vig_x"])
    return out
