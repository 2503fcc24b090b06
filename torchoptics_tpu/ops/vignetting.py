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
  is the largest one whose marginal rays pass every aperture. One batched
  fan trace per pupil direction (jitted, any engine the XLA trace supports);
  the edge search is tiny host-side post-processing.
* :func:`table_vig_fn` — wrap solved per-field tables as a ``vig_fn``
  (interpolating in relative field) so the default trace auto-vignettes.
* :func:`fit_quadratic_vig` — least-squares projection of a solved table
  onto the quadratic model.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs


def quadratic_vig_fn(fields, coeff):
    """``vig(field) = coeff · field²`` — zero on axis, ``coeff`` at the
    field edge. ``fields`` is (1, F) relative fields, ``coeff`` (B,)."""
    return jnp.reshape(coeff, (-1, 1)) * fields ** 2


def table_vig_fn(solved_fields: Sequence[float], table: np.ndarray):
    """Build a ``vig_fn`` that linearly interpolates a solved per-field
    table (B, F_solved) in relative field. The ``coeff`` argument of the
    ``vig_fn`` contract (normally ``specs.vig_*``) is ignored — the table
    already carries the per-system values."""
    sf = np.asarray(solved_fields, np.float64)
    order = np.argsort(sf)
    sf = jnp.asarray(sf[order])
    tb = jnp.asarray(np.asarray(table)[:, order])

    def vig_fn(fields, coeff):
        del coeff
        f = jnp.reshape(jnp.asarray(fields), (-1,))
        per_sys = jnp.stack([jnp.interp(f, sf, tb[b])
                             for b in range(tb.shape[0])])
        return per_sys                                   # (B, F)

    return vig_fn


def fit_quadratic_vig(rel_fields: Sequence[float],
                      table: np.ndarray) -> np.ndarray:
    """Least-squares ``coeff`` (B,) with ``table[b, f] ≈ coeff[b]·field²``."""
    f2 = np.asarray(rel_fields, np.float64) ** 2
    t = np.asarray(table, np.float64)
    denom = np.sum(f2 * f2)
    if denom == 0.0:
        return np.zeros(t.shape[0])
    return np.sum(t * f2[None, :], axis=1) / denom


def _edge(margins: np.ndarray, pupil: np.ndarray, upper: bool) -> np.ndarray:
    """Sub-sample pupil edge from per-ray aperture margins.

    ``margins`` (..., P): max over surfaces of hit-radius / semi-aperture
    (∞ for rays the trace killed); a ray passes iff margin <= 1.
    ``pupil`` (P,) ascending, containing 0. Walk outward from the chief ray
    to the first blocked sample and linearly interpolate the crossing.
    """
    P = pupil.shape[0]
    i0 = int(np.argmin(np.abs(pupil)))
    lead = margins.shape[:-1]
    out = np.empty(lead)
    it = np.ndindex(*lead) if lead else [()]
    for idx in it:
        m = margins[idx]
        if m[i0] > 1.0:                 # chief ray itself blocked
            out[idx] = 0.0
            continue
        rng = range(i0, P - 1) if upper else range(i0, 0, -1)
        edge = pupil[-1] if upper else pupil[0]
        for i in rng:
            j = i + 1 if upper else i - 1
            if m[j] > 1.0:
                mi, mj = m[i], m[j]
                t = 0.0 if not np.isfinite(mj) else (1.0 - mi) / (mj - mi)
                edge = pupil[i] + t * (pupil[j] - pupil[i])
                break
        out[idx] = edge
    return out


def solve_vignetting(specs: Specs, lens: Lens,
                     rel_fields: Sequence[float],
                     semi_apertures: Optional[jnp.ndarray] = None,
                     n_scan: int = 129,
                     n_ray_aiming_iter: int = 1,
                     wavelength: str | float = "d",
                     tol: float = 1e-6) -> Dict[str, np.ndarray]:
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
    surf_mask = np.asarray(lens.structure.mask)          # (B, S)

    def fan_margins(xp, yp):
        """(B, F, P) max over surfaces of hit-radius / semi-aperture."""
        res = trace_mod.trace_rays(specs, lens, cfg, xy=(xp, yp),
                                   aggregate=("x", "y"))
        r = np.sqrt(np.asarray(res.stacks["x"]) ** 2
                    + np.asarray(res.stacks["y"]) ** 2)  # (S, B, F, P, W)
        r = np.moveaxis(r, 0, 1)[..., 0]                 # (B, S, F, P)
        sa_ = np.asarray(sa, np.float64)                 # (B, S)
        with np.errstate(divide="ignore", invalid="ignore"):
            m = r / np.maximum(sa_[:, :, None, None], 1e-12)
        m = np.where(surf_mask[:, :, None, None], m, 0.0)
        m = np.max(m, axis=1)                            # (B, F, P)
        ok = np.asarray(res.ray_ok)[..., 0]              # (B, F, P)
        return np.where(ok, m, np.inf)

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
        r0 = np.sqrt(np.asarray(res0.stacks["x"]) ** 2
                     + np.asarray(res0.stacks["y"]) ** 2)
        sa = np.max(np.moveaxis(r0, 0, 1)[..., 0], axis=(2, 3))  # (B, S)
    else:
        sa = np.asarray(semi_apertures, np.float64)
    sa = sa * (1.0 + tol)

    pupil = np.linspace(-1.0, 1.0, n_scan)
    pj = jnp.asarray(pupil, jnp.float32).reshape(1, 1, -1, 1)
    zeros = jnp.zeros_like(pj)

    m_y = fan_margins(zeros, pj)                         # meridional fan
    m_x = fan_margins(pj, zeros)                         # sagittal fan

    up_edge = _edge(m_y, pupil, upper=True)              # (B, F)
    down_edge = _edge(m_y, pupil, upper=False)
    x_hi = _edge(m_x, pupil, upper=True)
    x_lo = _edge(m_x, pupil, upper=False)
    x_edge = np.minimum(x_hi, -x_lo)                     # symmetric in x

    out = {
        "vig_up": np.clip(1.0 - up_edge, 0.0, None),
        "vig_down": np.clip(1.0 + down_edge, 0.0, None),
        "vig_x": np.clip(1.0 - x_edge, 0.0, None),
        "semi_apertures": sa / (1.0 + tol),
    }
    rf = [float(f) for f in rel_fields]
    out["q_up"] = fit_quadratic_vig(rf, out["vig_up"])
    out["q_down"] = fit_quadratic_vig(rf, out["vig_down"])
    out["q_x"] = fit_quadratic_vig(rf, out["vig_x"])
    return out
