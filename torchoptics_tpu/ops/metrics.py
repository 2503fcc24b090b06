"""Optical quality metrics computed from trace results.

Vectorized JAX ports of the reference's metric layer:

* ``compute_rms2d`` — RMS spot size (`ray_tracing_lite.py:678-702`). The TF
  twin uses a shapely polygon centroid (`ray_tracing.py:685-687`); for ray
  point sets the centroid equals the coordinate mean the torch path uses, so
  this is a pure masked mean/RMS — fully vectorized, no host round trip.
* ``compute_distortion`` (`ray_tracing.py:815-837`),
  ``compute_relative_illumination`` (`ray_tracing.py:840-862`),
  ``compute_ray_aiming_error`` (`ray_tracing.py:865-901`) — TF-only in the
  reference, first-class here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu.ops import aiming as aiming_mod


def compute_rms2d(x: jnp.ndarray, y: jnp.ndarray,
                  ray_ok: jnp.ndarray) -> jnp.ndarray:
    """Mean RMS spot size per system, (B,).

    Semantics match `ray_tracing_lite.py:678-702` exactly (validated against
    the reference as an oracle): the per-(field, wavelength) centroid is the
    plain mean over ALL rays (failed rays sit at the origin after
    ``reset_bad_rays``), the squared deviations are summed over valid rays
    only, and the denominator counts all rays.
    """
    B, F, P, W = jnp.broadcast_shapes(x.shape, y.shape)
    y = jnp.broadcast_to(y, (B, F, P, W))
    ray_ok = jnp.broadcast_to(ray_ok, (B, F, P, W))
    ycent = jnp.mean(y, axis=2)                 # (B, F, W)
    ymean = jnp.mean(ycent, axis=-1)            # (B, F)
    dev2 = jnp.where(ray_ok, (y - ymean[:, :, None, None]) ** 2, 0.0)
    ss = jnp.sum(dev2, axis=(2, 3))             # (B, F)
    # sqrt'(0) is infinite; a field whose valid rays all coincide (or all
    # failed) would otherwise produce NaN gradients through 0 * inf.
    pos = ss > 0
    rms_f = jnp.where(pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / (P * W)), 0.0)
    return jnp.mean(rms_f, axis=1)


def compute_spot_rms_xy(x: jnp.ndarray, y: jnp.ndarray,
                        ray_ok: jnp.ndarray) -> jnp.ndarray:
    """Radial RMS spot size about the per-field centroid, (B, F).

    The 2-D (sagittal + tangential) superset of the reference-parity y-only
    metric: `compute_rms2d` deliberately replicates
    `ray_tracing_lite.py:678-702`, which never sees x-deviations — a design
    refined against it can carry arbitrary sagittal blur. This metric is the
    optimization target selected by ``SimulatorConfig(spot_metric='xy')``
    across every engine (XLA and all fused Pallas loss paths).

    Centroid and denominator count valid rays only (masked, unlike
    `compute_rms2d`'s all-ray convention — there failed rays are pinned to
    the origin by construction; a masked centroid is the physically right
    choice for a 2-D target). sqrt is gradient-safe at 0 (perfect focus /
    all-failed fields return 0 with zero gradient, not NaN).
    """
    ok = ray_ok
    w = ok.astype(x.dtype)
    count = jnp.maximum(jnp.sum(w, axis=(2, 3)), 1.0)
    xc = jnp.sum(x * w, axis=(2, 3)) / count
    yc = jnp.sum(y * w, axis=(2, 3)) / count
    d2 = (x - xc[:, :, None, None]) ** 2 + (y - yc[:, :, None, None]) ** 2
    ss = jnp.sum(jnp.where(ok, d2, 0.0), axis=(2, 3))
    pos = ss > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / count), 0.0)


def compute_spot_rms(x: jnp.ndarray, y: jnp.ndarray, ray_ok: jnp.ndarray,
                     metric: str = "y") -> jnp.ndarray:
    """Per-system mean spot RMS, (B,), under the selected metric:
    ``'y'`` = reference-parity `compute_rms2d`; ``'xy'`` = field-mean of
    the radial `compute_spot_rms_xy`."""
    if metric == "y":
        return compute_rms2d(x, y, ray_ok)
    if metric == "xy":
        return jnp.mean(compute_spot_rms_xy(x, y, ray_ok), axis=1)
    raise ValueError(f"spot metric must be 'y' or 'xy', got {metric!r}")


def compute_distortion(specs: Specs, lens: Lens, relative_fields,
                       double_precision: bool = False) -> jnp.ndarray:
    """Relative distortion at each field, (B, F).

    Chief-ray height vs paraxial height at the paraxial image plane, with a
    defocus correction (reference `ray_tracing.py:815-837`).
    """
    from torchoptics_tpu.ops import trace as trace_mod
    cfg = trace_mod.TraceConfig(mode="chief", rel_fields=tuple(relative_fields),
                                wavelengths=("d",),
                                double_precision=double_precision)
    res = trace_mod.trace_rays(specs, lens, cfg)
    y = res.y.reshape(len(specs), -1)
    cy = res.cy.reshape(len(specs), -1)

    rel = jnp.asarray(relative_fields, dtype=y.dtype)
    efl, bfl = abcd_mod.get_first_order(lens)
    paraxial_heights = jnp.tan(rel[None, :] * specs.hfov[:, None]) * efl[:, None]

    rows = np.arange(len(specs))
    last_t = lens.t[rows, lens.structure.n_surfaces - 1]
    defocus = last_t - bfl
    ref_y = paraxial_heights + defocus[:, None] * cy / jnp.sqrt(1.0 - cy ** 2)
    return (y - ref_y) / ref_y


def compute_relative_illumination(specs: Specs, lens: Lens, relative_fields,
                                  vig_fn=None, n_ray_aiming_iter: int = 1,
                                  wavelengths=("d",),
                                  double_precision: bool = False) -> jnp.ndarray:
    """Relative illumination per field, (B, F, W).

    Two marginal rays + one sagittal ray per field, following
    doi:10.1117/12.938414 (reference `ray_tracing.py:840-862`). The first
    relative field must be 0; fields where rays fail fall back to 1.
    """
    from torchoptics_tpu.ops import trace as trace_mod
    eps = 1e-6
    assert relative_fields[0] == 0.0, "first relative field must be 0"

    cfg = trace_mod.TraceConfig(mode="tee", rel_fields=tuple(relative_fields),
                                vig_fn=vig_fn,
                                n_ray_aiming_iter=n_ray_aiming_iter,
                                wavelengths=tuple(wavelengths),
                                double_precision=double_precision)
    x = jnp.asarray([0.0, 0.0, 1.0], cfg.dtype).reshape(1, 1, -1, 1)
    y = jnp.asarray([1.0, -1.0, 0.0], cfg.dtype).reshape(1, 1, -1, 1)
    res = trace_mod.trace_rays(specs, lens, cfg, xy=(x, y))
    cx, cy, ray_ok = res.cx, res.cy, res.ray_ok

    rel_illum = ((cy[..., 0, :] - cy[..., 1, :]) * cx[..., 2, :]
                 / jnp.maximum(2.0 * cy[:, 0, 0, 0][:, None, None] ** 2, eps))

    validity = jnp.all(ray_ok, axis=(2, 3))[..., None]       # (B, F, 1)
    validity = validity & validity[:, 0, :][:, None, :]
    return jnp.where(validity, rel_illum, 1.0)


def compute_semi_apertures(specs: Specs, lens: Lens, n_rays: int = 33,
                           rel_fields=(0.0, 0.707, 1.0),
                           n_ray_aiming_iter: int = 1) -> jnp.ndarray:
    """Per-surface effective semi-apertures: max |hit height| over a
    meridional fan across the field (the working implementation of the
    reference's dormant ``find_effective_aperture`` stub,
    `optics_simulator_lite.py:507-521`). Returns (B, S)."""
    from torchoptics_tpu.ops import trace as trace_mod
    cfg = trace_mod.TraceConfig(mode="meridional_uniform", n_rays=(n_rays,),
                                rel_fields=tuple(rel_fields),
                                wavelengths=("d",),
                                n_ray_aiming_iter=n_ray_aiming_iter)
    res = trace_mod.trace_rays(specs, lens, cfg, aggregate=("x", "y"))
    # The stacks hold surface-hit heights; rays that failed at surface k are
    # reset to the axis from k onward, so no extra masking is needed (their
    # pre-failure heights still count, as the aperture search intends).
    r = jnp.sqrt(res.stacks["x"] ** 2 + res.stacks["y"] ** 2)  # (S, B, F, P, W)
    return jnp.moveaxis(jnp.max(r, axis=(2, 3, 4)), 0, 1)     # (B, S)


def compute_ray_aiming_error(specs: Specs, lens: Lens, rel_fields,
                             vig_fn=None, n_ray_aiming_iter: int = 1,
                             ray_aiming_mode: str = "real",
                             double_precision: bool = False):
    """Residual relative aiming error of the meridional ray pair at the stop
    (reference `ray_tracing.py:865-901`). Returns (B, F, 2, 1) or 0 when the
    stop is the first surface everywhere."""
    from torchoptics_tpu.ops import trace as trace_mod
    specs = specs.up_to_stop()
    lens = lens.up_to_stop()
    if all(k == 0 for k in lens.structure.stop_idx):
        return 0.0

    if ray_aiming_mode == "paraxial":
        magnification = abcd_mod.compute_magnification(lens)
        rs = (magnification * specs.epd / 2.0).reshape(-1, 1, 1, 1)
    elif ray_aiming_mode == "real":
        rs = aiming_mod.compute_pupil_radius(
            specs, lens, double_precision).reshape(-1, 1, 1, 1)
    else:
        raise ValueError(ray_aiming_mode)

    cfg = trace_mod.TraceConfig(mode="tee", rel_fields=tuple(rel_fields),
                                vig_fn=vig_fn, wavelengths=("d",),
                                n_ray_aiming_iter=n_ray_aiming_iter,
                                ray_aiming_mode=ray_aiming_mode,
                                double_precision=double_precision)
    y = jnp.asarray([-1.0, 1.0], cfg.dtype).reshape(1, 1, -1, 1)
    x = jnp.zeros_like(y)
    res = trace_mod.trace_rays(specs, lens, cfg, xy=(x, y), use_vig=True)

    from torchoptics_tpu.ops import pupil as pupil_mod
    if vig_fn is not None:
        fields = jnp.asarray(rel_fields, cfg.dtype)[None, :]
        vig_down = vig_fn(fields, specs.vig_down)
        vig_up = vig_fn(fields, specs.vig_up)
        y = pupil_mod.apply_vignetting(y, vig_up, vig_down)

    return res.y / rs - y


def compute_axial_color(lens: Lens, wavelengths=("F", "C")) -> jnp.ndarray:
    """Axial (longitudinal) chromatic aberration: BFL(λ₁) − BFL(λ₂), (B,).

    TPU-build superset — the reference has per-λ tracing but no chromatic
    focal-shift metric. Paraxial, via the per-wavelength ABCD chain with
    the elementwise 2×2 products of `ops.abcd` (no reduced-precision dot).
    For a thin singlet this closes on the classical −EFL/V law
    (`tests/test_metrics.py`)."""
    from torchoptics_tpu.models import glass as glass_mod
    wl = glass_mod.resolve_wavelengths(tuple(wavelengths))
    n = lens.get_refractive_indices(wl)                     # (B, S, 2)
    st = lens.structure
    rows = np.arange(len(lens))
    last = st.n_surfaces - 1
    t = lens.t.at[rows, last].set(0.0)

    def bfl_at(n_w):
        n_full = jnp.concatenate((jnp.ones_like(n_w[:, :1]), n_w), axis=1)
        m = abcd_mod.reduce_abcd(
            abcd_mod.interface_propagation_abcd(lens.c, t, n_full))
        return -m[:, 0, 0] / m[:, 1, 0]

    return bfl_at(n[..., 0]) - bfl_at(n[..., 1])


def compute_lateral_color(specs: Specs, lens: Lens, rel_field: float = 1.0,
                          wavelengths=("F", "C"),
                          n_ray_aiming_iter: int = 1) -> jnp.ndarray:
    """Lateral (transverse) chromatic aberration: chief-ray image-height
    difference y(λ₁) − y(λ₂) at ``rel_field``, (B,), in mm. Real chief-ray
    trace (TPU-build superset; no reference counterpart)."""
    from torchoptics_tpu.ops import trace as trace_mod
    cfg = trace_mod.TraceConfig(
        mode="chief", n_rays=(1,), rel_fields=(float(rel_field),),
        wavelengths=tuple(wavelengths),
        n_ray_aiming_iter=n_ray_aiming_iter)
    res = trace_mod.trace_rays(specs, lens, cfg)
    return res.y[:, 0, 0, 0] - res.y[:, 0, 0, 1]
