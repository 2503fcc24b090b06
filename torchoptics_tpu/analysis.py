"""Population-scale lens analysis: Monte-Carlo tolerancing, sensitivity
tables, manufacturing yield.

TPU-build superset — the reference has no tolerancing machinery (its
population axis exists only as the serial generator loop,
`torchlens/optical_loss.py:99-122`). Here a tolerance run IS the batched
trace: one fused kernel launch evaluates thousands of perturbed copies of
a design, so a 10k-sample Monte-Carlo costs milliseconds on a v5e chip,
and the sensitivity table is one `jax.grad` of the same differentiable
spot-size objective the optimizer uses.

Conventions follow the rest of the package: `Structure` is static, the
perturbed population is an ordinary (B, S) `Lens` pytree, and every entry
point is jittable (static `n_samples`, explicit PRNG key).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs, Structure
from torchoptics_tpu import simulator as sim_mod
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu.ops import metrics as metrics_mod
from torchoptics_tpu.ops import trace as trace_mod

__all__ = [
    "Tolerances", "tile_population", "perturb_lens",
    "tolerance_analysis", "sensitivities", "field_mtf",
    "diffraction_mtf", "wavefront_rms", "refocus",
    "ray_fans", "field_curvature", "longitudinal_aberration",
    "seidel_coefficients", "seidel_focal_shifts",
]


def field_mtf(specs: Specs, lens: Lens, config: sim_mod.SimulatorConfig,
              key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Per-field geometric MTF of a (B=1) design.

    Renders the per-field PSFs at ``config.psf_shape`` /
    ``config.psf_abs_pixel_size`` (the imaging pipeline's sampling) and
    returns `ops.psf.compute_mtf` cuts: ``freqs_t``/``freqs_s`` in
    cycles/mm and ``mtf_t``/``mtf_s`` shaped (n_fields, 3, n_freq) —
    tangential/sagittal modulation per field and RGB channel. Jittable and
    differentiable end to end.
    """
    from torchoptics_tpu import imaging
    from torchoptics_tpu.ops import psf as psf_mod
    model = imaging.sample_optics_model(specs, lens, config, key=key)
    psfs = jnp.transpose(model.sampled_psfs, (0, 3, 1, 2))  # (F, 3, ph, pw)
    return psf_mod.compute_mtf(psfs, config.psf_abs_pixel_size)


def through_focus_mtf(specs: Specs, lens: Lens,
                      config: sim_mod.SimulatorConfig,
                      deltas,
                      key: Optional[jax.Array] = None
                      ) -> Dict[str, jnp.ndarray]:
    """Through-focus geometric MTF scan — the classical report-card plot
    of modulation vs image-plane shift (VERDICT r4 #8).

    Tiles the (B=1) design over the static ``deltas`` sweep (mm, added to
    the final thickness — the same δ parameterization as :func:`refocus`),
    traces the whole sweep as ONE batched population, renders
    centroid-referenced per-(δ, field) PSFs at the configured sampling,
    and returns `ops.psf.compute_mtf` cuts:

      ``deltas``            (D,) the sweep (echoed as a device array)
      ``freqs_t``/``freqs_s`` (K,) cycles/mm
      ``mtf_t``/``mtf_s``   (D, F, W, K) tangential/sagittal modulation
                            per focus position, field, and wavelength

    Jittable and differentiable (static ``deltas`` length). To read the
    curve at one frequency, interpolate along the last axis
    (``jnp.interp(f0, out["freqs_t"], out["mtf_t"][d, f, w])``).
    """
    from torchoptics_tpu.ops import psf as psf_mod

    deltas_np = np.asarray(deltas, np.float64).reshape(-1)
    D = deltas_np.shape[0]
    specs_n, lens_n = tile_population(specs, lens, D)
    rows = np.arange(D)
    last = lens_n.structure.n_surfaces - 1
    t_new = lens_n.t.at[rows, last].add(
        jnp.asarray(deltas, lens.dtype).reshape(-1))
    lens_n = lens_n.replace(t=t_new)

    cfg = config.trace_config()
    res = trace_mod.trace_rays(specs_n, lens_n, cfg, key=key)
    F = res.x.shape[1]
    W = res.x.shape[3]
    # compute_psf expects (B, F, channels, rays) with channels = W here —
    # one PSF (and MTF) per wavelength; centroid-referenced (y_target=None
    # is the per-grid centroid), zero-weighted failed rays excluded by the
    # splat itself being position-based (failed rays sit at the origin —
    # same convention as the reference's PSF, `ray_tracing.py:206-270`).
    x = jnp.transpose(res.x, (0, 1, 3, 2))
    y = jnp.transpose(res.y, (0, 1, 3, 2))
    *_, kernels, _ = psf_mod.compute_psf(
        x, y, n_bins=tuple(config.psf_shape),
        increment=config.psf_abs_pixel_size)
    ny, nx = kernels.shape[-2:]
    kernels = kernels.reshape(D, F, W, ny, nx)
    out = psf_mod.compute_mtf(kernels, config.psf_abs_pixel_size)
    out["deltas"] = jnp.asarray(deltas_np, res.x.dtype)
    return out


@dataclass(frozen=True)
class Tolerances:
    """1-sigma (normal) or half-width (uniform) manufacturing perturbations.

    Units match the lens parameters: ``c`` in 1/mm, ``t`` in mm, ``nd``/``v``
    absolute index/Abbe error, ``kappa`` absolute, ``asph`` *relative*
    (multiplies each coefficient). Scalars broadcast over surfaces; (S,)
    arrays give per-surface tolerances.
    """

    c: float = 0.0
    t: float = 0.0
    nd: float = 0.0
    v: float = 0.0
    kappa: float = 0.0
    asph_rel: float = 0.0
    distribution: str = "normal"  # or "uniform"

    def __post_init__(self):
        if self.distribution not in ("normal", "uniform"):
            raise ValueError(
                f"distribution must be 'normal' or 'uniform', "
                f"got {self.distribution!r}")


def _tile_structure(structure: Structure, n: int) -> Structure:
    return Structure(structure.stop_idx * n, structure.sequence * n,
                     pad_to=structure.pad_to)


def tile_population(specs: Specs, lens: Lens, n: int
                    ) -> Tuple[Specs, Lens]:
    """Tile a single design (B=1) into an n-sample population."""
    if len(lens) != 1:
        raise ValueError(
            f"tile_population expects a single design (B=1), got B={len(lens)}")
    st = _tile_structure(lens.structure, n)
    rep = lambda a: None if a is None else jnp.tile(a, (n,) + (1,) * (a.ndim - 1))
    lens_n = Lens(st, rep(lens.c), rep(lens.t), rep(lens.nd), rep(lens.v),
                  kappa=rep(lens.kappa), asph=rep(lens.asph))
    specs_n = Specs(st, rep(specs.epd), rep(specs.hfov), rep(specs.vig_up),
                    rep(specs.vig_down), rep(specs.vig_x))
    return specs_n, lens_n


def _noise(key, shape, distribution):
    if distribution == "uniform":
        return jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    return jax.random.normal(key, shape)


def perturb_lens(lens: Lens, key: jax.Array, tol: Tolerances,
                 keep_first_nominal: bool = True) -> Lens:
    """Add independent manufacturing noise to every valid surface of every
    system in the population. With ``keep_first_nominal`` sample 0 stays
    exactly the nominal design (free nominal reference in the same launch).
    """
    st = lens.structure
    B, S = st.mask.shape
    mask = jnp.asarray(st.mask, lens.dtype)
    mask_G = jnp.asarray(st.mask_G, lens.dtype)
    if keep_first_nominal:
        live = jnp.concatenate(
            [jnp.zeros((1, 1), lens.dtype), jnp.ones((B - 1, 1), lens.dtype)])
        mask = mask * live
        mask_G = mask_G * live

    k = jax.random.split(key, 6)
    dist = tol.distribution
    sig = lambda s: jnp.asarray(s, lens.dtype)
    out = {}
    out["c"] = lens.c + sig(tol.c) * mask * _noise(k[0], (B, S), dist)
    out["t"] = lens.t + sig(tol.t) * mask * _noise(k[1], (B, S), dist)
    out["nd"] = lens.nd + sig(tol.nd) * mask_G * _noise(k[2], (B, S), dist)
    out["v"] = lens.v + sig(tol.v) * mask_G * _noise(k[3], (B, S), dist)
    kappa = lens.kappa
    if kappa is not None and np.any(np.asarray(tol.kappa) != 0):
        kappa = kappa + sig(tol.kappa) * mask * _noise(k[4], (B, S), dist)
    asph = lens.asph
    if asph is not None and np.any(np.asarray(tol.asph_rel) != 0):
        K = asph.shape[-1]
        asph = asph * (1.0 + sig(tol.asph_rel) * mask[..., None]
                       * _noise(k[5], (B, S, K), dist))
    return Lens(st, out["c"], out["t"], out["nd"], out["v"],
                kappa=kappa, asph=asph)


def _per_sample_rms(specs: Specs, lens: Lens,
                    config: sim_mod.SimulatorConfig,
                    key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Per-system polychromatic spot RMS, (B,), on the configured engine
    and ``config.spot_metric`` ('y' reference parity / 'xy' radial).

    ``trace_engine='pallas'`` runs the whole population in one fused batch
    launch (W-outer fast path); the XLA engines trace + reduce."""
    cfg = config.trace_config()
    if cfg.engine == "pallas":
        from torchoptics_tpu.ops import pallas_batch
        _, ld = pallas_batch.batched_unsupervised_loss(
            specs, lens, config, key=key)
        return ld["rms"]
    res = trace_mod.trace_rays(specs, lens, cfg, key=key)
    if config.spot_metric == "xy":
        return jnp.mean(
            metrics_mod.compute_spot_rms_xy(res.x, res.y, res.ray_ok),
            axis=1)
    return metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)


def tolerance_analysis(specs: Specs, lens: Lens,
                       config: sim_mod.SimulatorConfig,
                       tol: Tolerances, n_samples: int,
                       key: jax.Array,
                       rms_threshold: Optional[float] = None,
                       percentiles: Tuple[float, ...] = (50.0, 90.0, 99.0),
                       compensator: Optional[str] = None,
                       ) -> Dict[str, jnp.ndarray]:
    """Monte-Carlo tolerance run: one batched fused launch over
    ``n_samples`` perturbed copies of a (B=1) design.

    ``compensator='refocus'`` re-focuses every perturbed sample (the
    closed-form least-squares image-plane shift of :func:`refocus`,
    applied per system inside the same batched launch) before scoring —
    the classical tolerancing convention: back-focus is the universal
    free compensator a manufacturer always adjusts, so uncompensated
    yields are systematically pessimistic (defocus dominates most
    perturbations). ``None`` scores at the nominal focus.

    Returns a dict of device scalars/arrays:
      ``rms``            (n_samples,) per-sample spot RMS (sample 0 nominal)
      ``nominal_rms``    RMS of the unperturbed design (sample 0). With
                         ``compensator='refocus'`` the nominal sample is
                         refocused like every other — this is the nominal
                         design at its own best focus, the consistent
                         baseline for compensated yields; for the
                         as-designed-focus score run ``compensator=None``.
      ``mean``/``std``   moments over the perturbed samples
      ``p<q>``           requested RMS percentiles
      ``yield_fraction`` fraction with RMS <= rms_threshold (if given)
      ``refocus_delta``  (n_samples,) applied focus shifts (compensator on)

    Jittable with static ``n_samples``/``tol``/``config``/``compensator``.
    """
    if compensator not in (None, "refocus"):
        raise ValueError(f"compensator must be None or 'refocus', "
                         f"got {compensator!r}")
    specs_n, lens_n = tile_population(specs, lens, n_samples)
    lens_p = perturb_lens(lens_n, key, tol, keep_first_nominal=True)
    delta = None
    if compensator == "refocus":
        lens_p, delta = refocus(specs_n, lens_p, config)
    rms = _per_sample_rms(specs_n, lens_p, config)
    perturbed = rms[1:]
    out: Dict[str, jnp.ndarray] = {
        "rms": rms,
        "nominal_rms": rms[0],
        "mean": jnp.mean(perturbed),
        "std": jnp.std(perturbed),
    }
    if delta is not None:
        out["refocus_delta"] = delta
    for q in percentiles:
        out[f"p{q:g}"] = jnp.percentile(perturbed, q)
    if rms_threshold is not None:
        out["yield_fraction"] = jnp.mean(
            (perturbed <= rms_threshold).astype(rms.dtype))
    return out


def refocus(specs: Specs, lens: Lens, config: sim_mod.SimulatorConfig,
            key: Optional[jax.Array] = None
            ) -> Tuple[Lens, jnp.ndarray]:
    """Shift each system's image distance to the least-squares best focus.

    Ray intercepts move linearly with an image-plane shift δ
    (x' = x + δ·cx/cz), so the RMS-minimizing shift has the closed form
    δ* = −Σ ok·(x·tx + y·ty) / Σ ok·(tx² + ty²) with t = (cx, cy)/cz and
    the per-field centroid removed — one trace, no iteration,
    differentiable. Returns (refocused lens, δ* per system).

    TPU-build superset (the reference's only focus handling is the
    paraxial BFL solve, `lens_modeling.py:310-320`); complements
    `optimize.LensOptimizer(add_bfl=True)` with a real-ray focus.

    The minimized functional FOLLOWS ``config.spot_metric``: ``'xy'``
    pools both transverse axes, ``'y'`` (the reference-pinned
    `compute_rms2d` semantics) pools y-deviations only. This matters —
    the two best-focus positions differ on astigmatic designs, and the
    y-refined double-Gauss flagship is astigmatic enough (rms_xy ≈ 23×
    rms_y, RESULTS.md report card) that compensating at the RADIAL best
    focus makes its y-only score ~9× WORSE than not compensating at all
    (measured: nominal 0.0031 → 0.0277 mm at |δ| = 0.37 mm).
    """
    cfg = config.trace_config()
    res = trace_mod.trace_rays(specs, lens, cfg, key=key)
    w = res.ray_ok.astype(lens.dtype)                 # (B, F, P, W)
    cz = jnp.sqrt(jnp.maximum(1.0 - res.cx ** 2 - res.cy ** 2, 1e-12))
    tx = res.cx / cz
    ty = res.cy / cz
    nrm = jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1.0)

    def centered(a):
        return a - jnp.sum(a * w, axis=2, keepdims=True) / nrm

    x, y = centered(res.x), centered(res.y)
    txc, tyc = centered(tx), centered(ty)
    if config.spot_metric == "y":
        num = jnp.sum(w * (y * tyc), axis=(1, 2, 3))            # (B,)
        den = jnp.maximum(jnp.sum(w * tyc ** 2, axis=(1, 2, 3)), 1e-12)
    else:
        num = jnp.sum(w * (x * txc + y * tyc), axis=(1, 2, 3))  # (B,)
        den = jnp.maximum(jnp.sum(w * (txc ** 2 + tyc ** 2),
                                  axis=(1, 2, 3)), 1e-12)
    delta = -num / den
    st = lens.structure
    rows = np.arange(len(lens))
    last = st.n_surfaces - 1
    t_new = lens.t.at[rows, last].add(delta)
    return lens.replace(t=t_new), delta


def diffraction_mtf(specs: Specs, lens: Lens,
                    config: trace_mod.TraceConfig,
                    grid_n: int = 32, pad: int = 4,
                    key: Optional[jax.Array] = None
                    ) -> Dict[str, jnp.ndarray]:
    """Diffraction MTF per (field, wavelength) from the traced wavefront.

    The geometric MTF (`field_mtf`) reads 1.0 for a perfect lens; the
    physical transfer function is the pupil autocorrelation, computed here
    as the transform of the diffraction PSF of the traced OPD
    (`ops.wavefront`). Returns:

      ``rel_freqs``     (K,) spatial frequencies in units of the cutoff
      ``mtf_t``/``mtf_s`` (F, W, K) tangential/sagittal cuts
      ``cutoff_cyc_mm`` (F, W) the cutoff 1/(λ·f#_working) for scaling

    Not jittable end-to-end (host-side frequency axes); each piece is.
    """
    from torchoptics_tpu.ops import wavefront as wf

    n = grid_n
    g = (np.arange(n) + 0.5) / n * 2.0 - 1.0          # cell centers
    X, Y = np.meshgrid(g, g, indexing="xy")
    incircle = (X ** 2 + Y ** 2) <= 1.0
    xr = jnp.asarray(X.ravel()[None, None, :, None], jnp.float32)
    yr = jnp.asarray(Y.ravel()[None, None, :, None], jnp.float32)
    out = wf.opd_map(specs, lens, config, key=key, xy=(xr, yr))
    opd = out["opd"][0]                               # (F, P, W)
    ok = out["ok"][0] & jnp.asarray(incircle.ravel())[None, :, None]
    F, _, W = opd.shape

    z_xp = wf.exit_pupil_distance(lens)[0]
    r_xp = specs.epd[0] / 2.0 * wf.pupil_magnification(lens)[0]
    R = jnp.sqrt(z_xp ** 2 + out["x_img"][0] ** 2
                 + out["y_img"][0] ** 2)              # (F, W)
    fnum = R / (2.0 * r_xp)

    wavelengths_mm = [float(w) * 1e-6 for w in config.wavelengths]

    # One jitted program per λ: the axon relay leaves EAGER complex ops
    # unimplemented, but complex intermediates inside a real-in/real-out
    # jit compile fine (same pattern as ops.image's rfft convolution).
    @jax.jit
    def _cuts(og, okg, lam):
        psf = wf.diffraction_psf(og, okg, lam, pad=pad)["psf"]
        lsf_t = jnp.sum(psf, axis=-1)
        lsf_s = jnp.sum(psf, axis=-2)
        mt = jnp.abs(jnp.fft.rfft(lsf_t, axis=-1))
        ms = jnp.abs(jnp.fft.rfft(lsf_s, axis=-1))
        return (mt / jnp.maximum(mt[..., :1], 1e-20),
                ms / jnp.maximum(ms[..., :1], 1e-20))

    mtf_t, mtf_s = [], []
    for wi, lam in enumerate(wavelengths_mm):
        og = opd[:, :, wi].reshape(F, n, n)
        okg = ok[:, :, wi].reshape(F, n, n)
        mt, ms = _cuts(og, okg, jnp.asarray(lam, og.dtype))
        mtf_t.append(mt)
        mtf_s.append(ms)
    mtf_t = jnp.stack(mtf_t, axis=1)                  # (F, W, K)
    mtf_s = jnp.stack(mtf_s, axis=1)
    M = pad * n
    K = M // 2 + 1
    # PSF pixel is λ·f#/pad, so rfft frequency k/(M·pixel) in cutoff units
    # 1/(λ·f#) is simply k·pad/M — static, field/λ independent.
    rel = jnp.asarray(np.arange(K) * pad / M, jnp.float32)
    cutoff = 1.0 / (jnp.asarray(wavelengths_mm)[None, :] * fnum)
    return {"rel_freqs": rel, "mtf_t": mtf_t, "mtf_s": mtf_s,
            "cutoff_cyc_mm": cutoff}


def wavefront_rms(specs: Specs, lens: Lens,
                  config: trace_mod.TraceConfig,
                  xy=None, remove_j: int = 4,
                  key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Mean (over fields/wavelengths) RMS wavefront error in mm, with the
    first ``remove_j`` Noll terms (default piston/tilt/defocus) projected
    out per (field, λ) — the classical "best-focus wavefront error".

    Fully differentiable: usable directly as an optimization objective
    (minimizing it maximizes Strehl via Maréchal). With
    ``config.engine='pallas'`` (single spherical f32 system) the OPL runs
    the fused in-kernel accumulator — no per-surface stack in HBM — at the
    production trace rate; other configs use the XLA engines' ``"dist"``
    aggregate.
    """
    from torchoptics_tpu.ops import pupil as pupil_mod
    from torchoptics_tpu.ops import wavefront as wf

    out = wf.opd_map(specs, lens, config, key=key, xy=xy)
    opd = out["opd"]                                  # (B, F, P, W)
    ok = out["ok"]
    if xy is None:
        xp_rel, yp_rel = pupil_mod.sample_pupil(
            config.mode, config.n_rays, len(lens), key=key)
    else:
        xp_rel, yp_rel = xy
    xr = jnp.broadcast_to(xp_rel, opd.shape)
    yr = jnp.broadcast_to(yp_rel, opd.shape)
    # samples along P (axis 2) -> move minor for the fit
    opd_m = jnp.moveaxis(opd, 2, -1)                  # (B, F, W, P)
    ok_m = jnp.moveaxis(ok, 2, -1)
    xr_m = jnp.moveaxis(xr, 2, -1)
    yr_m = jnp.moveaxis(yr, 2, -1)
    coef = wf.zernike_fit(opd_m, xr_m, yr_m, ok_m, j_max=remove_j)
    # elementwise contraction — this stack's generic dot is
    # reduced-precision (CLAUDE.md) and a 0.5% leak of a 10-wave defocus
    # term would swamp a λ/50 residual
    low = jnp.sum(wf.zernike_basis(remove_j, xr_m, yr_m)
                  * coef[..., None, :], axis=-1)
    resid = opd_m - low
    w = ok_m.astype(opd.dtype)
    nrm = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    mean = jnp.sum(resid * w, axis=-1) / nrm
    var = jnp.sum(w * (resid - mean[..., None]) ** 2, axis=-1) / nrm
    return jnp.mean(jnp.sqrt(var + 1e-20))


def _fan_trace(specs: Specs, lens: Lens, config: trace_mod.TraceConfig,
               px, py, key=None) -> trace_mod.TraceResult:
    """Trace an explicit pupil fan (relative coordinates) through the full
    front-end (vignetting → aiming → EPD scaling)."""
    dtype = config.dtype
    xy = (jnp.asarray(px, dtype).reshape(1, 1, -1, 1),
          jnp.asarray(py, dtype).reshape(1, 1, -1, 1))
    return trace_mod.trace_rays(specs, lens, config, key=key, xy=xy)


def ray_fans(specs: Specs, lens: Lens, config: trace_mod.TraceConfig,
             n: int = 33, pupil_fraction: float = 1.0,
             key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Transverse ray-aberration fans — the classical "ray fan plot".

    Traces a meridional fan (px=0, py ∈ ±``pupil_fraction``) and a sagittal
    fan (py=0, px ∈ ±``pupil_fraction``) at every ``config.rel_fields`` /
    ``config.wavelengths`` and returns image-plane deviations from the
    chief ray:

      ``p``               (n,)        relative pupil coordinate of the fan
      ``eps_y``/``eps_x`` (B, F, n, W) tangential εy(py) / sagittal εx(px), mm
      ``ok_t``/``ok_s``   (B, F, n, W) validity masks

    TPU-build superset (no reference counterpart; the nearest inputs are the
    meridional/sagittal samplers, `ray_tracing.py:358-375`). ``n`` must be
    odd so the fan contains the chief ray exactly. Jittable/differentiable;
    honors vignetting and ray aiming from ``config``.
    """
    if n % 2 == 0:
        raise ValueError(f"ray_fans needs an odd n so the chief ray is a fan "
                         f"member; got n={n}")
    p = np.linspace(-1.0, 1.0, n, dtype=np.float32) * float(pupil_fraction)
    zeros = np.zeros_like(p)
    res_t = _fan_trace(specs, lens, config, zeros, p, key=key)
    res_s = _fan_trace(specs, lens, config, p, zeros, key=key)
    chief = n // 2
    # Deviations are referenced to the chief-ray fan member; if the chief
    # ray itself failed (vignetted/TIR — reset_bad_rays zeroes it), the
    # whole (field, λ) column is meaningless, so mask it out entirely.
    chief_ok_t = res_t.ray_ok[:, :, chief:chief + 1, :]
    chief_ok_s = res_s.ray_ok[:, :, chief:chief + 1, :]
    eps_y = jnp.where(chief_ok_t,
                      res_t.y - res_t.y[:, :, chief:chief + 1, :], 0.0)
    eps_x = jnp.where(chief_ok_s,
                      res_s.x - res_s.x[:, :, chief:chief + 1, :], 0.0)
    return {"p": jnp.asarray(p), "eps_y": eps_y,
            "ok_t": res_t.ray_ok & chief_ok_t,
            "eps_x": eps_x, "ok_s": res_s.ray_ok & chief_ok_s}


def _best_focus_shift(a, u, ok):
    """Least-squares image-plane shift minimizing the spread of intercepts
    ``a`` with transverse slopes ``u`` over the pupil axis (axis 2):
    a(δ) = a + δ·u ⇒ δ* = −Σw(a−ā)(u−ū)/Σw(u−ū)² (same closed form as
    `refocus`, reduced per (field, λ) instead of per system)."""
    w = ok.astype(a.dtype)
    nrm = jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1.0)
    ac = a - jnp.sum(a * w, axis=2, keepdims=True) / nrm
    uc = u - jnp.sum(u * w, axis=2, keepdims=True) / nrm
    num = jnp.sum(w * ac * uc, axis=2)                       # (B, F, W)
    den = jnp.maximum(jnp.sum(w * uc ** 2, axis=2), 1e-12)
    return -num / den


def field_curvature(specs: Specs, lens: Lens, config: trace_mod.TraceConfig,
                    n: int = 11, pupil_fraction: float = 0.25,
                    key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Astigmatic field curves: tangential/sagittal best-focus shift per
    field — the classical field-curvature plot.

    For each (field, λ) a narrow meridional (sagittal) fan about the chief
    ray is traced and the image-plane shift δ that collapses it is solved in
    closed form (intercepts move linearly with δ: y(δ) = y + δ·cy/cz).
    Returns, each (B, F, W), in mm (positive = focus beyond the image plane):

      ``dz_t``/``dz_s``   tangential / sagittal field curvature
      ``astigmatism``     dz_t − dz_s

    TPU-build superset (no reference counterpart). ``pupil_fraction`` keeps
    the fan differential (Coddington-like close rays); widen it to measure
    best focus of the full aperture instead. Jittable and differentiable.
    """
    if n % 2 == 0:
        raise ValueError(f"field_curvature needs an odd n; got n={n}")
    p = np.linspace(-1.0, 1.0, n, dtype=np.float32) * float(pupil_fraction)
    zeros = np.zeros_like(p)

    def slope(res):
        cz = jnp.sqrt(jnp.maximum(1.0 - res.cx ** 2 - res.cy ** 2, 1e-12))
        return res.cx / cz, res.cy / cz

    res_t = _fan_trace(specs, lens, config, zeros, p, key=key)
    _, ty = slope(res_t)
    dz_t = _best_focus_shift(res_t.y, ty, res_t.ray_ok)

    res_s = _fan_trace(specs, lens, config, p, zeros, key=key)
    tx, _ = slope(res_s)
    dz_s = _best_focus_shift(res_s.x, tx, res_s.ray_ok)

    return {"dz_t": dz_t, "dz_s": dz_s, "astigmatism": dz_t - dz_s}


def longitudinal_aberration(specs: Specs, lens: Lens,
                            config: trace_mod.TraceConfig,
                            n: int = 17, pupil_fraction: float = 1.0,
                            key: Optional[jax.Array] = None
                            ) -> Dict[str, jnp.ndarray]:
    """Longitudinal spherical aberration / spherochromatism.

    Traces an on-axis meridional fan (``config.rel_fields`` is overridden
    with field 0) and returns the axial crossing distance of each ray past
    the image plane, dz(p) = −y/(cy/cz):

      ``p``    (n,)       relative pupil heights (0, ``pupil_fraction``]
      ``dz``   (B, n, W)  longitudinal focus shift per pupil height and λ, mm

    dz(p→0) is the paraxial chromatic focal shift (closes on the ABCD
    `metrics.compute_axial_color` — cross-checked in tests); dz(1)−dz(0⁺)
    is the classical LSA. TPU-build superset (no reference counterpart).
    """
    cfg0 = dataclasses.replace(config, rel_fields=(0.0,))
    p = (np.arange(1, n + 1, dtype=np.float32) / n) * float(pupil_fraction)
    res = _fan_trace(specs, lens, cfg0, np.zeros_like(p), p, key=key)
    cz = jnp.sqrt(jnp.maximum(1.0 - res.cx ** 2 - res.cy ** 2, 1e-12))
    ty = res.cy / cz
    safe = jnp.where(jnp.abs(ty) > 1e-12, ty, 1.0)
    dz = jnp.where(jnp.abs(ty) > 1e-12, -res.y / safe, 0.0)
    return {"p": jnp.asarray(p), "dz": dz[:, 0, :, :]}


def seidel_coefficients(specs: Specs, lens: Lens,
                        wavelength="d",
                        chromatic=("F", "C")) -> Dict[str, jnp.ndarray]:
    """Third-order (Seidel) wavefront aberration sums, per system.

    Traces the paraxial marginal ray (infinite conjugate, height EPD/2,
    u=0) and chief ray (paraxial field angle ``specs.hfov`` through the
    entrance-pupil center) and accumulates Welford's refraction-invariant
    per-surface forms with A = n(u + yc), Ā = n(ū + ȳc):

      ``S1``  spherical        −A²·y·Δ(u/n)
      ``S2``  coma             −A·Ā·y·Δ(u/n)
      ``S3``  astigmatism      −Ā²·y·Δ(u/n)
      ``S4``  Petzval          −H²·c·Δ(1/n)
      ``S5``  distortion       (Ā/A)·(S3ₖ + S4ₖ)
      ``C1``/``C2`` axial/lateral color  A·y·Δ(δn/n), Ā·y·Δ(δn/n)
        (δn = n(λ₁) − n(λ₂) of the ``chromatic`` pair per medium)

    plus ``H`` (Lagrange invariant), ``u_img`` (marginal image-space
    angle) and ``per_surface`` (each sum broken out per surface, (B, S) —
    the classical surface-contribution table). All (B,) unless noted;
    units are lengths (wavefront measure). TPU-build superset (the
    reference has no aberration-theory layer). Conic/asphere surfaces
    contribute through their effective 4th-order sag (κ·c³/8 + asph₀,
    the classical aspheric increment ladder; higher asphere orders are
    5th-order+ and ignored). Chromatic sums treat the asphere terms as
    achromatic. Jittable and differentiable; padding surfaces are masked
    out.
    """
    lam = (wavelength,) + tuple(chromatic)
    n_all = lens.get_refractive_indices(lam)                # (B, S, 3)
    mask = lens.structure.mask_jnp.astype(lens.dtype)       # (B, S)
    one = jnp.ones_like(n_all[:, :1, :])
    n_full = jnp.concatenate((one, n_all), axis=1)          # (B, S+1, 3)
    # masked-out surfaces are no-op interfaces: n_next := n_prev
    for k in range(n_all.shape[1]):
        keep = mask[:, k:k + 1]
        n_full = n_full.at[:, k + 1, :].set(
            keep * n_full[:, k + 1, :] + (1 - keep) * n_full[:, k, :])
    nd_prev, nd_next = n_full[:, :-1, 0], n_full[:, 1:, 0]  # (B, S)
    dn = n_full[..., 1] - n_full[..., 2]                    # δn, (B, S+1)
    dn_prev, dn_next = dn[:, :-1], dn[:, 1:]

    c = lens.c * mask
    t = lens.t
    S = c.shape[1]
    a4_eff = _a4_effective(lens)

    y = jnp.broadcast_to(specs.epd[:, None] / 2.0, c[:, :1].shape)[:, 0]
    u = jnp.zeros_like(y)
    ub = jnp.broadcast_to(specs.hfov, y.shape)
    z_p = abcd_mod.compute_pupil_position(lens)
    yb = -z_p * ub
    H = nd_prev[:, 0] * (ub * y - u * yb)                   # Lagrange inv.

    sums = {k: [] for k in ("S1", "S2", "S3", "S4", "S5", "C1", "C2")}
    for k in range(S):
        ck, mk = c[:, k], mask[:, k]
        n0, n1 = nd_prev[:, k], nd_next[:, k]
        A = n0 * (u + y * ck)
        Ab = n0 * (ub + yb * ck)
        u_new = (n0 * u - y * ck * (n1 - n0)) / n1
        ub_new = (n0 * ub - yb * ck * (n1 - n0)) / n1
        d_un = u_new / n1 - u / n0
        d_inv = 1.0 / n1 - 1.0 / n0
        d_dnn = dn_next[:, k] / n1 - dn_prev[:, k] / n0
        s1 = -(A ** 2) * y * d_un * mk
        s2 = -A * Ab * y * d_un * mk
        s3 = -(Ab ** 2) * y * d_un * mk
        s4 = -(H ** 2) * ck * d_inv * mk
        A_safe = jnp.where(jnp.abs(A) > 1e-12, A, 1.0)
        s5 = jnp.where(jnp.abs(A) > 1e-12, (Ab / A_safe) * (s3 + s4), 0.0)
        if a4_eff is not None:
            # classical aspheric increments: an added 4th-order sag G·r⁴
            # gives δS_I = 8G(n'−n)y⁴ in this sign convention (pinned
            # against the real-ray engine in tests/test_seidel.py), scaling
            # down the (ȳ/y) ladder; no S4 term
            K = 8.0 * a4_eff[:, k] * (n1 - n0) * mk
            s1 = s1 + K * y ** 4
            s2 = s2 + K * y ** 3 * yb
            s3 = s3 + K * y ** 2 * yb ** 2
            s5 = s5 + K * y * yb ** 3
        c1 = A * y * d_dnn * mk
        c2 = Ab * y * d_dnn * mk
        for name, v in zip(("S1", "S2", "S3", "S4", "S5", "C1", "C2"),
                           (s1, s2, s3, s4, s5, c1, c2)):
            sums[name].append(v)
        u, ub = u_new, ub_new
        tk = t[:, k]
        y = y + tk * u
        yb = yb + tk * ub

    per_surface = {k: jnp.stack(v, axis=1) for k, v in sums.items()}
    out: Dict[str, jnp.ndarray] = {k: jnp.sum(v, axis=1)
                                   for k, v in per_surface.items()}
    out["H"] = H
    out["u_img"] = u
    out["per_surface"] = per_surface
    return out


def _a4_effective(lens: Lens) -> Optional[jnp.ndarray]:
    """Extra 4th-order sag coefficient vs the paraxial sphere, (B, S).

    Conic sag expands as (c/2)r² + (1+κ)c³/8·r⁴ + … (sphere: κ=0), and the
    even-asphere series adds ``asph[..., 0]``·r⁴ (`ops.surfaces.sag_and_slope`
    convention), so a₄ = κ·c³/8 + asph₀. Higher terms are 5th-order+."""
    a4 = None
    if lens.kappa is not None:
        a4 = lens.kappa * lens.c ** 3 / 8.0
    if lens.asph is not None:
        a4 = lens.asph[..., 0] if a4 is None else a4 + lens.asph[..., 0]
    return a4


def seidel_focal_shifts(seidel: Dict[str, jnp.ndarray]
                        ) -> Dict[str, jnp.ndarray]:
    """Predicted longitudinal focal shifts from the Seidel sums, (B,), in
    the same convention as the real-ray analyses (positive = focus beyond
    the image plane; the cross-check lives in `tests/test_seidel.py`):

      ``lsa_marginal``     marginal-ray focus shift  −S1/(2·u'²)
      ``dz_t``/``dz_s``    tangential/sagittal field curvature at full field
                           −(3·S3 + S4)/(2·u'²), −(S3 + S4)/(2·u'²)
      ``chromatic_shift``  axial-color focal shift  −C1/u'²
                           (= `metrics.compute_axial_color` of the same
                           ``chromatic`` pair, first-order in δn)
    """
    u2 = jnp.maximum(seidel["u_img"] ** 2, 1e-16)
    return {
        "lsa_marginal": -seidel["S1"] / (2.0 * u2),
        "dz_t": -(3.0 * seidel["S3"] + seidel["S4"]) / (2.0 * u2),
        "dz_s": -(seidel["S3"] + seidel["S4"]) / (2.0 * u2),
        "chromatic_shift": -seidel["C1"] / u2,
    }


def sensitivities(specs: Specs, lens: Lens,
                  config: sim_mod.SimulatorConfig,
                  key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Tolerance sensitivity table: d(spot RMS)/d(parameter), per surface.

    One `jax.grad` of the same differentiable objective the optimizer
    trains — the classical finite-difference tolerance table (one re-trace
    per parameter) collapses to a single fwd+bwd launch. Returns
    ``{'c','t','nd','v'[, 'kappa','asph']}`` arrays shaped like the lens
    parameters; entries on padding surfaces are identically zero.
    """
    names = ["c", "t", "nd", "v"]
    if lens.kappa is not None:
        names.append("kappa")
    if lens.asph is not None:
        names.append("asph")

    def rms_of(params):
        return jnp.sum(_per_sample_rms(
            specs, lens.replace(**params), config, key=key))

    grads = jax.grad(rms_of)({n: getattr(lens, n) for n in names})
    return grads
