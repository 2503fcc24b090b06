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
from torchoptics_tpu.ops import metrics as metrics_mod
from torchoptics_tpu.ops import trace as trace_mod

__all__ = [
    "Tolerances", "tile_population", "perturb_lens",
    "tolerance_analysis", "sensitivities", "field_mtf",
    "diffraction_mtf", "wavefront_rms", "refocus",
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
    """Per-system polychromatic spot RMS, (B,), on the configured engine.

    ``trace_engine='pallas'`` runs the whole population in one fused batch
    launch (W-outer fast path); the XLA engines trace + reduce."""
    cfg = config.trace_config()
    if cfg.engine == "pallas":
        from torchoptics_tpu.ops import pallas_batch
        _, ld = pallas_batch.batched_unsupervised_loss(
            specs, lens, config, key=key)
        return ld["rms"]
    res = trace_mod.trace_rays(specs, lens, cfg, key=key)
    return metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)


def tolerance_analysis(specs: Specs, lens: Lens,
                       config: sim_mod.SimulatorConfig,
                       tol: Tolerances, n_samples: int,
                       key: jax.Array,
                       rms_threshold: Optional[float] = None,
                       percentiles: Tuple[float, ...] = (50.0, 90.0, 99.0),
                       ) -> Dict[str, jnp.ndarray]:
    """Monte-Carlo tolerance run: one batched fused launch over
    ``n_samples`` perturbed copies of a (B=1) design.

    Returns a dict of device scalars/arrays:
      ``rms``            (n_samples,) per-sample spot RMS (sample 0 nominal)
      ``nominal_rms``    RMS of the unperturbed design
      ``mean``/``std``   moments over the perturbed samples
      ``p<q>``           requested RMS percentiles
      ``yield_fraction`` fraction with RMS <= rms_threshold (if given)

    Jittable with static ``n_samples``/``tol``/``config``.
    """
    specs_n, lens_n = tile_population(specs, lens, n_samples)
    lens_p = perturb_lens(lens_n, key, tol, keep_first_nominal=True)
    rms = _per_sample_rms(specs_n, lens_p, config)
    perturbed = rms[1:]
    out: Dict[str, jnp.ndarray] = {
        "rms": rms,
        "nominal_rms": rms[0],
        "mean": jnp.mean(perturbed),
        "std": jnp.std(perturbed),
    }
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
    `optimize.LensOptimizer(add_bfl=True)` with a real-ray focus. Note the
    objective includes BOTH transverse axes, unlike the reference-pinned
    `compute_rms2d` (y-deviations only) — on astigmatic designs the two
    best-focus positions differ.
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
    num = jnp.sum(w * (x * txc + y * tyc), axis=(1, 2, 3))      # (B,)
    den = jnp.maximum(jnp.sum(w * (txc ** 2 + tyc ** 2), axis=(1, 2, 3)),
                      1e-12)
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
