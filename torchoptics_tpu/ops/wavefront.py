"""Wavefront analysis: OPD maps, Zernike decomposition, Strehl ratio,
diffraction PSF/MTF.

TPU-build superset — the reference is purely geometric (no optical path
lengths, no wavefront, no diffraction; its PSF is a ray histogram,
`ray_tracing.py:206-270`). At the diffraction limit — where the refined
flagship designs in `models.zoo` operate — geometric spots stop being
physical, so this module adds the wave-optics layer on top of the same
differentiable trace:

* **OPL** per ray = the plane-wave phase at the entrance-pupil launch point
  (``y_p·sin(u)`` for field angle u) plus ``Σ_k n_k · d_k`` over the
  per-surface marching distances (the ``"dist"`` aggregate of
  `ops.trace.trace_skew`), including the final image-plane leg.
* **OPD** = OPL to the reference sphere, minus the chief ray's — the
  reference sphere is centered on the chief-ray image point with radius
  equal to the paraxial exit-pupil distance, and each ray is marched
  *back* from the image plane onto it in closed form (the same quadratic
  as the forward sphere intersection).
* **Zernike** coefficients by least squares on the unit pupil disk (Noll
  indexing, Z1..Z11 by default).
* **Strehl** from the pupil sum ``|Σ exp(i·2π·OPD/λ)|²`` and the
  **diffraction PSF** as the FFT of the pupil function — both scale-free
  in normalized (λ/D) units.

Everything is jittable and differentiable. Accuracy note: OPD is a ~100 nm
difference of ~100 mm path sums, so float32 carries a few-nm noise floor;
pass a ``double_precision`` config (XLA engines) for sub-nm analysis.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu.ops import trace as trace_mod

__all__ = [
    "optical_path_lengths", "exit_pupil_distance", "opd_map",
    "zernike_basis", "zernike_fit", "strehl_ratio", "diffraction_psf",
    "diffraction_psf_window",
]


def optical_path_lengths(specs: Specs, lens: Lens,
                         config: trace_mod.TraceConfig,
                         key: Optional[jax.Array] = None,
                         xy=None) -> Tuple[trace_mod.TraceResult, jnp.ndarray]:
    """Trace and return (result, OPL) with OPL (B, F, P, W) in mm —
    referenced to the incoming plane wave through the entrance-pupil
    origin (see module docstring)."""
    cfg = config
    if cfg.engine == "pallas":
        if cfg.double_precision:
            raise NotImplementedError(
                "engine='pallas' OPL is float32 (the fused in-kernel "
                "accumulator); use engine='unroll' or 'scan' for double "
                "precision")
        if lens.is_spherical:
            if len(lens) == 1:
                from torchoptics_tpu.ops import pallas_trace
                return pallas_trace.optical_paths_fused(specs, lens, cfg,
                                                        key=key, xy=xy)
            from torchoptics_tpu.ops import pallas_batch
            return pallas_batch.optical_paths_fused_batch(specs, lens, cfg,
                                                          key=key, xy=xy)
        from torchoptics_tpu.ops import pallas_asphere
        lens_a = lens
        if lens_a.kappa is None:
            lens_a = lens_a.replace(kappa=jnp.zeros_like(lens_a.c))
        if lens_a.asph is None:
            lens_a = lens_a.replace(asph=jnp.zeros(lens_a.c.shape + (1,)))
        if len(lens) == 1:
            return pallas_asphere.optical_paths_fused_asphere(
                specs, lens_a, cfg, key=key, xy=xy)
        return pallas_asphere.optical_paths_fused_asphere_batch(
            specs, lens_a, cfg, key=key, xy=xy)
    if cfg.double_precision:
        # Cast HERE so the launch-point re-derivation below and the index
        # table see the same f64 values the trace computes with.
        specs = specs.astype(jnp.float64)
        lens = lens.astype(jnp.float64)
    res = trace_mod.trace_rays(specs, lens, cfg, key=key, xy=xy,
                               aggregate=("dist",))
    dist = res.stacks["dist"]                       # (S+1, B, F, P, W)
    dtype = dist.dtype
    # Index of the medium each leg travels in: air before surface 0, the
    # gap indices after each surface (padding gaps carry n=1, and their
    # legs have zero length for valid single-sequence batches).
    n = lens.get_refractive_indices(cfg.wavelengths).astype(dtype)  # (B,S,W)
    n_full = jnp.concatenate((jnp.ones_like(n[:, :1]), n), axis=1)  # (B,S+1,W)
    n_legs = jnp.moveaxis(n_full, 1, 0)[:, :, None, None, :]  # (S+1,B,1,1,W)
    opl = jnp.sum(dist * n_legs, axis=0)            # (B, F, P, W)

    # Plane-wave launch phase: the trace starts rays on the entrance-pupil
    # plane; for field angle u the incoming wavefront reaches launch point
    # (x_p, y_p) with path advance y_p * sin(u) (`ops.trace.trace_rays`
    # builds cy = sin(u) the same way).
    u = (specs.hfov[:, None]
         * jnp.asarray(cfg.rel_fields, dtype)[None, :])[..., None, None]
    # Recover launch y from the final state is not possible; re-derive the
    # launch points exactly as trace_rays does (same sampler, same key).
    from torchoptics_tpu.ops import pupil as pupil_mod
    if xy is None:
        xp_rel, yp_rel = pupil_mod.sample_pupil(
            cfg.mode, cfg.n_rays, len(lens), key=key)
    else:
        xp_rel, yp_rel = xy
    # Mirror trace_rays' front-end exactly: vignetting, then aiming.
    if cfg.vig_fn is not None and cfg.mode != "chief":
        fields = jnp.asarray(cfg.rel_fields, dtype)[None, :]
        vig_up = cfg.vig_fn(fields, specs.vig_up)
        vig_down = cfg.vig_fn(fields, specs.vig_down)
        vig_x = cfg.vig_fn(fields, specs.vig_x)
        yp_rel = pupil_mod.apply_vignetting(yp_rel, vig_up, vig_down)
        xp_rel = pupil_mod.apply_vignetting(xp_rel, vig_x, vig_x)
    if cfg.n_ray_aiming_iter > 0:
        from torchoptics_tpu.ops import aiming
        fn = aiming.ray_aiming(specs, lens.detach(), cfg, True)
        xp_rel, yp_rel = [jax.lax.stop_gradient(jnp.clip(v, -2.0, 2.0))
                          for v in fn(xp_rel, yp_rel)]
    yp = pupil_mod.scale_to_epd(yp_rel, specs.epd).astype(dtype)
    opl = opl + yp * jnp.sin(u)
    return res, opl


def exit_pupil_distance(lens: Lens) -> jnp.ndarray:
    """Paraxial exit-pupil distance from the image plane, (B,), signed
    (negative = pupil before the image plane, the usual case).

    Propagates the paraxial chief ray (height 0 at the entrance pupil)
    through the system; the exit pupil is where it crosses the axis:
    z = -y_img / u_img. Uses the same elementwise 2x2 chain as
    `ops.abcd` (no reduced-precision dots)."""
    z0 = abcd_mod.compute_pupil_position(lens)                  # (B,)
    nd = jnp.concatenate((jnp.ones_like(lens.nd[:, :1]), lens.nd), axis=1)
    m = abcd_mod.reduce_abcd(
        abcd_mod.interface_propagation_abcd(lens.c, lens.t, nd))  # (B,2,2)
    # Chief at surface 0 (before refraction): y = -z0 * u, u = 1.
    y0 = -z0
    y_img = m[:, 0, 0] * y0 + m[:, 0, 1]
    u_img = m[:, 1, 0] * y0 + m[:, 1, 1]
    return -y_img / u_img


def pupil_magnification(lens: Lens) -> jnp.ndarray:
    """Paraxial exit-/entrance-pupil size ratio, (B,).

    Propagates the marginal ray (height 1, slope 0, at the entrance-pupil
    plane) to the exit-pupil plane. With this, the transverse ray
    aberration obeys ε ≈ (R / r_xp) · ∂OPD/∂ρ with r_xp = m_p·EPD/2 and R
    the reference-sphere radius (`tests/test_wavefront.py` pins the
    relation at the few-% level)."""
    z_xp = exit_pupil_distance(lens)
    nd = jnp.concatenate((jnp.ones_like(lens.nd[:, :1]), lens.nd), axis=1)
    m = abcd_mod.reduce_abcd(
        abcd_mod.interface_propagation_abcd(lens.c, lens.t, nd))
    # (y, u) = (1, 0) at the entrance pupil; same height at surface 0.
    y_img = m[:, 0, 0]
    u_img = m[:, 1, 0]
    return y_img + z_xp * u_img


def opd_map(specs: Specs, lens: Lens, config: trace_mod.TraceConfig,
            key: Optional[jax.Array] = None, xy=None
            ) -> Dict[str, jnp.ndarray]:
    """Optical path difference across the pupil, per (field, wavelength).

    Returns a dict:
      ``opd``    (B, F, P, W) OPD in mm on the reference sphere (positive =
                 wavefront lags the reference; chief ray is 0 by
                 construction, piston NOT removed beyond that).
      ``ok``     (B, F, P, W) valid-ray mask.
      ``x_img``/``y_img`` chief-ray image points (B, F, W).

    The chief bundle is traced with the same config in ``mode='chief'``.
    """
    res, opl = optical_path_lengths(specs, lens, config, key=key, xy=xy)

    cfg_chief = trace_mod.TraceConfig(
        mode="chief", n_rays=(1,), rel_fields=config.rel_fields,
        wavelengths=config.wavelengths, vig_fn=config.vig_fn,
        n_ray_aiming_iter=config.n_ray_aiming_iter,
        ray_aiming_mode=config.ray_aiming_mode,
        allow_backward_rays=config.allow_backward_rays,
        double_precision=config.double_precision,
        newton_iters=config.newton_iters, engine=config.engine)
    res_c, opl_c = optical_path_lengths(specs, lens, cfg_chief, key=key)

    dtype = opl.dtype
    # Reference sphere: center at the chief image point, radius = its
    # distance from the paraxial exit-pupil center (0, 0, z_xp). Using the
    # axial distance |z_xp| instead injects ~(r_p²/2)·ΔR/R² of spurious
    # defocus off axis (~40λ at the double-Gauss field edge).
    z_xp = exit_pupil_distance(lens).astype(dtype).reshape(-1, 1, 1, 1)
    x_c = res_c.x                                    # (B, F, 1, W)
    y_c = res_c.y
    R = jnp.sqrt(z_xp * z_xp + x_c * x_c + y_c * y_c)  # (B, F, 1, W)
    cz = jnp.sqrt(jnp.maximum(1.0 - res.cx ** 2 - res.cy ** 2, 0.0))
    # Back-march each ray from its image-plane point onto the sphere:
    # |p0 - s*d - C| = R with p0 = (x, y, 0), C = (x_c, y_c, 0).
    qx = res.x - x_c
    qy = res.y - y_c
    qd = qx * res.cx + qy * res.cy                   # q . d  (q_z = 0)
    q2 = qx * qx + qy * qy
    s = qd + jnp.sqrt(jnp.maximum(qd * qd + R * R - q2, 0.0))
    # Chief's own back-leg is exactly R (q = 0). Image space is air (n=1;
    # the reference's systems all image in air — `lens_modeling.py`
    # sequences end with 'A').
    opd = (opl - s) - (opl_c - R)
    return {"opd": opd, "ok": res.ray_ok & res_c.ray_ok,
            "x_img": x_c[:, :, 0, :], "y_img": y_c[:, :, 0, :]}


# --------------------------------------------------------------------------
# Zernike polynomials (Noll indexing, unit disk)


def _zernike_nm(j: int) -> Tuple[int, int]:
    """Noll index j (1-based) -> (n, m); m < 0 selects the sine term.
    Standard Noll mapping: Z4 = defocus, Z5/Z6 = astigmatism,
    Z7/Z8 = coma, Z11 = primary spherical."""
    n = 0
    j1 = j - 1
    while j1 > n:
        n += 1
        j1 -= n
    m = (n % 2) + 2 * ((j1 + ((n + 1) % 2)) // 2)
    if j % 2 == 1:
        m = -m
    return n, m


def zernike_basis(j_max: int, xr: jnp.ndarray, yr: jnp.ndarray
                  ) -> jnp.ndarray:
    """Zernike polynomials Z_1..Z_{j_max} (Noll, unnormalized radius) at
    relative pupil coordinates. Returns (..., j_max)."""
    rho2 = xr * xr + yr * yr
    rho = jnp.sqrt(jnp.maximum(rho2, 1e-30))
    theta = jnp.arctan2(yr, xr)
    cols = []
    for j in range(1, j_max + 1):
        n, m = _zernike_nm(j)
        am = abs(m)
        # Radial polynomial R_n^m
        Rnm = jnp.zeros_like(rho)
        for k in range((n - am) // 2 + 1):
            coef = ((-1) ** k * math.factorial(n - k)
                    / (math.factorial(k)
                       * math.factorial((n + am) // 2 - k)
                       * math.factorial((n - am) // 2 - k)))
            Rnm = Rnm + coef * rho ** (n - 2 * k)
        norm = math.sqrt(2.0 * (n + 1)) if m != 0 else math.sqrt(n + 1.0)
        if m > 0:
            Z = norm * Rnm * jnp.cos(am * theta)
        elif m < 0:
            Z = norm * Rnm * jnp.sin(am * theta)
        else:
            Z = norm * Rnm
        cols.append(Z)
    return jnp.stack(cols, axis=-1)


def zernike_fit(opd: jnp.ndarray, xr: jnp.ndarray, yr: jnp.ndarray,
                ok: jnp.ndarray, j_max: int = 11) -> jnp.ndarray:
    """Least-squares Noll coefficients (..., j_max) of ``opd`` sampled at
    relative pupil coords (unit disk), weighting failed rays to zero.

    The normal equations are built with explicit elementwise
    sums (this stack's generic dot is reduced-precision — CLAUDE.md) and
    solved with a dense K×K solve."""
    A = zernike_basis(j_max, xr, yr)                 # (..., P, K)
    w = ok.astype(opd.dtype)[..., None]              # (..., P, 1)
    Aw = A * w
    G = jnp.sum(Aw[..., :, :, None] * Aw[..., :, None, :], axis=-3)
    b = jnp.sum(Aw * (opd * w[..., 0])[..., None], axis=-2)
    # Tikhonov floor keeps the solve finite when a mode is unsampled.
    G = G + 1e-12 * jnp.eye(j_max, dtype=opd.dtype)
    return jnp.linalg.solve(G, b[..., None])[..., 0]


def strehl_ratio(opd: jnp.ndarray, ok: jnp.ndarray,
                 wavelength_mm) -> jnp.ndarray:
    """Strehl ratio from the pupil phase sum: |<exp(i 2π OPD/λ)>|² over
    valid rays (exact for uniformly sampled pupils; piston-invariant).
    ``opd`` (..., P); broadcastable ``wavelength_mm``."""
    phase = 2.0 * jnp.pi * opd / wavelength_mm
    w = ok.astype(opd.dtype)
    nrm = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    re = jnp.sum(w * jnp.cos(phase), axis=-1) / nrm
    im = jnp.sum(w * jnp.sin(phase), axis=-1) / nrm
    return re * re + im * im


def diffraction_psf(opd_grid: jnp.ndarray, ok_grid: jnp.ndarray,
                    wavelength_mm, pad: int = 4
                    ) -> Dict[str, jnp.ndarray]:
    """Diffraction PSF as the Fraunhofer transform of the pupil function.

    Args:
      opd_grid: (..., N, N) OPD sampled on a regular grid spanning the
        pupil square [-1, 1]²; entries outside the aperture are ignored.
      ok_grid: (..., N, N) aperture mask (vignetting/failures).
      pad: zero-padding factor (transform size pad·N).

    On the axon relay call this under ``jit`` with real outputs derived
    from ``psf`` — eager complex ops are unimplemented on that backend
    (complex intermediates inside a jitted program compile fine).

    Returns dict:
      ``psf``   (..., pad·N, pad·N) normalized so a perfect wavefront peaks
                at 1 (i.e. the center pixel IS the Strehl ratio).
      ``coords`` (pad·N,) image-plane coordinates in λ·f/# units (the Airy
                first zero sits at 1.22).
    """
    N = opd_grid.shape[-1]
    amp = ok_grid.astype(opd_grid.dtype)
    phase = 2.0 * jnp.pi * opd_grid / wavelength_mm
    pupil = amp * jnp.exp(1j * phase.astype(
        jnp.complex128 if opd_grid.dtype == jnp.float64 else jnp.complex64))
    M = pad * N
    field = jnp.fft.fftshift(
        jnp.fft.fft2(pupil, s=(M, M), axes=(-2, -1)), axes=(-2, -1))
    inten = jnp.abs(field) ** 2
    peak_ideal = jnp.sum(amp, axis=(-2, -1)) ** 2
    psf = inten / jnp.maximum(peak_ideal, 1.0)[..., None, None]
    # Pupil pitch is D/N; the FFT's image-plane step is
    # λ·F/(M·D/N) = λ·(F/D)·N/M = λ·f#/pad, so in λ·f# units:
    coords = (jnp.arange(M) - M // 2) / float(pad)
    return {"psf": psf, "coords": coords.astype(opd_grid.dtype)}


def diffraction_psf_window(opd_grid: jnp.ndarray, ok_grid: jnp.ndarray,
                           wavelength_mm, R_mm, r_xp_mm, pitch_mm: float,
                           shape: Tuple[int, int],
                           x_offset=0.0, y_offset=0.0,
                           oversample: int = 4
                           ) -> Dict[str, jnp.ndarray]:
    """Diffraction PSF sampled on an image-plane pixel window at an
    ARBITRARY sensor pitch — a direct (matrix-DFT) Fraunhofer evaluation of
    the traced pupil function, so the output drops straight into the
    imaging pipeline's physical PSF grid with no FFT-size/resampling step.
    Two small complex ``einsum`` contractions per (field, λ) — the
    separable DFT rides the MXU instead of forcing a pad·N FFT whose pitch
    never matches the sensor's.

    Args:
      opd_grid: (..., N, N) OPD in mm on a regular pupil grid whose cell
        centers span [-1, 1]² of the relative pupil (axis -2 = y, axis -1
        = x, the same layout `analysis.diffraction_mtf` builds).
      ok_grid: (..., N, N) aperture mask (vignetting/failures/incircle).
      wavelength_mm / R_mm / r_xp_mm: wavelength, reference-sphere radius
        (chief-ray image distance, see `opd_map`) and exit-pupil
        semi-diameter in mm, broadcastable to the batch shape (...,).
      pitch_mm: window pixel pitch on the sensor (mm).
      shape: (n_y, n_x) window size; pixel (a, b) sits at image-plane
        offset ((a−(n_y−1)/2)·pitch + y_offset, (b−(n_x−1)/2)·pitch +
        x_offset) from the chief image point — y increasing with row index
        (the caller flips to image orientation, exactly like
        `psf.sample_psfs`).
      x_offset / y_offset: (...,) offset of the window CENTER from the
        chief image point, mm (e.g. ``y_center − y_chief`` so lateral
        color lands inside a common per-field window).
      oversample: sub-samples per pixel axis; each output pixel is the
        box-integrated mean of an ``oversample``² sub-grid (the physical
        pixel-aperture model). Sensor pitches are far coarser than the
        intensity's finest feature (λ·f#/2 — the pupil-autocorrelation
        cutoff), so POINT-sampling a speckled PSF aliases: a 4 µm-pitch
        read of an f/2 aberrated PSF mis-weighs energy by ~30%.
        Keep ``pitch/oversample ≲ λ·f#/2``.

    Sampling conditions (see `imaging.diffraction_sampling_report`):
    the DFT of an N² pupil grid is periodic in the image plane with
    period λ·R·N/(2·r_xp); the window plus the PSF's aberration extent
    must fit inside it or replicas fold in (``accounted`` > 1 is the
    smoking gun). Pupil phase must also be Nyquist-sampled:
    N ≳ 4 × (peak-to-valley OPD in waves).

    On the axon relay call this under ``jit`` (complex intermediates; see
    `diffraction_psf`).

    Returns dict:
      ``psf``       (..., n_y, n_x) intensity, normalized to UNIT SUM over
                    the window (the imaging pipeline's kernel convention).
      ``accounted`` (...,) fraction of the total PSF energy inside the
                    window (Parseval: total energy = open pupil area).
    """
    n_y, n_x = int(shape[0]), int(shape[1])
    N = opd_grid.shape[-1]
    bshape = opd_grid.shape[:-2]
    dtype = opd_grid.dtype
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    amp = ok_grid.astype(dtype)
    lam = jnp.broadcast_to(jnp.asarray(wavelength_mm, dtype), bshape)
    R = jnp.broadcast_to(jnp.asarray(R_mm, dtype), bshape)
    r_xp = jnp.broadcast_to(jnp.asarray(r_xp_mm, dtype), bshape)
    x_off = jnp.broadcast_to(jnp.asarray(x_offset, dtype), bshape)
    y_off = jnp.broadcast_to(jnp.asarray(y_offset, dtype), bshape)

    # Physical pupil coordinates of the grid cell centers.
    g = ((jnp.arange(N, dtype=dtype) + 0.5) / N * 2.0 - 1.0)   # (N,)
    u = g[None, :] * r_xp.reshape(-1)[:, None]                 # flat batch
    lamR = (lam * R).reshape(-1)                               # (bat,)
    # Sub-pixel sample offsets from the chief image point: q samples per
    # pixel, centered so the q-block mean sits at the pixel center.
    q = max(int(oversample), 1)

    def _sub(n):
        idx = (jnp.arange(n * q, dtype=dtype) + 0.5) / q - 0.5
        return (idx - (n - 1) / 2.0) * pitch_mm

    oy = _sub(n_y)[None, :] + y_off.reshape(-1)[:, None]       # (bat, ny·q)
    ox = _sub(n_x)[None, :] + x_off.reshape(-1)[:, None]       # (bat, nx·q)

    # Pupil function with the wavefront phase (positive OPD lags the
    # reference sphere; the +i convention matches `diffraction_psf` and
    # reproduces the ray picture ε = +(R/r_xp)·∂OPD/∂ρ by stationary
    # phase — pinned against the geometric PSF centroid in tests).
    phase = (2.0 * jnp.pi / lam)[..., None, None] * opd_grid
    pupil = (amp * jnp.exp(1j * phase.astype(cdtype))).reshape(
        -1, N, N)                                              # (bat, N, N)
    # Separable DFT kernels e^{-i·2π·u·δ/(λR)}.
    ky = jnp.exp(-1j * (2.0 * jnp.pi * u[:, None, :] * oy[:, :, None]
                        / lamR[:, None, None]).astype(cdtype))  # (bat,ny,N)
    kx = jnp.exp(-1j * (2.0 * jnp.pi * u[:, None, :] * ox[:, :, None]
                        / lamR[:, None, None]).astype(cdtype))  # (bat,nx,N)
    t = jnp.einsum("zay,zyx->zax", ky, pupil)
    e = jnp.einsum("zax,zbx->zab", t, kx)              # (bat, ny·q, nx·q)
    inten = jnp.real(e) ** 2 + jnp.imag(e) ** 2
    # Box-integrate the q×q sub-grid of each pixel (pixel-aperture model).
    bat = inten.shape[0]
    inten = jnp.mean(
        inten.reshape(bat, n_y, q, n_x, q), axis=(2, 4))

    # Energy accounting (continuous Fraunhofer: E = (ΔuΔv/λR)·Ẽ; total
    # image-plane energy = ∫|P|² = Σamp²·ΔuΔv by Parseval; the in-window
    # Riemann sum uses the SUB-pixel step, which the block mean already
    # folded in: Σ_sub·(p/q)² = Σ_pix·p²).
    du = 2.0 * r_xp.reshape(-1) / N
    total = jnp.maximum(jnp.sum(amp.reshape(-1, N, N), axis=(-2, -1)), 1.0)
    in_window = jnp.sum(inten, axis=(-2, -1))
    accounted = (du * pitch_mm / lamR) ** 2 * in_window / total
    psf = inten / jnp.maximum(in_window, 1e-20)[:, None, None]

    return {"psf": psf.reshape(bshape + (n_y, n_x)),
            "accounted": accounted.reshape(bshape)}
