"""End-to-end image formation: lens -> PSF grid -> aberrated sensor image.

Working implementation of the reference's *dormant* imaging pipeline — the
commented-out `sample_optics_model` / `apply_optics_model` / `call` chain
(`optics_simulator_lite.py:217-344, 524-552`) plus its broken `image_ops`
dependencies — redesigned as pure functions:

    model = sample_optics_model(specs, lens, config, key)   # trace once
    irradiance, psnr, ssim = apply_optics_model(model, radiance, field_lim,
                                                config)      # render images

Everything (soft-histogram PSFs, patch-wise FFT convolution, bicubic
distortion warp, relative-illumination map) runs on-device with static
shapes; the whole render jits to one XLA program. BASELINE config 5.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu.ops import image as image_mod
from torchoptics_tpu.ops import metrics as metrics_mod
from torchoptics_tpu.ops import psf as psf_mod
from torchoptics_tpu.ops import trace as trace_mod
from torchoptics_tpu import simulator as sim_mod


class OpticsModel(NamedTuple):
    """Sampled optical data for one lens, ready for image rendering."""
    sampled_psfs: jnp.ndarray                 # (n_fields, ph, pw, 3)
    sampled_distortion_shifts: Optional[jnp.ndarray]  # (n_fields,)
    sampled_relative_illumination: Optional[jnp.ndarray]  # (n_fields,)
    y_center: jnp.ndarray                     # (n_fields,)
    # Fraction of PSF energy inside the sampling window: (n_fields,) ray
    # fraction for psf_source='geometric', (n_fields, channels) Parseval
    # energy fraction for 'diffraction'. When this drops the rendered PSFs
    # are clipped + renormalized and image metrics silently stop seeing the
    # excess blur — monitor it when optimizing through the image (see
    # image_quality_loss); >1 under 'diffraction' means DFT aliasing (see
    # diffraction_sampling_report).
    accounted: Optional[jnp.ndarray] = None


@functools.lru_cache(maxsize=None)
def _jitted_psf_window(pitch_mm: float, shape: Tuple[int, int],
                       oversample: int):
    """Jitted `diffraction_psf_window` closure, memoized per static config.

    The transform's complex intermediates must live inside a jit on the
    axon relay (eager complex ops are UNIMPLEMENTED there); real-in/
    real-out, so the nested jit is transparent — inlined when the caller is
    itself jitted (same pattern as ops.image SVOLA). Memoizing keeps repeat
    EAGER calls from re-tracing a fresh wrapper every time."""
    from torchoptics_tpu.ops import wavefront as wf

    return jax.jit(functools.partial(
        wf.diffraction_psf_window, pitch_mm=pitch_mm, shape=shape,
        oversample=oversample))


def _sample_diffraction_psfs(specs: Specs, lens: Lens,
                             config: sim_mod.SimulatorConfig,
                             key: Optional[jax.Array],
                             y_center: Optional[jnp.ndarray]):
    """Per-field diffraction PSFs on the sensor window — the pupil function
    from one grid-sampled OPD trace, matrix-DFT'd onto the
    ``config.psf_shape`` × ``psf_abs_pixel_size`` pixel grid
    (`ops.wavefront.diffraction_psf_window`), wavelengths grouped into
    channels exactly like the geometric path.

    Returns (psfs (F, n_y, n_x, C) image-oriented + unit-sum per channel,
    accounted (F, C) in-window ENERGY fraction, y_center (F,) — the
    chief-ray image heights (mean over λ) when not supplied)."""
    from torchoptics_tpu.models import glass as glass_mod
    from torchoptics_tpu.ops import wavefront as wf

    n = int(config.diffraction_grid_n)
    g = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    X, Y = np.meshgrid(g, g, indexing="xy")
    incircle = (X ** 2 + Y ** 2) <= 1.0
    cfg = config.trace_config()
    xr = jnp.asarray(X.ravel()[None, None, :, None], lens.dtype)
    yr = jnp.asarray(Y.ravel()[None, None, :, None], lens.dtype)
    out = wf.opd_map(specs, lens, cfg, key=key, xy=(xr, yr))
    opd = out["opd"][0]                               # (F, P, W)
    ok = out["ok"][0] & jnp.asarray(incircle.ravel())[None, :, None]
    F, _, W = opd.shape
    opd_g = jnp.transpose(opd, (0, 2, 1)).reshape(F, W, n, n)
    ok_g = jnp.transpose(ok, (0, 2, 1)).reshape(F, W, n, n)

    z_xp = wf.exit_pupil_distance(lens)[0]
    r_xp = specs.epd[0] / 2.0 * wf.pupil_magnification(lens)[0]
    x_img = out["x_img"][0]                           # (F, W)
    y_img = out["y_img"][0]
    R = jnp.sqrt(z_xp ** 2 + x_img ** 2 + y_img ** 2)
    if y_center is None:
        # The chief-ray image height IS the (distorted) field center —
        # no full-pupil centroid trace needed.
        y_center = jnp.mean(y_img, axis=1)            # (F,)
    lam_mm = jnp.asarray(
        [w * 1e-6 for w in glass_mod.resolve_wavelengths(cfg.wavelengths)],
        lens.dtype)

    win = _jitted_psf_window(config.psf_abs_pixel_size, config.psf_shape,
                             config.diffraction_oversample)
    res = win(opd_g, ok_g, lam_mm[None, :], R, r_xp,
              x_offset=-x_img, y_offset=y_center[:, None] - y_img)
    psf_fw = res["psf"]                               # (F, W, n_y, n_x)
    acc_fw = res["accounted"]                         # (F, W)

    # Wavelength -> channel grouping (same map as the geometric path).
    ch = np.asarray(psf_mod.channel_assignment(W, 3))
    onehot = jnp.asarray((ch[None, :] == np.arange(3)[:, None]),
                         lens.dtype)                  # (C, W)
    psfs = jnp.einsum("cw,fwyx->fcyx", onehot, psf_fw)
    psfs = psfs / jnp.maximum(
        jnp.sum(psfs, axis=(-1, -2), keepdims=True), 1e-20)
    accounted = (jnp.sum(acc_fw[:, None, :] * onehot[None, :, :], axis=-1)
                 / jnp.maximum(jnp.sum(onehot, axis=1)[None, :], 1.0)
                 )                                    # (F, C) mean per ch
    psfs = jnp.transpose(psfs, (0, 2, 3, 1))          # (F, n_y, n_x, C)
    psfs = jnp.flip(psfs, axis=1)                     # image orientation
    return psfs, accounted, y_center


def diffraction_sampling_report(specs: Specs, lens: Lens,
                                config: sim_mod.SimulatorConfig,
                                key: Optional[jax.Array] = None) -> Dict:
    """Host-side (eager) adequacy check of the ``psf_source='diffraction'``
    sampling parameters — run this once before committing to a config; the
    render itself is jitted and cannot check.

    Conditions (see `ops.wavefront.diffraction_psf_window`):
      1. pupil-phase Nyquist: ``diffraction_grid_n ≥ ~4 × peak-to-valley
         OPD in waves`` (worst field/λ);
      2. DFT alias period ``λ·R·grid_n/(2·r_xp)`` must exceed the PSF
         window diagonal plus the geometric blur extent;
      3. pixel sub-sampling: ``pitch/oversample ≲ λ·f#/2`` (the intensity
         bandlimit), or in-window energy is a biased point-sample.

    Returns a dict of the measured numbers plus an ``ok`` flag and
    human-readable ``warnings``."""
    from torchoptics_tpu.models import glass as glass_mod
    from torchoptics_tpu.ops import wavefront as wf

    n = int(config.diffraction_grid_n)
    g = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    X, Y = np.meshgrid(g, g, indexing="xy")
    incircle = (X ** 2 + Y ** 2) <= 1.0
    cfg = config.trace_config()
    xr = jnp.asarray(X.ravel()[None, None, :, None], lens.dtype)
    yr = jnp.asarray(Y.ravel()[None, None, :, None], lens.dtype)
    out = wf.opd_map(specs, lens, cfg, key=key, xy=(xr, yr))
    opd = np.asarray(out["opd"][0])                    # (F, P, W)
    ok = (np.asarray(out["ok"][0])
          & incircle.ravel()[None, :, None])
    lam_mm = np.asarray(glass_mod.resolve_wavelengths(
        cfg.wavelengths)) * 1e-6
    pv_waves = 0.0
    blur_mm = 0.0
    z_xp = float(wf.exit_pupil_distance(lens)[0])
    r_xp = float(specs.epd[0] / 2.0 * wf.pupil_magnification(lens)[0])
    for f in range(opd.shape[0]):
        for w in range(opd.shape[2]):
            sel = ok[f, :, w]
            if not sel.any():
                continue
            vals = opd[f, sel, w]
            pv_waves = max(pv_waves, float(np.ptp(vals)) / lam_mm[w])
            # Transverse blur radius from the wavefront slope:
            # ε ≈ (R/r_xp)·∂OPD/∂ρ, bounded by PV over one grid step.
            grid = np.where(sel.reshape(n, n), opd[f, :, w].reshape(n, n),
                            np.nan)
            gy = np.abs(np.diff(grid, axis=0))
            gx = np.abs(np.diff(grid, axis=1))
            slope = np.nanmax([np.nanmax(gy, initial=0.0),
                               np.nanmax(gx, initial=0.0)]) / (2.0 / n)
            blur_mm = max(blur_mm, abs(z_xp) / r_xp * float(slope))
    fno = abs(z_xp) / (2.0 * r_xp)
    lam_min = float(lam_mm.min())
    alias_mm = lam_min * abs(z_xp) * n / (2.0 * r_xp)
    window_mm = (math.hypot(*config.psf_shape) / 2.0
                 * config.psf_abs_pixel_size)
    sub_pitch = config.psf_abs_pixel_size / max(
        int(config.diffraction_oversample), 1)
    nyq_pitch = lam_min * fno / 2.0
    warnings = []
    if n < 4.0 * pv_waves:
        warnings.append(
            f"pupil grid {n} undersamples {pv_waves:.1f}λ P-V OPD — set "
            f"diffraction_grid_n >= {int(math.ceil(4 * pv_waves))} (or use "
            f"psf_source='geometric': this lens is aberration-dominated)")
    if alias_mm < window_mm + blur_mm:
        warnings.append(
            f"DFT alias period {alias_mm * 1e3:.0f} um < window+blur "
            f"{(window_mm + blur_mm) * 1e3:.0f} um — replicas fold into "
            f"the window (accounted > 1 is the symptom); raise "
            f"diffraction_grid_n")
    if sub_pitch > 1.5 * nyq_pitch:
        warnings.append(
            f"sub-pixel pitch {sub_pitch * 1e3:.2f} um > ~1.5x the "
            f"intensity Nyquist pitch {nyq_pitch * 1e3:.2f} um (λ·f#/2) — "
            f"raise diffraction_oversample")
    return {"pv_waves": pv_waves, "blur_mm": blur_mm, "alias_mm": alias_mm,
            "window_mm": window_mm, "sub_pitch_mm": sub_pitch,
            "nyquist_pitch_mm": nyq_pitch, "fno_working": fno,
            "ok": not warnings, "warnings": warnings}


def sample_optics_model(specs: Specs, lens: Lens,
                        config: sim_mod.SimulatorConfig,
                        key: Optional[jax.Array] = None) -> OpticsModel:
    """Trace the lens and sample PSFs / distortion / relative illumination at
    ``config.n_sampled_fields`` field values
    (reference `optics_simulator_lite.py:524-552`).

    ``config.psf_source`` selects the PSF physics: ``'geometric'`` (the
    reference's ray splat) or ``'diffraction'`` (pupil-function transform —
    see :class:`~torchoptics_tpu.simulator.SimulatorConfig`)."""
    cfg = config.trace_config()
    n_fields = len(cfg.rel_fields)

    if config.apply_distortion and not config.distortion_by_warping:
        y_center = abcd_mod.get_paraxial_heights_at_image_plane(
            specs, lens, np.linspace(0, 1, n_fields))[0]
    else:
        y_center = None

    if config.psf_source == "diffraction":
        psfs, accounted, y_center = _sample_diffraction_psfs(
            specs, lens, config, key, y_center)
    elif config.psf_source == "geometric":
        res = trace_mod.trace_rays(specs, lens, cfg, key=key)
        if y_center is None:
            y_center = jnp.mean(res.y.reshape(n_fields, -1), axis=1)
        psfs, accounted = psf_mod.sample_psfs(
            res.x, res.y, y_center, config.psf_shape,
            config.psf_abs_pixel_size)
    else:
        raise ValueError(
            f"psf_source must be 'geometric' or 'diffraction', got "
            f"{config.psf_source!r}")
    psfs = image_mod.ensure_finite(psfs, 0.0)
    accounted = image_mod.ensure_finite(accounted, 0.0)

    shifts = None
    if config.apply_distortion and config.distortion_by_warping:
        shifts = image_mod.ensure_finite(
            image_mod.sample_distortion_shifts(specs, lens, y_center), 0.0)

    rel_illum = None
    if config.apply_relative_illumination:
        mean_wavelength = float(np.mean(config.wavelengths))
        ri = metrics_mod.compute_relative_illumination(
            specs, lens, tuple(np.linspace(0, 1, n_fields)),
            wavelengths=(mean_wavelength,),
            n_ray_aiming_iter=config.n_ray_aiming_iter)[0, :, 0]
        rel_illum = image_mod.ensure_finite(ri, 1.0)

    return OpticsModel(psfs, shifts, rel_illum, y_center, accounted)


def sample_field_lim(img_h: int, img_w: int, simulated_res_factor: int = 1,
                     roi_index: int = 0) -> Tuple[float, float, float, float]:
    """Object-space coordinates of the image corners, normalized so
    x² + y² = 1 is the full-field edge
    (reference `optics_simulator_lite.py:229-247`)."""
    factor = int(simulated_res_factor)
    roi_index = roi_index % (factor ** 2)
    row, col = roi_index // factor, roi_index % factor
    diag = math.sqrt(img_h ** 2 + img_w ** 2)
    y0 = -img_h / diag * (2 * row / factor - 1)
    y1 = -img_h / diag * (2 * (row + 1) / factor - 1)
    x0 = img_w / diag * (2 * col / factor - 1)
    x1 = img_w / diag * (2 * (col + 1) / factor - 1)
    return x0, x1, y0, y1


def compute_distortion_shift(model: OpticsModel, x, y, x_lim, y_lim,
                             field_lim):
    """Distortion shift of image coordinates (relative to x_lim/y_lim);
    reference `optics_simulator_lite.py:249-267`."""
    x0, x1, y0, y1 = field_lim
    x_field = (x - x_lim[0]) / (x_lim[1] - x_lim[0]) * (x1 - x0) + x0
    y_field = (y - y_lim[0]) / (y_lim[1] - y_lim[0]) * (y1 - y0) + y0
    dx_f, dy_f = image_mod.interpolate_distortion_shifts(
        model.sampled_distortion_shifts, x_field, y_field)
    delta_x = dx_f * (x_lim[1] - x_lim[0]) / (x1 - x0)
    delta_y = dy_f * (y_lim[1] - y_lim[0]) / (y1 - y0)
    return delta_x, delta_y


def resolve_max_warp_px(config: sim_mod.SimulatorConfig,
                        img_h: int, img_w: int) -> int:
    """Static per-axis shift bound for the tap-sum warps.

    ``config.max_warp_px`` if set; else auto — ceil(4.5% of the image
    half-diagonal), min 8 px. 4.5% comfortably covers the zoo's worst
    distortion (double-Gauss corner ≈3.6%); the auto bound grows with
    resolution, so a 2048² render keeps the corner geometry a fixed
    1024² budget would clamp, and a 256² render pays 2M+5 = 23 taps/axis
    instead of 71.

    The tap-sum warps CLAMP shifts into this band — a lens whose corner
    shift exceeds it renders with flattened corner geometry.
    :func:`apply_optics_model` raises when it can see that happening
    (eager call, concrete shifts); under ``jit`` it cannot, so for
    unusually distorted lenses pre-check with :func:`required_warp_band`
    or use ``warp_method='gather'`` (exact for any shift)."""
    if config.max_warp_px is not None:
        return int(config.max_warp_px)
    half_diag = 0.5 * math.sqrt(img_h ** 2 + img_w ** 2)
    return max(8, int(math.ceil(0.045 * half_diag)))


def required_warp_band(model: OpticsModel, field_lim, img_h: int,
                       img_w: int, n_grid: int = 129) -> jnp.ndarray:
    """Max |distortion shift| in pixels over the image — the per-axis band
    the tap-sum warps need to render ``model`` without clamping.

    Evaluated on an ``n_grid``² pixel grid that includes the exact image
    corners (where the radial shift of any real design peaks); returns a
    jnp scalar, concrete when ``model`` is. Compare against
    :func:`resolve_max_warp_px`."""
    if model.sampled_distortion_shifts is None:
        return jnp.zeros(())
    ii = jnp.linspace(0.0, float(img_h - 1), n_grid)[:, None]
    jj = jnp.linspace(0.0, float(img_w - 1), n_grid)[None, :]
    xn = jj * (2.0 / (img_w - 1)) - 1.0
    yn = ii * (2.0 / (img_h - 1)) - 1.0
    xn, yn = jnp.broadcast_arrays(xn, yn)
    dx, dy = compute_distortion_shift(model, xn, yn, (-1, 1), (-1, 1),
                                      field_lim)
    return jnp.maximum(jnp.max(jnp.abs(dx)) * (img_w - 1) / 2.0,
                       jnp.max(jnp.abs(dy)) * (img_h - 1) / 2.0)


def apply_optics_model(model: OpticsModel, radiance: jnp.ndarray,
                       field_lim, config: sim_mod.SimulatorConfig,
                       max_value: float = 255.0):
    """Render the aberrated image (reference
    `optics_simulator_lite.py:272-322`).

    Args:
      model: sampled optics (PSFs per field, distortion, illumination).
      radiance: (B, H, W, 3) ideal image.
      field_lim: (x0, x1, y0, y1) object-space limits of the image.

    Returns (irradiance, psnr, ssim).
    """
    # field_lim must be static Python floats (it defines the PSF patch
    # geometry, which is compile-time structure).
    x0, x1, y0, y1 = (float(v) for v in field_lim)
    img_h, img_w = radiance.shape[1:3]
    diag = math.sqrt(img_h ** 2 + img_w ** 2)
    y_map = np.linspace(y0, y1, img_h, dtype=np.float32)
    x_map = np.linspace(x0, x1, img_w, dtype=np.float32)
    # Static geometry: keep the field map in numpy so the per-patch PSF
    # weights constant-fold at trace time (`ops.image.get_psf_weights`) and
    # the RI hat weights broadcast as constants.
    field_map = np.sqrt(x_map[None, :] ** 2 + y_map[:, None] ** 2)

    # Resize PSFs to the simulated resolution (odd-rounded).
    psf_shape = np.asarray(config.psf_shape)
    factor = int(config.simulated_res_factor)
    resized = (psf_shape * config.psf_abs_pixel_size * factor * diag
               / config.sensor_diagonal)
    resized = (np.floor(resized / 2) * 2 + 1).astype(int)
    resized = np.maximum(resized, 3)

    gh, gw = config.psf_grid_shape
    psfs = image_mod.interpolate_psfs(model.sampled_psfs, field_map,
                                      (gh, gw))
    psfs = image_mod.rotate_and_resize_psfs(
        psfs, x_map, y_map, (gh, gw), tuple(resized))

    overlap = tuple(int(v) for v in
                    (0.25 * np.asarray(radiance.shape[1:3])
                     / np.asarray(config.psf_grid_shape)).astype(int))
    irradiance = image_mod.svola_convolution(
        radiance, overlap, jnp.broadcast_to(
            psfs, (radiance.shape[0],) + psfs.shape[1:]),
        config.psf_grid_shape, "hann")

    psnr = image_mod.psnr(radiance, irradiance, max_value)
    ssim = image_mod.ssim(radiance, irradiance, max_value)

    if config.apply_relative_illumination and \
            model.sampled_relative_illumination is not None:
        ri_map = image_mod.interpolate_relative_illumination(
            model.sampled_relative_illumination, field_map)
        irradiance = irradiance * ri_map[None, ..., None]

    if config.apply_distortion and config.distortion_by_warping and \
            model.sampled_distortion_shifts is not None:
        # Shift field in pixels, evaluable at float pixel coordinates (the
        # [-1,1] grid maps column j to pixel j exactly, so shift_px =
        # shift_norm·(N-1)/2). The separable warp needs the FIELD (it
        # evaluates at preimage rows); the one-pass methods sample it on
        # the integer grid.
        def shifts_px(iip, jjp):
            xn = jnp.asarray(jjp) * (2.0 / (img_w - 1)) - 1.0
            yn = jnp.asarray(iip) * (2.0 / (img_h - 1)) - 1.0
            xn, yn = jnp.broadcast_arrays(xn, yn)
            dx, dy = compute_distortion_shift(
                model, xn, yn, (-1, 1), (-1, 1), field_lim)
            return dx * (img_w - 1) / 2.0, dy * (img_h - 1) / 2.0

        warp_band = resolve_max_warp_px(config, img_h, img_w)
        if config.warp_method in ("separable", "taps") and not isinstance(
                model.sampled_distortion_shifts, jax.core.Tracer):
            # Honesty check (eager path only — under jit the shifts are
            # tracers): the tap-sum warps clamp shifts into the static
            # band, which would silently flatten corner geometry.
            need = float(required_warp_band(model, field_lim, img_h, img_w))
            if need > warp_band:
                raise ValueError(
                    f"distortion shifts reach {need:.1f} px but the static "
                    f"warp band is {warp_band} px — tap-sum warping would "
                    f"clamp the corners. Set SimulatorConfig.max_warp_px >= "
                    f"{math.ceil(need)} or use warp_method='gather' (exact "
                    f"for any shift).")
        if config.warp_method == "separable":
            irradiance = image_mod.warp_bicubic_separable(
                irradiance,
                lambda ii, jj: shifts_px(ii, jj)[0],
                lambda ii, jj: shifts_px(ii, jj)[1],
                warp_band)
        elif config.warp_method == "taps":
            ii = jnp.arange(img_h, dtype=irradiance.dtype)[:, None]
            jj = jnp.arange(img_w, dtype=irradiance.dtype)[None, :]
            sx_px, sy_px = shifts_px(ii, jj)
            irradiance = image_mod.warp_bicubic_shifts(
                irradiance, sx_px, sy_px, warp_band)
        elif config.warp_method == "gather":
            x_img = jnp.broadcast_to(
                jnp.linspace(-1.0, 1.0, img_w)[None, :],
                (img_h, img_w)).reshape(-1)
            y_img = jnp.broadcast_to(
                jnp.linspace(-1.0, 1.0, img_h)[:, None],
                (img_h, img_w)).reshape(-1)
            x_shift, y_shift = compute_distortion_shift(
                model, x_img, y_img, (-1, 1), (-1, 1), field_lim)
            irradiance = image_mod.apply_distortion_by_warping(
                irradiance, x_img - x_shift, y_img - y_shift)
        else:
            raise ValueError(
                f"warp_method must be 'separable', 'gather', or 'taps', "
                f"got {config.warp_method!r}")

    return irradiance, psnr, ssim


def simulate(specs: Specs, lens: Lens, radiance: jnp.ndarray,
             config: sim_mod.SimulatorConfig,
             key: Optional[jax.Array] = None,
             field_lim=None, roi_index: int = 0):
    """One-call pipeline: sample the optics model and render
    (the reference's intended ``OpticsSimulator.call``,
    `optics_simulator_lite.py:324-343`)."""
    model = sample_optics_model(specs, lens, config, key=key)
    if field_lim is None:
        field_lim = sample_field_lim(radiance.shape[1], radiance.shape[2],
                                     config.simulated_res_factor, roi_index)
    return apply_optics_model(model, radiance, field_lim, config)


def image_quality_loss(specs: Specs, lens: Lens, radiance: jnp.ndarray,
                       config: sim_mod.SimulatorConfig,
                       key: Optional[jax.Array] = None,
                       field_lim=None, roi_index: int = 0,
                       ssim_weight: float = 0.0,
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Differentiable image-quality objective for lens design: ``-PSNR +
    ssim_weight · (1 - SSIM)`` of the rendered sensor image against the
    ideal radiance (expected in [0, 255]).

    This closes the loop the reference's training forward exists for
    (`optics_simulator_lite.py:325-343` logs PSNR/SSIM of
    ``apply_optics_model`` output as optimization metrics — lens design
    driven by rendered image quality, the premise of arXiv:2212.04441; the
    path is dormant there). Gradients flow through the full
    trace → PSF soft-histogram → SVOLA convolution → warp chain.

    Returns ``(total, {"psnr", "ssim", "image_loss", "psf_accounted"})``.

    Caveat — PSF window clipping: once a blur spot grows past the
    ``config.psf_shape × psf_abs_pixel_size`` sampling window, the clipped
    PSF is renormalized and the *rendered* image stops degrading (PSNR can
    even recover at extreme defocus), so the objective is blind out there.
    ``psf_accounted`` (mean in-window energy fraction) is reported for
    monitoring; keep starting perturbations inside the window, enlarge the
    window, or anneal from a ray-space spot objective first.
    """
    model = sample_optics_model(specs, lens, config, key=key)
    if field_lim is None:
        field_lim = sample_field_lim(radiance.shape[1], radiance.shape[2],
                                     config.simulated_res_factor, roi_index)
    _, psnr, ssim = apply_optics_model(model, radiance, field_lim, config)
    psnr = jnp.mean(psnr)       # batch mean -> scalar objective
    ssim = jnp.mean(ssim)
    total = -psnr + ssim_weight * (1.0 - ssim)
    return total, {"psnr": psnr, "ssim": ssim, "image_loss": total,
                   "psf_accounted": jnp.mean(model.accounted)}


def make_image_loss_fn(radiance: jnp.ndarray, ssim_weight: float = 0.0,
                       field_lim=None, roi_index: int = 0):
    """Adapt :func:`image_quality_loss` to the ``LensOptimizer.loss_fn``
    override signature ``(specs, lens, config, g, catalog_g, key)`` so a
    stock :class:`~torchoptics_tpu.optimize.LensOptimizer` runs Adam on
    rendered image quality instead of the ray-space loss."""
    def loss_fn(specs, lens, config, g, catalog_g, key):
        del g, catalog_g
        return image_quality_loss(specs, lens, radiance, config, key=key,
                                  field_lim=field_lim, roi_index=roi_index,
                                  ssim_weight=ssim_weight)
    return loss_fn
