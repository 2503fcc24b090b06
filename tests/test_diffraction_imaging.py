"""Diffraction-PSF imaging option (`psf_source='diffraction'`).

The matrix-DFT window function (`ops.wavefront.diffraction_psf_window`) is
pinned against closed-form Airy facts and a brute-force Fraunhofer sum; the
pipeline branch (`imaging.sample_optics_model`) against the geometric PSF's
centroid (the stationary-phase limit) and energy conservation. This is a
TPU-build superset: the reference's dormant image path
(`optics_simulator_lite.py:524-552`) only ever had the geometric ray splat
(`ray_tracing.py:206-270`).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import imaging, zoo
from torchoptics_tpu import simulator as sim
from torchoptics_tpu.ops import wavefront as wf

LAM = 0.5e-3   # mm
R = 100.0      # reference-sphere radius, mm
R_XP = 25.0    # exit-pupil semi-diameter, mm  (working f/2)


def _flat_pupil(n):
    g = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    X, Y = np.meshgrid(g, g, indexing="xy")
    ok = jnp.asarray((X ** 2 + Y ** 2) <= 1.0)
    return jnp.zeros((n, n), jnp.float32), ok, X, Y


def test_window_airy_peak_and_energy():
    """Flat wavefront: peak at the window center, unit-sum PSF, and the
    in-window energy fraction close to (but never above) 1 for a window
    spanning several Airy rings."""
    opd, ok, _, _ = _flat_pupil(64)
    pitch = 0.5e-3  # 0.5 um, Airy radius = 1.22*lam*R/(2*r_xp) = 1.22 um
    out = wf.diffraction_psf_window(opd, ok, LAM, R, R_XP, pitch, (33, 33),
                                    oversample=2)
    psf = np.asarray(out["psf"])
    acc = float(out["accounted"])
    np.testing.assert_allclose(psf.sum(), 1.0, rtol=1e-5)
    iy, ix = np.unravel_index(np.argmax(psf), psf.shape)
    assert (iy, ix) == (16, 16)
    # +-8 um window at 1.22 um Airy radius holds ~95% of the energy;
    # Parseval accounting must never exceed 1.
    assert 0.90 < acc <= 1.005, acc


def test_window_matches_bruteforce_dft():
    """Pixel values equal the direct Fraunhofer sum (complex128 brute
    force) at oversample=1 — the einsum factorization is exact."""
    n = 32
    rng = np.random.default_rng(3)
    g = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    X, Y = np.meshgrid(g, g, indexing="xy")
    ok_np = (X ** 2 + Y ** 2) <= 1.0
    opd_np = (0.3 * LAM * (2 * (X ** 2 + Y ** 2) - 1)
              + 0.1 * LAM * rng.standard_normal((n, n))).astype(np.float32)
    out = wf.diffraction_psf_window(
        jnp.asarray(opd_np), jnp.asarray(ok_np), LAM, R, R_XP,
        1e-3, (9, 9), x_offset=0.7e-3, y_offset=-0.4e-3, oversample=1)

    u = g * R_XP
    pupil = ok_np * np.exp(1j * 2 * np.pi / LAM * opd_np.astype(np.float64))
    rows = (np.arange(9) - 4.0) * 1e-3 - 0.4e-3
    cols = (np.arange(9) - 4.0) * 1e-3 + 0.7e-3
    e = np.zeros((9, 9), np.complex128)
    for a in range(9):
        for b in range(9):
            ph = np.exp(-1j * 2 * np.pi
                        * (u[:, None] * rows[a] + u[None, :] * cols[b])
                        / (LAM * R))
            # pupil axes are (y, x): u[:, None] is the y coordinate
            e[a, b] = np.sum(pupil * ph)
    inten = np.abs(e) ** 2
    want = inten / inten.sum()
    np.testing.assert_allclose(np.asarray(out["psf"]), want, rtol=2e-4,
                               atol=1e-9)


def test_window_tilt_shifts_and_offset_recenters():
    """A wavefront tilt a*y_rel displaces the PSF by +(R/r_xp)*a in y (the
    ray picture eps = +(R/r_xp)*dOPD/drho); passing that displacement as
    y_offset recenters the window on it."""
    n = 64
    _, ok, _, Y = _flat_pupil(n)
    a = 2.0 * LAM
    opd = jnp.asarray((a * Y).astype(np.float32))
    dy = R / R_XP * a            # 4 um
    pitch = 0.5e-3
    out = wf.diffraction_psf_window(opd, ok, LAM, R, R_XP, pitch, (33, 33),
                                    oversample=2)
    psf = np.asarray(out["psf"])
    iy, ix = np.unravel_index(np.argmax(psf), psf.shape)
    assert ix == 16
    assert iy == 16 + round(dy / pitch)   # row index increases with +y
    out2 = wf.diffraction_psf_window(opd, ok, LAM, R, R_XP, pitch, (33, 33),
                                     y_offset=dy, oversample=2)
    psf2 = np.asarray(out2["psf"])
    assert np.unravel_index(np.argmax(psf2), psf2.shape) == (16, 16)


def test_window_oversample_integrates_pixel_aperture():
    """Box-integrated pixels conserve the energy accounting where a point
    sample of the speckled intensity is biased: at a pitch well above the
    lam*f#/2 intensity Nyquist, oversample=4 must keep accounted <= ~1
    while oversample=1 overshoots."""
    n = 96
    g = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    X, Y = np.meshgrid(g, g, indexing="xy")
    ok = jnp.asarray((X ** 2 + Y ** 2) <= 1.0)
    rng = np.random.default_rng(0)
    # several waves of mid-frequency aberration -> speckled core
    opd = jnp.asarray((1.5 * LAM * rng.standard_normal((6, 6))
                       ).astype(np.float32))
    opd = jnp.asarray(np.kron(np.asarray(opd), np.ones((16, 16))
                              ).astype(np.float32))
    kw = dict(pitch_mm=4e-3, shape=(25, 25))
    acc1 = float(wf.diffraction_psf_window(opd, ok, LAM, R, R_XP,
                                           oversample=1, **kw)["accounted"])
    acc4 = float(wf.diffraction_psf_window(opd, ok, LAM, R, R_XP,
                                           oversample=4, **kw)["accounted"])
    assert acc4 <= 1.01, acc4
    assert abs(acc4 - 1.0) < abs(acc1 - 1.0) or acc1 <= 1.01


def test_window_differentiable():
    """The render path must train: the f32 VJP wrt the OPD grid is finite,
    nonzero, and matches central differences of a complex128 numpy twin of
    the same Fraunhofer sum (the twin's VALUES are pinned against the jax
    forward by test_window_matches_bruteforce_dft; jax itself cannot do
    the f64 probe in-process — jax_enable_x64 is process-global)."""
    import jax

    n = 24
    g = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    X, Y = np.meshgrid(g, g, indexing="xy")
    ok_np = (X ** 2 + Y ** 2) <= 1.0
    opd_np = 0.2 * LAM * (X ** 2 + Y ** 2)
    pitch = 1e-3
    u = (g * R_XP).astype(np.float64)

    def center_np(opd):
        """center-pixel psf * accounted = const * |e(0,0)|^2 / total."""
        pupil = ok_np * np.exp(1j * 2 * np.pi / LAM * opd.astype(np.float64))
        e00 = pupil.sum()                      # window center: zero offsets
        du = 2.0 * R_XP / n
        total = ok_np.sum()
        return (du * pitch / (LAM * R)) ** 2 * abs(e00) ** 2 / total

    def center(opd):
        out = wf.diffraction_psf_window(opd, jnp.asarray(ok_np), LAM, R,
                                        R_XP, pitch, (9, 9), oversample=1)
        return out["psf"][4, 4] * out["accounted"]

    grad = np.asarray(jax.jit(jax.grad(center))(
        jnp.asarray(opd_np, jnp.float32)))
    assert np.isfinite(grad).all() and np.abs(grad).max() > 0
    i, j = np.unravel_index(np.argmax(np.abs(grad)), grad.shape)
    eps = 1e-4 * LAM
    d = np.zeros((n, n)); d[i, j] = eps
    fd = (center_np(opd_np + d) - center_np(opd_np - d)) / (2 * eps)
    np.testing.assert_allclose(grad[i, j], fd, rtol=0.02)


CFG_GEO = sim.SimulatorConfig(
    n_sampled_fields=3, n_pupil_rings=8, pupil_sampling="circular",
    n_ray_aiming_iter=1, psf_shape=(33, 33), psf_abs_pixel_size=2e-3,
    psf_grid_shape=(3, 3), wavelengths=(459.0, 520.0, 640.0))
CFG_DIFF = dataclasses.replace(CFG_GEO, psf_source="diffraction",
                               diffraction_grid_n=64,
                               diffraction_oversample=4)


def test_sample_optics_model_diffraction_small():
    """Fast plumbing check of the pipeline branch: shapes, finiteness,
    unit-sum kernels and a sane energy accounting at a small pupil grid
    (the full-accuracy flagship pin is the slow test below)."""
    specs, lens = zoo.build("double_gauss_asph_xy")
    cfg = dataclasses.replace(
        CFG_DIFF, n_sampled_fields=2, psf_shape=(17, 17),
        diffraction_grid_n=32, diffraction_oversample=2)
    md = imaging.sample_optics_model(specs, lens, cfg)
    assert md.sampled_psfs.shape == (2, 17, 17, 3)
    p = np.asarray(md.sampled_psfs)
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p.sum(axis=(1, 2)), 1.0, rtol=1e-4)
    acc = np.asarray(md.accounted)
    assert acc.shape == (2, 3)
    assert (acc > 0.5).all() and (acc < 1.3).all(), acc
    assert np.isfinite(np.asarray(md.y_center)).all()


@pytest.mark.slow
def test_sample_optics_model_diffraction_flagship():
    """Pipeline branch on the diffraction-limited flagship: shapes/finite/
    unit-sum like the geometric path, near-unit energy accounting, and the
    on-axis PSF centroid matching the geometric splat (stationary phase)
    to well under a pixel."""
    specs, lens = zoo.build("double_gauss_asph_xy")
    md = imaging.sample_optics_model(specs, lens, CFG_DIFF)
    mg = imaging.sample_optics_model(specs, lens, CFG_GEO)
    assert md.sampled_psfs.shape == (3, 33, 33, 3)
    p = np.asarray(md.sampled_psfs)
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p.sum(axis=(1, 2)), 1.0, rtol=1e-4)
    acc = np.asarray(md.accounted)
    assert (acc > 0.9).all() and (acc < 1.05).all(), acc
    # same window placement as the geometric path
    np.testing.assert_allclose(np.asarray(md.y_center),
                               np.asarray(mg.y_center), atol=6e-3)

    def centroid_rows(psfs):
        rows = (16 - np.arange(33))[None, :, None]      # +y up after flip
        m = psfs.sum(axis=2)
        return (m * rows).sum(axis=1) / m.sum(axis=1)
    cd = centroid_rows(p)
    cg = centroid_rows(np.asarray(mg.sampled_psfs))
    assert abs(cd[0] - cg[0]).max() < 0.1   # on-axis, px


def test_sampling_report_flags_undersampling():
    """The eager adequacy check: a 27-wave Cooke on a 16^2 pupil grid is
    flagged; the metrics come back as finite floats."""
    specs, lens = zoo.build("cooke")
    cfg = dataclasses.replace(CFG_DIFF, diffraction_grid_n=16)
    rep = imaging.diffraction_sampling_report(specs, lens, cfg)
    assert not rep["ok"]
    assert any("undersamples" in w for w in rep["warnings"])
    assert rep["pv_waves"] > 4.0
    for k in ("blur_mm", "alias_mm", "window_mm", "fno_working"):
        assert np.isfinite(rep[k])


def test_psf_source_invalid_raises():
    specs, lens = zoo.build("cooke")
    cfg = dataclasses.replace(CFG_GEO, psf_source="wavelet")
    with pytest.raises(ValueError, match="psf_source"):
        imaging.sample_optics_model(specs, lens, cfg)


@pytest.mark.slow
def test_image_quality_trains_through_diffraction():
    """The physical-optics render is an OBJECTIVE, not just a viewer:
    gradients of -PSNR flow through trace -> OPD -> pupil DFT -> SVOLA ->
    warp to every lens parameter, finite and nonzero, and a defocused
    flagship scores worse than nominal through the diffraction render."""
    import jax

    from torchoptics_tpu.utils import images as img_util

    specs, lens = zoo.build("double_gauss_asph_xy")
    cfg = dataclasses.replace(
        CFG_DIFF, n_sampled_fields=2, psf_shape=(17, 17),
        diffraction_grid_n=32, diffraction_oversample=2)
    radiance = jnp.asarray(
        img_util.load_test_image((32, 32), prefer_real=True)[None])

    def neg_psnr(c, t):
        l = lens.replace(c=c, t=t)
        total, _ = imaging.image_quality_loss(specs, l, radiance, cfg)
        return total

    gc, gt = jax.jit(jax.grad(neg_psnr, argnums=(0, 1)))(lens.c, lens.t)
    for name, g in (("c", gc), ("t", gt)):
        arr = np.asarray(g)
        assert np.isfinite(arr).all() and np.abs(arr).max() > 0, name

    # defocus degrades the rendered-image objective
    f0 = float(neg_psnr(lens.c, lens.t))
    f1 = float(neg_psnr(lens.c, lens.t.at[0, -1].add(0.05)))
    assert f1 > f0 + 0.1, (f0, f1)


@pytest.mark.slow
def test_diffraction_render_and_adequate_config():
    """Full render through the diffraction PSFs stays finite, and at
    grid_n=128 the flagship config passes the sampling report with
    accounted pinned to [0.97, 1.005]."""
    specs, lens = zoo.build("double_gauss_asph_xy")
    cfg = dataclasses.replace(CFG_DIFF, diffraction_grid_n=128)
    rep = imaging.diffraction_sampling_report(specs, lens, cfg)
    assert rep["ok"], rep["warnings"]
    md = imaging.sample_optics_model(specs, lens, cfg)
    acc = np.asarray(md.accounted)
    assert (acc > 0.97).all() and (acc <= 1.005).all(), acc
    rng = np.random.default_rng(0)
    rad = jnp.asarray(rng.uniform(0, 255, (1, 48, 48, 3)).astype(np.float32))
    irr, psnr, ssim = imaging.simulate(specs, lens, rad, cfg)
    assert np.isfinite(np.asarray(irr)).all()
    assert np.isfinite(float(psnr[0])) and np.isfinite(float(ssim[0]))
