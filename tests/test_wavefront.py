"""Wavefront/OPD, Zernike, Strehl, diffraction PSF (ops.wavefront).

TPU-build superset — the reference is purely geometric. Tests pin:
Noll indexing, exact Zernike-fit recovery, engine parity of the "dist"
aggregate, exact meridional/rotational symmetry of on-axis OPD, the
transverse-ray/OPD-slope consistency relation (wave and ray pictures of
the same trace agree), Strehl semantics (Maréchal), and the Airy pattern
from the diffraction PSF.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import trace, zoo
from torchoptics_tpu.ops import wavefront as wf

LAM = 520e-6  # mm


def _grid(n, extent=0.9):
    g = np.linspace(-extent, extent, n)
    X, Y = np.meshgrid(g, g, indexing="xy")
    xr = jnp.asarray(X.ravel()[None, None, :, None], jnp.float32)
    yr = jnp.asarray(Y.ravel()[None, None, :, None], jnp.float32)
    return g, X, Y, xr, yr


CFG0 = trace.TraceConfig(mode="circular", n_rays=(2, 2), rel_fields=(0.0,),
                         wavelengths=(LAM * 1e6,), n_ray_aiming_iter=0)


def test_noll_indexing():
    expected = {1: (0, 0), 2: (1, 1), 3: (1, -1), 4: (2, 0), 5: (2, -2),
                6: (2, 2), 7: (3, -1), 8: (3, 1), 9: (3, -3), 10: (3, 3),
                11: (4, 0)}
    for j, nm in expected.items():
        assert wf._zernike_nm(j) == nm, j


def test_zernike_fit_recovers_exact_coefficients():
    rng = np.random.default_rng(0)
    _, X, Y, xr, yr = _grid(17)
    sel = (X ** 2 + Y ** 2) <= 1.0
    coeffs = jnp.asarray(rng.normal(size=11).astype(np.float32))
    basis = wf.zernike_basis(11, xr[0, 0, :, 0], yr[0, 0, :, 0])
    opd = basis @ coeffs
    ok = jnp.asarray(sel.ravel())
    fit = wf.zernike_fit(opd, xr[0, 0, :, 0], yr[0, 0, :, 0], ok, j_max=11)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(coeffs),
                               rtol=1e-4, atol=1e-5)


def test_dist_aggregate_engine_parity():
    specs, lens = zoo.build("cooke")
    cfg_u = trace.TraceConfig(mode="circular", n_rays=(6, 6),
                              rel_fields=(0.0, 1.0), wavelengths=(520.0,),
                              n_ray_aiming_iter=0)
    cfg_s = trace.TraceConfig(mode="circular", n_rays=(6, 6),
                              rel_fields=(0.0, 1.0), wavelengths=(520.0,),
                              n_ray_aiming_iter=0, engine="scan")
    d_u = trace.trace_rays(specs, lens, cfg_u,
                           aggregate=("dist",)).stacks["dist"]
    d_s = trace.trace_rays(specs, lens, cfg_s,
                           aggregate=("dist",)).stacks["dist"]
    S = lens.c.shape[1]
    assert d_u.shape[0] == S + 1          # final image leg appended
    np.testing.assert_allclose(np.asarray(d_u[:S]), np.asarray(d_s[:S]),
                               rtol=1e-5, atol=1e-6)


def test_opd_symmetry_on_axis():
    """A rotationally symmetric system on axis: OPD(x,y) = OPD(-x,y) =
    OPD(y,x) exactly (same arithmetic on mirrored lanes)."""
    specs, lens = zoo.build("double_gauss")
    n = 9
    _, X, Y, xr, yr = _grid(n)
    out = wf.opd_map(specs, lens, CFG0, xy=(xr, yr))
    W = np.asarray(out["opd"][0, 0, :, 0]).reshape(n, n)
    ok = np.asarray(out["ok"][0, 0, :, 0]).reshape(n, n)
    m = ok & ok[:, ::-1]
    np.testing.assert_allclose(W[m], W[:, ::-1][m], atol=1e-9)
    m2 = ok & ok.T
    np.testing.assert_allclose(W[m2], W.T[m2], atol=1e-9)
    # on-axis wavefront of the refined f/2 double Gauss: sub-wave
    assert float(np.std(W[ok])) < 1.0 * LAM


def test_transverse_aberration_matches_opd_slope():
    """The wave and ray pictures agree: ray intercept offsets from the
    chief image point equal (R / r_xp) ∂OPD/∂ρ with r_xp the paraxial
    exit-pupil radius — pinning OPL assembly, reference sphere, exit-pupil
    solve, and pupil magnification together."""
    specs, lens = zoo.build("double_gauss")
    n = 21
    g, X, Y, xr, yr = _grid(n, extent=0.85)
    out = wf.opd_map(specs, lens, CFG0, xy=(xr, yr))
    res = trace.trace_rays(specs, lens, CFG0, xy=(xr, yr))
    W = np.asarray(out["opd"][0, 0, :, 0]).reshape(n, n)
    ok = np.asarray(out["ok"][0, 0, :, 0]).reshape(n, n)
    q = (np.asarray(res.y[0, 0, :, 0]).reshape(n, n)
         - float(out["y_img"][0, 0, 0]))
    dWdy = np.gradient(W, g, axis=0)
    R = abs(float(wf.exit_pupil_distance(lens)[0]))
    r_xp = float(specs.epd[0]) / 2 * float(wf.pupil_magnification(lens)[0])
    pred = (R / r_xp) * dWdy
    m = ok & (np.abs(X) < 0.6) & (np.abs(Y) < 0.6)
    scale = np.abs(q[m]).max()
    # central-difference gradient + paraxial pupil magnification: few-%
    assert np.median(np.abs(pred - q)[m]) < 0.08 * scale


def test_strehl_marechal():
    rng = np.random.default_rng(1)
    opd0 = jnp.zeros((500,), jnp.float32)
    ok = jnp.ones((500,), bool)
    np.testing.assert_allclose(float(wf.strehl_ratio(opd0, ok, LAM)), 1.0,
                               rtol=1e-6)
    sigma = LAM / 30.0
    opd = jnp.asarray(rng.normal(scale=sigma, size=500).astype(np.float32))
    opd = opd - jnp.mean(opd)
    s = float(wf.strehl_ratio(opd, ok, LAM))
    expected = float(np.exp(-(2 * np.pi * sigma / LAM) ** 2))
    np.testing.assert_allclose(s, expected, rtol=0.05)


def test_flagship_is_diffraction_limited_on_axis():
    """The aspherized flagship (RESULTS.md: 1.1 µm geometric RMS at f/2)
    must hold up in the wave picture: Strehl > 0.9 on axis after removing
    piston/tilt/defocus."""
    specs, lens = zoo.build("double_gauss_asph")
    n = 15
    _, X, Y, xr, yr = _grid(n)
    out = wf.opd_map(specs, lens, CFG0, xy=(xr, yr))
    opd = out["opd"][0, 0, :, 0]
    ok = out["ok"][0, 0, :, 0] & jnp.asarray(
        ((X ** 2 + Y ** 2) <= 1.0).ravel())
    cz = wf.zernike_fit(opd, xr[0, 0, :, 0], yr[0, 0, :, 0], ok, j_max=4)
    low = wf.zernike_basis(4, xr[0, 0, :, 0], yr[0, 0, :, 0]) @ cz
    s_asph = float(wf.strehl_ratio(jnp.where(ok, opd - low, 0.0), ok, LAM))
    assert s_asph > 0.9, s_asph

    # and it beats its spherical parent
    specs_p, lens_p = zoo.build("double_gauss")
    out_p = wf.opd_map(specs_p, lens_p, CFG0, xy=(xr, yr))
    opd_p = out_p["opd"][0, 0, :, 0]
    ok_p = out_p["ok"][0, 0, :, 0] & jnp.asarray(
        ((X ** 2 + Y ** 2) <= 1.0).ravel())
    cz_p = wf.zernike_fit(opd_p, xr[0, 0, :, 0], yr[0, 0, :, 0], ok_p,
                          j_max=4)
    low_p = wf.zernike_basis(4, xr[0, 0, :, 0], yr[0, 0, :, 0]) @ cz_p
    s_sph = float(wf.strehl_ratio(jnp.where(ok_p, opd_p - low_p, 0.0),
                                  ok_p, LAM))
    assert s_asph > s_sph


def test_diffraction_psf_airy():
    n = 64
    g = np.linspace(-1, 1, n, endpoint=False) + 1.0 / n
    X, Y = np.meshgrid(g, g, indexing="xy")
    ok = jnp.asarray((X ** 2 + Y ** 2) <= 1.0)
    opd = jnp.zeros((n, n), jnp.float32)
    out = wf.diffraction_psf(opd, ok, LAM, pad=8)
    psf = np.asarray(out["psf"])
    coords = np.asarray(out["coords"])
    M = psf.shape[-1]
    # perfect wavefront: center pixel IS the Strehl = 1
    np.testing.assert_allclose(psf[M // 2, M // 2], 1.0, rtol=1e-5)
    assert psf.max() <= 1.0 + 1e-5
    # first Airy zero at 1.22 λ f/# along the axis
    row = psf[M // 2, M // 2:]
    c = coords[M // 2:]
    sel = (c > 0.6) & (c < 2.0)
    i_min = np.argmin(row[sel])
    first_zero = c[sel][i_min]
    np.testing.assert_allclose(first_zero, 1.22, atol=0.08)
    # aberration reduces the peak (center = Strehl < 1)
    opd_ab = jnp.asarray((0.15 * LAM) * (2 * (X ** 2 + Y ** 2) - 1),
                         jnp.float32)
    out_ab = wf.diffraction_psf(opd_ab, ok, LAM, pad=8)
    assert float(out_ab["psf"][M // 2, M // 2]) < 0.95


def test_pallas_engine_unsupported_configs_raise():
    """Round 5: engine='pallas' OPL dispatches ALL FOUR kernel families
    (single/batched × spherical/asphere — parity in
    tests/test_opl_fused.py); only fp64 still raises loudly."""
    import dataclasses
    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(4, 4),
                            rel_fields=(0.0,), wavelengths=(520.0,),
                            engine="pallas")
    cfg64 = dataclasses.replace(cfg, double_precision=True)
    with pytest.raises(NotImplementedError, match="double"):
        wf.optical_path_lengths(specs, lens, cfg64)


def test_opd_differentiable():
    """d(wavefront rms)/d(curvatures) is finite — usable as an objective."""
    specs, lens = zoo.build("cooke")
    n = 7
    _, X, Y, xr, yr = _grid(n)

    def wrms(c):
        out = wf.opd_map(specs, lens.replace(c=c), CFG0, xy=(xr, yr))
        opd = out["opd"][0, 0, :, 0]
        w = out["ok"][0, 0, :, 0].astype(opd.dtype)
        mean = jnp.sum(opd * w) / jnp.sum(w)
        return jnp.sqrt(jnp.sum(w * (opd - mean) ** 2) / jnp.sum(w))

    g = jax.grad(wrms)(lens.c)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0
