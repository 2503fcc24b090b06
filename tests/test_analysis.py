"""Monte-Carlo tolerancing, sensitivity tables, and MTF (analysis.py).

TPU-build superset — no reference counterpart; tests pin the statistical
semantics, engine parity, and differentiability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchoptics_tpu import analysis, simulator as sim, zoo
from torchoptics_tpu.ops import psf as psf_mod

CFG = sim.SimulatorConfig(
    n_sampled_fields=3, n_pupil_rings=4, pupil_sampling="circular",
    n_ray_aiming_iter=1, wavelengths=(459.0, 520.0, 640.0))


def test_tile_population_shapes():
    specs, lens = zoo.build("cooke")
    specs_n, lens_n = analysis.tile_population(specs, lens, 5)
    assert len(lens_n) == 5 and len(specs_n) == 5
    np.testing.assert_array_equal(np.asarray(lens_n.c),
                                  np.tile(np.asarray(lens.c), (5, 1)))
    with pytest.raises(ValueError, match="single design"):
        analysis.tile_population(specs_n, lens_n, 2)


def test_zero_tolerance_is_nominal():
    specs, lens = zoo.build("cooke")
    out = analysis.tolerance_analysis(
        specs, lens, CFG, analysis.Tolerances(), n_samples=4,
        key=jax.random.key(0))
    rms = np.asarray(out["rms"])
    np.testing.assert_allclose(rms, rms[0], rtol=0, atol=0)
    assert float(out["std"]) == 0.0


def test_perturbation_statistics_and_yield():
    specs, lens = zoo.build("cooke")
    tol = analysis.Tolerances(c=2e-4, t=0.02, nd=1e-3, v=0.2)
    out = analysis.tolerance_analysis(
        specs, lens, CFG, tol, n_samples=64, key=jax.random.key(1),
        rms_threshold=None, percentiles=(50.0, 90.0))
    rms = np.asarray(out["rms"])
    assert rms.shape == (64,)
    assert np.isfinite(rms).all()
    assert float(out["std"]) > 0.0
    # percentiles are ordered and bracket the mean region
    assert float(out["p50"]) <= float(out["p90"])
    # sample 0 is exactly the nominal design
    nom = analysis.tolerance_analysis(
        specs, lens, CFG, analysis.Tolerances(), n_samples=2,
        key=jax.random.key(2))["nominal_rms"]
    np.testing.assert_allclose(float(out["nominal_rms"]), float(nom),
                               rtol=1e-6)
    # yield is monotone in the threshold
    y_lo = analysis.tolerance_analysis(
        specs, lens, CFG, tol, n_samples=64, key=jax.random.key(1),
        rms_threshold=float(out["p50"]))["yield_fraction"]
    y_hi = analysis.tolerance_analysis(
        specs, lens, CFG, tol, n_samples=64, key=jax.random.key(1),
        rms_threshold=float(out["p90"]))["yield_fraction"]
    assert 0.0 <= float(y_lo) <= float(y_hi) <= 1.0
    assert abs(float(y_lo) - 0.5) < 0.15 and abs(float(y_hi) - 0.9) < 0.15


def test_uniform_distribution_and_jit():
    specs, lens = zoo.build("cooke")
    tol = analysis.Tolerances(t=0.01, distribution="uniform")
    run = jax.jit(lambda k: analysis.tolerance_analysis(
        specs, lens, CFG, tol, n_samples=8, key=k))
    out = run(jax.random.key(0))
    assert np.isfinite(np.asarray(out["rms"])).all()
    with pytest.raises(ValueError, match="distribution"):
        analysis.Tolerances(distribution="lognormal")


def test_pallas_engine_matches_xla():
    specs, lens = zoo.build("cooke")
    tol = analysis.Tolerances(c=2e-4, t=0.02)
    cfg_p = sim.SimulatorConfig(
        n_sampled_fields=3, n_pupil_rings=4, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(459.0, 520.0, 640.0),
        trace_engine="pallas")
    with pltpu.force_tpu_interpret_mode():
        out_p = analysis.tolerance_analysis(
            specs, lens, cfg_p, tol, n_samples=6, key=jax.random.key(3))
    out_x = analysis.tolerance_analysis(
        specs, lens, CFG, tol, n_samples=6, key=jax.random.key(3))
    np.testing.assert_allclose(np.asarray(out_p["rms"]),
                               np.asarray(out_x["rms"]), rtol=2e-4,
                               atol=1e-6)


def test_refocus_compensated_tolerancing():
    """VERDICT r4 #3: compensator='refocus' re-focuses every perturbed
    sample before scoring; with the radial metric (refocus's own
    objective) the compensated RMS is <= uncompensated per sample, the
    yield improves, and the whole thing stays jittable."""
    import dataclasses
    specs, lens = zoo.build("tessar")
    cfg = dataclasses.replace(CFG, spot_metric="xy")
    tol = analysis.Tolerances(c=3e-4, t=0.03)
    run = jax.jit(lambda comp: (lambda k: analysis.tolerance_analysis(
        specs, lens, cfg, tol, n_samples=32, key=k,
        compensator=comp))(jax.random.key(5)), static_argnums=0)
    out_u = run(None)
    out_c = run("refocus")
    rms_u = np.asarray(out_u["rms"])
    rms_c = np.asarray(out_c["rms"])
    assert out_c["refocus_delta"].shape == (32,)
    assert np.isfinite(rms_c).all()
    # refocus minimizes the POOLED sum of squared radial deviations; the
    # score is the mean over fields of per-field RMS — almost but not
    # exactly the same functional, so allow a 1e-4 mm (sub-noise) slack on
    # the per-sample inequality (observed worst gap 4.6e-5 on this seed).
    assert np.all(rms_c <= rms_u + 1e-4), (rms_c - rms_u).max()
    # and the compensation must actually matter on thickness perturbations
    assert float(np.mean(rms_c[1:])) < float(np.mean(rms_u[1:]))
    with pytest.raises(ValueError, match="compensator"):
        analysis.tolerance_analysis(specs, lens, cfg, tol, n_samples=2,
                                    key=jax.random.key(0),
                                    compensator="tilt")


def test_refocus_follows_spot_metric():
    """Round-5 regression: a compensator optimizing a different functional
    than the score is WORSE than no compensator. The y-refined double-Gauss
    is astigmatic (rms_xy ≈ 23× rms_y, RESULTS.md), so its radial best
    focus sits ~0.4 mm from the y-metric best focus — refocusing it
    radially blew its y-only score up 9× before refocus followed
    config.spot_metric."""
    import dataclasses
    specs, lens = zoo.build("double_gauss")
    cfg_y = CFG                                   # spot_metric='y' default
    cfg_xy = dataclasses.replace(CFG, spot_metric="xy")
    lens_y, d_y = analysis.refocus(specs, lens, cfg_y)
    _, d_xy = analysis.refocus(specs, lens, cfg_xy)
    # y-metric focus stays near the shipped (y-refined) focus; the radial
    # focus is a large move (the tangential/sagittal split)
    assert abs(float(d_y[0])) < 0.1, float(d_y[0])
    assert abs(float(d_xy[0])) > 0.15, float(d_xy[0])
    # compensating must not worsen the score it is paired with
    rms0 = float(analysis._per_sample_rms(specs, lens, cfg_y)[0])
    rms1 = float(analysis._per_sample_rms(specs, lens_y, cfg_y)[0])
    assert rms1 <= rms0 + 2e-4, (rms0, rms1)


def test_through_focus_mtf_peak_tracks_defocus():
    """VERDICT r4 #8 (stretch): a +0.4 mm image-distance perturbation moves
    the through-focus MTF peak by exactly −0.4 mm relative to the nominal
    design's peak (the cooke's own MTF-best focus sits ~+0.2 mm from the
    zoo image plane — spherical focal shift at f/2 — so the ABSOLUTE peak
    position is not ±0.4; the relative displacement is the invariant).
    PSF window sized well past the defocus blur (65 px × 8 µm = 520 µm ≫
    200 µm blur) so clipped-PSF renormalization cannot fake modulation."""
    specs, lens = zoo.build("cooke")
    lens0 = lens.replace(t=lens.t.at[0, -1].add(0.4))     # defocused
    cfg = sim.SimulatorConfig(
        n_sampled_fields=2, n_pupil_rings=8, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(520.0,),
        psf_shape=(65, 65), psf_abs_pixel_size=8e-3)
    d_nom = np.linspace(-0.4, 0.4, 17)
    d_pert = np.linspace(-0.8, 0.0, 17)
    run = jax.jit(lambda l, d: analysis.through_focus_mtf(specs, l, cfg, d),
                  static_argnums=())
    out_n = analysis.through_focus_mtf(specs, lens, cfg, d_nom)
    out_p = jax.jit(lambda l: analysis.through_focus_mtf(
        specs, l, cfg, d_pert))(lens0)
    assert out_p["mtf_t"].shape == (17, 2, 1, 33)
    freqs = np.asarray(out_p["freqs_t"])
    k = int(np.argmin(np.abs(freqs - 10.0)))              # ~10 cyc/mm
    m_n = np.asarray(out_n["mtf_t"][:, 0, 0, k])
    m_p = np.asarray(out_p["mtf_t"][:, 0, 0, k])
    peak_n = d_nom[int(np.argmax(m_n))]
    peak_p = d_pert[int(np.argmax(m_p))]
    step = d_nom[1] - d_nom[0]
    assert abs((peak_p - peak_n) + 0.4) <= 1.5 * step, (peak_n, peak_p)
    # modulation is a genuine curve: the peak beats the sweep ends
    assert m_p.max() > m_p[0] + 0.05
    # and at matched focus offsets the two scans agree (same physics,
    # shifted parameterization): δ_pert = δ_nom − 0.4
    np.testing.assert_allclose(m_p, m_n, atol=0.05)


def test_sensitivities_match_finite_differences():
    specs, lens = zoo.build("cooke")
    g = analysis.sensitivities(specs, lens, CFG)
    assert set(g) == {"c", "t", "nd", "v"}
    for k, a in g.items():
        assert np.isfinite(np.asarray(a)).all(), k
    # padding surfaces carry zero sensitivity
    mask = lens.structure.mask[0]
    assert np.all(np.asarray(g["c"])[0, ~mask] == 0.0)
    # central difference on the most sensitive curvature
    gc = np.asarray(g["c"])[0]
    j = int(np.argmax(np.abs(gc)))
    eps = 1e-5

    def rms_at(cj):
        c = lens.c.at[0, j].set(cj)
        return float(analysis._per_sample_rms(
            specs, lens.replace(c=c), CFG)[0])

    fd = (rms_at(float(lens.c[0, j]) + eps)
          - rms_at(float(lens.c[0, j]) - eps)) / (2 * eps)
    # f32 trace: the FD quotient itself carries ~0.3% noise at this eps
    np.testing.assert_allclose(gc[j], fd, rtol=1e-2)


def test_refocus_recovers_defocus():
    """The closed-form least-squares focus solve undoes a known image-plane
    shift and is idempotent to ray-level precision."""
    specs, lens = zoo.build("cooke")
    cfg = sim.SimulatorConfig(
        n_sampled_fields=3, n_pupil_rings=6, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(520.0,))
    lens_foc, d0 = analysis.refocus(specs, lens, cfg)
    # the shipped design is already near best focus
    assert abs(float(d0[0])) < 0.2
    shifted = lens_foc.replace(t=lens_foc.t.at[0, -1].add(0.5))
    back, d = analysis.refocus(specs, shifted, cfg)
    np.testing.assert_allclose(float(d[0]), -0.5, atol=0.03)
    _, d2 = analysis.refocus(specs, back, cfg)
    assert abs(float(d2[0])) < 5e-3
    # and it reduces the spot size
    rms_shift = float(analysis._per_sample_rms(specs, shifted, cfg)[0])
    rms_back = float(analysis._per_sample_rms(specs, back, cfg)[0])
    assert rms_back < 0.5 * rms_shift
    # differentiable wrt curvatures
    g = jax.grad(lambda c: jnp.sum(analysis.refocus(
        specs, lens.replace(c=c), cfg)[1]))(lens.c)
    assert np.isfinite(np.asarray(g)).all()


def test_wavefront_rms_objective_optimizes():
    """Direct wavefront optimization — the wave-optics objective the
    reference fundamentally lacks: a defocus-perturbed triplet recovers
    within a few Adam steps on d(wavefront RMS)/d(c, t)."""
    from torchoptics_tpu import trace

    specs, lens = zoo.build("cooke")
    lens0 = lens.replace(t=lens.t.at[0, -1].add(0.4))  # defocused
    n = 9
    g = np.linspace(-0.85, 0.85, n)
    X, Y = np.meshgrid(g, g, indexing="xy")
    xy = (jnp.asarray(X.ravel()[None, None, :, None], jnp.float32),
          jnp.asarray(Y.ravel()[None, None, :, None], jnp.float32))
    cfg = trace.TraceConfig(mode="circular", n_rays=(2, 2),
                            rel_fields=(0.0, 0.7), wavelengths=(520.0,),
                            n_ray_aiming_iter=0, engine="scan")

    from torchoptics_tpu import optimize as opt_mod

    def wf_loss(specs_, lens_, config_, g_, catalog_g_, key_):
        # remove piston+tilt only: defocus must be corrected by the lens
        w = analysis.wavefront_rms(specs_, lens_, cfg, xy=xy, remove_j=3)
        return w, {"wavefront_rms": w}

    sim_cfg = sim.SimulatorConfig(trace_engine="scan")
    opt = opt_mod.LensOptimizer(specs, sim_cfg, learning_rate=5e-3,
                                add_bfl=False, trainable=("c", "t"),
                                efl_target=float(lens.efl[0]), loss_fn=wf_loss)
    state = opt.init(lens0)
    v0 = float(opt.loss(state.params)[0])
    for _ in range(15):
        state, v, _ = opt.step(state, None)
    v1 = float(opt.loss(state.params)[0])
    assert np.isfinite(v0) and np.isfinite(v1)
    assert v1 < 0.6 * v0, (v0, v1)


def test_mtf_basic_properties():
    # A narrow PSF transfers more contrast than a broad one.
    n = 33
    yy, xx = np.meshgrid(np.arange(n) - n // 2, np.arange(n) - n // 2,
                         indexing="ij")

    def gauss(sigma):
        p = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma ** 2))
        return jnp.asarray(p / p.sum(), jnp.float32)

    out_narrow = psf_mod.compute_mtf(gauss(0.7), pixel_size=4e-3)
    out_broad = psf_mod.compute_mtf(gauss(3.0), pixel_size=4e-3)
    for out in (out_narrow, out_broad):
        assert out["mtf_t"].shape == (n // 2 + 1,)
        np.testing.assert_allclose(float(out["mtf_t"][0]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["mtf_t"]),
                                   np.asarray(out["mtf_s"]), atol=1e-6)
    assert float(out_narrow["mtf_t"][5]) > float(out_broad["mtf_t"][5])
    # frequency axis: rfftfreq of the 33-sample grid at 4 um pitch
    np.testing.assert_allclose(float(out_narrow["freqs_t"][-1]),
                               (n // 2) / (n * 4e-3), rtol=1e-6)
    # analytic check: MTF of a sampled Gaussian PSF is Gaussian,
    # exp(-2 (pi f sigma_mm)^2)
    sigma_mm = 3.0 * 4e-3
    f = np.asarray(out_broad["freqs_t"])
    expected = np.exp(-2 * (np.pi * f * sigma_mm) ** 2)
    np.testing.assert_allclose(np.asarray(out_broad["mtf_t"]), expected,
                               atol=5e-3)


def test_diffraction_mtf_matches_circular_aperture_theory():
    """Unaberrated circular pupil: diffraction MTF equals the analytic
    autocorrelation 2/π·(acos s − s√(1−s²)) — pins the OPD→PSF→MTF chain
    end to end through a real (diffraction-limited) traced lens."""
    from torchoptics_tpu import trace

    specs, lens = zoo.build("double_gauss_asph")   # Strehl 0.99 on axis
    cfg = trace.TraceConfig(mode="circular", n_rays=(2, 2),
                            rel_fields=(0.0,), wavelengths=(520.0,),
                            n_ray_aiming_iter=0)
    out = analysis.diffraction_mtf(specs, lens, cfg, grid_n=32, pad=4)
    rel = np.asarray(out["rel_freqs"])
    mtf = np.asarray(out["mtf_t"][0, 0])
    s = np.clip(rel, 0, 1)
    ideal = 2 / np.pi * (np.arccos(s) - s * np.sqrt(1 - s ** 2))
    sel = rel < 0.85
    # finite 32² pupil sampling broadens the autocorrelation by ~1 cell
    assert np.max(np.abs(mtf[sel] - ideal[sel])) < 0.06, \
        np.max(np.abs(mtf[sel] - ideal[sel]))
    # beyond cutoff: nothing transfers
    assert np.all(mtf[rel > 1.2] < 0.02)
    # cutoff scale: ~962 cyc/mm at 520nm f/2
    c = float(out["cutoff_cyc_mm"][0, 0])
    assert 700 < c < 1200, c
    # the geometric MTF overestimates near the diffraction limit
    cfg_img = sim.SimulatorConfig(
        n_sampled_fields=1, n_pupil_rings=6, pupil_sampling="circular",
        n_ray_aiming_iter=0, wavelengths=(520.0,),
        psf_shape=(33, 33), psf_abs_pixel_size=4e-3)
    geo = analysis.field_mtf(specs, lens, cfg_img)
    i = int(np.argmin(np.abs(np.asarray(geo["freqs_t"]) - 0.5 * c)))
    j = int(np.argmin(np.abs(rel - 0.5)))
    assert float(geo["mtf_t"][0, 0, i]) > mtf[j]


def test_field_mtf_end_to_end():
    specs, lens = zoo.build("cooke")
    cfg = sim.SimulatorConfig(
        n_sampled_fields=3, n_pupil_rings=6, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(459.0, 520.0, 640.0),
        psf_shape=(33, 33), psf_abs_pixel_size=4e-3)
    out = analysis.field_mtf(specs, lens, cfg)
    assert out["mtf_t"].shape == (3, 3, 17)
    m = np.asarray(out["mtf_t"])
    assert np.isfinite(m).all()
    np.testing.assert_allclose(m[..., 0], 1.0, rtol=1e-5)
    assert (m <= 1.0 + 1e-5).all()

    # differentiable: gradient of mid-frequency tangential MTF wrt c
    def obj(c):
        o = analysis.field_mtf(specs, lens.replace(c=c), cfg)
        return jnp.mean(o["mtf_t"][..., 4])

    g = jax.grad(obj)(lens.c)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0
