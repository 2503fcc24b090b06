"""Trace engine: physics invariants, failure masks, engines, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import Lens, Specs, Structure, metrics, trace, zoo
from torchoptics_tpu.ops import surfaces as surf


def _flat_window():
    """A flat glass window: rays must pass through undeviated in direction."""
    st = Structure((0,), ("GA",))
    lens = Lens(st, jnp.asarray([0.0, 0.0]), jnp.asarray([2.0, 5.0]),
                jnp.asarray([1.5]), jnp.asarray([50.0]))
    specs = Specs(st, jnp.asarray([2.0]), jnp.asarray([0.3]))
    return specs, lens


def test_flat_window_preserves_direction():
    specs, lens = _flat_window()
    cfg = trace.TraceConfig(mode="circular", n_rays=(3, 4),
                            rel_fields=(0.0, 1.0), wavelengths=("d",))
    res = trace.trace_rays(specs, lens, cfg)
    assert bool(res.ray_ok.all())
    # direction cosines after a flat window equal the launch cosines
    np.testing.assert_allclose(np.asarray(res.cy[:, 1]).max(),
                               np.sin(0.3), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.cx), 0.0, atol=1e-6)


def test_direction_cosines_unit_norm():
    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(6, 6),
                            rel_fields=(0.0, 0.707, 1.0),
                            wavelengths=("C", "d", "F"))
    res = trace.trace_rays(specs, lens, cfg)
    cz2 = 1.0 - np.asarray(res.cx) ** 2 - np.asarray(res.cy) ** 2
    assert (cz2[np.asarray(res.ray_ok)] > 0).all()


def test_on_axis_symmetry():
    """On-axis field through a rotationally symmetric lens: the spot must be
    rotationally symmetric (x<->y exchange under 90 deg pupil rotation)."""
    specs, lens = zoo.build("singlet")
    x = jnp.asarray([0.5, 0.0]).reshape(1, 1, -1, 1)
    y = jnp.asarray([0.0, 0.5]).reshape(1, 1, -1, 1)
    cfg = trace.TraceConfig(mode="tee", rel_fields=(0.0,), wavelengths=("d",))
    res = trace.trace_rays(specs, lens, cfg, xy=(x, y))
    np.testing.assert_allclose(float(res.x[0, 0, 0, 0]),
                               float(res.y[0, 0, 1, 0]), rtol=1e-5)
    np.testing.assert_allclose(float(res.y[0, 0, 0, 0]), 0.0, atol=1e-6)


def test_miss_failure_mask():
    """Rays aimed far outside a strongly curved surface must fail, not NaN."""
    st = Structure((0,), ("GA",))
    lens = Lens(st, jnp.asarray([0.9, 0.0]), jnp.asarray([0.5, 2.0]),
                jnp.asarray([1.5]), jnp.asarray([50.0]))
    specs = Specs(st, jnp.asarray([4.0]), jnp.asarray([0.0]))
    # sphere radius 1/0.9 ~ 1.1 -> pupil height 2 misses
    cfg = trace.TraceConfig(mode="meridional_uniform", n_rays=(9,),
                            rel_fields=(0.0,), wavelengths=("d",))
    res = trace.trace_rays(specs, lens, cfg)
    ok = np.asarray(res.ray_ok)[0, 0, :, 0]
    assert not ok.all() and ok.any()
    assert np.isfinite(np.asarray(res.x)).all()
    assert np.isfinite(np.asarray(res.y)).all()


def test_tir_failure_mask():
    """Steep incidence from dense to rare medium must trip the TIR mask."""
    st = Structure((0,), ("GA",))
    # strongly curved exit surface from n=1.9 glass
    lens = Lens(st, jnp.asarray([0.0, 0.45]), jnp.asarray([1.0, 2.0]),
                jnp.asarray([1.9]), jnp.asarray([40.0]))
    specs = Specs(st, jnp.asarray([4.0]), jnp.asarray([0.0]))
    cfg = trace.TraceConfig(mode="meridional_uniform", n_rays=(17,),
                            rel_fields=(0.0,), wavelengths=("d",))
    res = trace.trace_rays(specs, lens, cfg)
    ok = np.asarray(res.ray_ok)[0, 0, :, 0]
    assert not ok.all()
    assert np.isfinite(np.asarray(res.y)).all()


def test_failed_rays_zero_gradient():
    """Gradients through failed lanes must be exactly zero (reset_bad_rays
    semantics, reference ray_tracing_lite.py:574-591)."""
    st = Structure((0,), ("GA",))
    specs = Specs(st, jnp.asarray([4.0]), jnp.asarray([0.0]))
    cfg = trace.TraceConfig(mode="meridional_uniform", n_rays=(9,),
                            rel_fields=(0.0,), wavelengths=("d",))

    def loss(c_flat):
        lens = Lens(st, c_flat, jnp.asarray([0.5, 2.0]),
                    jnp.asarray([1.5]), jnp.asarray([50.0]))
        res = trace.trace_rays(specs, lens, cfg)
        # sum of coordinates of FAILED rays only: must not move with c
        bad = ~res.ray_ok
        return jnp.sum(jnp.where(bad, res.x ** 2 + res.y ** 2, 0.0))

    g = jax.grad(loss)(jnp.asarray([0.9, 0.0]))
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)


def test_scan_engine_matches_unroll():
    specs, lens = zoo.build("tessar")
    kw = dict(mode="circular", n_rays=(6, 6), rel_fields=(0.0, 1.0),
              wavelengths=("C", "d", "F"))
    res_u = trace.trace_rays(specs, lens, trace.TraceConfig(engine="unroll", **kw))
    res_s = trace.trace_rays(specs, lens, trace.TraceConfig(engine="scan", **kw))
    # identical math modulo f32 reassociation between the fused/unfused forms
    np.testing.assert_allclose(np.asarray(res_u.x), np.asarray(res_s.x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_u.y), np.asarray(res_s.y),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res_u.ray_ok),
                                  np.asarray(res_s.ray_ok))


def test_heterogeneous_batch_padding():
    """A padded batch (singlet + cooke) must reproduce each standalone trace."""
    st = Structure((0, 4), ("AGA", "GAGAAGA"))
    c = np.zeros((2, 7), np.float32)
    t = np.zeros((2, 7), np.float32)
    nd = np.ones((2, 7), np.float32)
    v = np.ones((2, 7), np.float32)
    for i, name in enumerate(("singlet", "cooke")):
        p = zoo.get_prescription(name)
        n = len(p["c"])
        c[i, :n] = p["c"]
        t[i, :n] = p["t"]
        gpos = [j for j, ch in enumerate(p["sequence"][0]) if ch == "G"]
        for gj, j in enumerate(gpos):
            nd[i, j] = p["nd"][gj]
            v[i, j] = p["v"][gj]
    lens = Lens(st, jnp.asarray(c), jnp.asarray(t), jnp.asarray(nd),
                jnp.asarray(v))
    epd = jnp.asarray([zoo.build("singlet")[0].epd[0],
                       zoo.build("cooke")[0].epd[0]])
    hfov = jnp.deg2rad(jnp.asarray([25.0, 25.0]))
    specs = Specs(st, epd, hfov)
    cfg = trace.TraceConfig(mode="circular", n_rays=(5, 5),
                            rel_fields=(0.0, 1.0), wavelengths=("d",))
    res = trace.trace_rays(specs, lens, cfg)

    for i, name in enumerate(("singlet", "cooke")):
        specs1, lens1 = zoo.build(name)
        res1 = trace.trace_rays(specs1, lens1, cfg)
        np.testing.assert_allclose(np.asarray(res.y)[i], np.asarray(res1.y)[0],
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_skew_random_reproducible_and_in_pupil():
    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="skew_random", n_rays=(4, 4),
                            rel_fields=(0.0,), wavelengths=("d",))
    key = jax.random.PRNGKey(7)
    r1 = trace.trace_rays(specs, lens, cfg, key=key)
    r2 = trace.trace_rays(specs, lens, cfg, key=key)
    np.testing.assert_array_equal(np.asarray(r1.y), np.asarray(r2.y))
    r3 = trace.trace_rays(specs, lens, cfg, key=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(r1.y), np.asarray(r3.y))


def test_double_precision():
    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(4, 4),
                            rel_fields=(0.0, 1.0), wavelengths=("d",),
                            double_precision=jax.config.jax_enable_x64)
    res = trace.trace_rays(specs, lens, cfg)
    assert np.isfinite(np.asarray(res.y)).all()


def test_jit_trace_end_to_end():
    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(6, 6),
                            rel_fields=(0.0, 0.707, 1.0),
                            wavelengths=("C", "d", "F"), n_ray_aiming_iter=1)

    @jax.jit
    def f(lens):
        res = trace.trace_rays(specs, lens, cfg)
        return metrics.compute_rms2d(res.x, res.y, res.ray_ok)

    rms1 = f(lens)
    rms2 = f(lens.replace(c=lens.c * 1.01))
    assert np.isfinite(np.asarray(rms1)).all()
    assert not np.allclose(np.asarray(rms1), np.asarray(rms2))


def test_grad_finite_differences():
    """check_grads on the full trace+rms chain w.r.t. curvature/thickness."""
    specs, lens = zoo.build("singlet")
    cfg = trace.TraceConfig(mode="circular", n_rays=(4, 4),
                            rel_fields=(0.0, 1.0), wavelengths=("d",))

    def loss(c, t):
        l = lens.replace(c=c, t=t)
        res = trace.trace_rays(specs, l, cfg)
        return metrics.compute_rms2d(res.x, res.y, res.ray_ok)[0]

    from jax.test_util import check_grads
    check_grads(loss, (lens.c, lens.t), order=1, modes=("rev",),
                rtol=2e-2, atol=1e-3)


def test_vignetting_through_tracer():
    """A vignetting function shrinks the effective pupil: marginal rays move
    inward, and the trace must consume specs.vig_* through vig_fn."""
    specs, lens = zoo.build("cooke")
    specs = Specs(specs.structure, specs.epd, specs.hfov,
                  vig_up=jnp.asarray([0.3]), vig_down=jnp.asarray([0.1]),
                  vig_x=jnp.asarray([0.2]))

    # reference-style vig_fn(fields, coeff): constant over field
    vig_fn = lambda fields, coeff: coeff

    kw = dict(mode="meridional_uniform", n_rays=(9,), rel_fields=(0.0,),
              wavelengths=("d",))
    res_plain = trace.trace_rays(specs, lens, trace.TraceConfig(**kw))
    res_vig = trace.trace_rays(specs, lens,
                               trace.TraceConfig(vig_fn=vig_fn, **kw))
    # the vignetted pupil is smaller and shifted: spot coordinates change,
    # and the (previously on-axis) central ray is now decentered
    y_plain = np.asarray(res_plain.y)[0, 0, :, 0]
    y_vig = np.asarray(res_vig.y)[0, 0, :, 0]
    assert np.abs(y_vig - y_plain).max() > 1e-4
    assert abs(y_plain[4]) < 1e-7 and abs(y_vig[4]) > 1e-4
    # use_vig=False must bypass it
    res_off = trace.trace_rays(specs, lens,
                               trace.TraceConfig(vig_fn=vig_fn, **kw),
                               use_vig=False)
    np.testing.assert_allclose(np.asarray(res_off.y), np.asarray(res_plain.y),
                               rtol=1e-6)


def test_ray_aiming_paraxial_mode():
    """'paraxial' stop-radius mode (magnification * EPD/2) must run and give
    aiming corrections comparable to 'real' mode."""
    specs, lens = zoo.build("cooke")
    kw = dict(mode="circular", n_rays=(5, 5), rel_fields=(0.0, 1.0),
              wavelengths=("d",), n_ray_aiming_iter=1)
    res_real = trace.trace_rays(specs, lens, trace.TraceConfig(
        ray_aiming_mode="real", **kw))
    res_par = trace.trace_rays(specs, lens, trace.TraceConfig(
        ray_aiming_mode="paraxial", **kw))
    assert np.isfinite(np.asarray(res_par.y)).all()
    # both modes aim at the same stop; results agree loosely
    d = np.abs(np.asarray(res_par.y) - np.asarray(res_real.y)).max()
    assert d < 0.5


def test_ray_aiming_bad_mode_raises():
    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(3, 3),
                            rel_fields=(0.0,), wavelengths=("d",),
                            n_ray_aiming_iter=1, ray_aiming_mode="bogus")
    with pytest.raises(ValueError):
        trace.trace_rays(specs, lens, cfg)
