"""Fused asphere kernel vs the jnp Newton engine (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchoptics_tpu import metrics, trace, zoo
from torchoptics_tpu.models.structure import Lens, Structure
from torchoptics_tpu.ops import pallas_asphere as pa

# Interpret-mode kernel parity is exhaustive and multi-minute; the fast
# profile (pytest -m 'not slow') keeps kernel coverage via the unmarked
# fuzz tests in test_fuzz_engines.py.
pytestmark = pytest.mark.slow


def _asphere_cooke():
    p = zoo.get_prescription("cooke")
    st = Structure(tuple(p["stop_idx"]), tuple(p["sequence"]))
    kappa = np.zeros((1, 7), np.float32)
    asph = np.zeros((1, 7, 2), np.float32)
    kappa[0, 0] = -0.6
    kappa[0, 3] = 0.4
    asph[0, 0, 0] = 2e-5
    asph[0, 3, 0] = -1e-5
    asph[0, 5, 1] = 3e-8
    lens = Lens(st, jnp.asarray(p["c"]), jnp.asarray(p["t"]),
                jnp.asarray(p["nd"]), jnp.asarray(p["v"]),
                kappa=jnp.asarray(kappa), asph=jnp.asarray(asph))
    specs, _ = zoo.build("cooke")
    return specs, lens


CFG = trace.TraceConfig(mode="circular", n_rays=(6, 6),
                        rel_fields=(0.0, 0.707, 1.0),
                        wavelengths=(459.0, 520.0, 640.0))


def test_asphere_kernel_forward_matches_jnp():
    specs, lens = _asphere_cooke()
    res_ref = trace.trace_rays(specs, lens, CFG)
    with pltpu.force_tpu_interpret_mode():
        res_pal = pa.trace_rays_fused_asphere(specs, lens, CFG)
    ok_both = np.asarray(res_ref.ray_ok) & np.asarray(res_pal.ray_ok)
    assert ok_both.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(res_pal.ray_ok),
                                  np.asarray(res_ref.ray_ok))
    np.testing.assert_allclose(np.asarray(res_pal.x)[ok_both],
                               np.asarray(res_ref.x)[ok_both],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_pal.y)[ok_both],
                               np.asarray(res_ref.y)[ok_both],
                               rtol=1e-4, atol=1e-5)


def test_asphere_kernel_gradients_match_jnp():
    specs, lens = _asphere_cooke()

    def loss_ref(c, kappa, asph, t):
        l = lens.replace(c=c, kappa=kappa, asph=asph, t=t)
        r = trace.trace_rays(specs, l, CFG)
        return metrics.compute_rms2d(r.x, r.y, r.ray_ok)[0]

    def loss_pal(c, kappa, asph, t):
        l = lens.replace(c=c, kappa=kappa, asph=asph, t=t)
        r = pa.trace_rays_fused_asphere(specs, l, CFG)
        return metrics.compute_rms2d(r.x, r.y, r.ray_ok)[0]

    args = (lens.c, lens.kappa, lens.asph, lens.t)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_ref, g_pal, ("dc", "dkappa", "dasph", "dt")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                   err_msg=name)
        assert np.abs(b).max() > 0 or np.abs(a).max() == 0, name


def test_asphere_kernel_unsup_penalties_match():
    from torchoptics_tpu import simulator as sim
    specs, lens = _asphere_cooke()
    cfg = sim.SimulatorConfig(n_sampled_fields=3, n_pupil_rings=4,
                              pupil_sampling="circular", n_ray_aiming_iter=0,
                              wavelengths=(459.0, 520.0, 640.0))
    res = trace.trace_rays(specs, lens, cfg.trace_config(),
                           aggregate=trace.AGG_TORCH)
    n_seq = 7
    pen_ref = float(jnp.sum(
        (jnp.sum(res.stacks["theta_norm"], 0)
         + jnp.sum(res.stacks["theta_prime_norm"], 0)
         + jnp.sum(res.stacks["z_RELU"], 0)) / n_seq))
    with pltpu.force_tpu_interpret_mode():
        _, (pth, ptp, pz) = pa.trace_rays_fused_asphere(
            specs, lens, cfg.trace_config(), penalties=True)
    pen_pal = float((jnp.sum(pth) + jnp.sum(ptp) + jnp.sum(pz)) / n_seq)
    np.testing.assert_allclose(pen_pal, pen_ref, rtol=1e-4)


def test_asphere_kernel_zero_coeffs_matches_sphere_kernel():
    """kappa = asph = 0 must agree with the spherical fused kernel."""
    from torchoptics_tpu.ops import pallas_trace as pt
    specs, lens_sph = zoo.build("cooke")
    lens_asp = lens_sph.replace(kappa=jnp.zeros_like(lens_sph.c),
                                asph=jnp.zeros(lens_sph.c.shape + (2,)))
    with pltpu.force_tpu_interpret_mode():
        r_s = pt.trace_rays_fused(specs, lens_sph, CFG)
        r_a = pa.trace_rays_fused_asphere(specs, lens_asp, CFG)
    np.testing.assert_array_equal(np.asarray(r_a.ray_ok),
                                  np.asarray(r_s.ray_ok))
    np.testing.assert_allclose(np.asarray(r_a.y), np.asarray(r_s.y),
                               rtol=1e-4, atol=1e-5)
