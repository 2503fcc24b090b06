"""Numerical parity against the upstream PyTorch reference (run as an
oracle, never copied). Skipped automatically when /root/reference is absent
(e.g. in CI after the framework ships standalone)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import Lens, Structure, abcd, metrics, trace, zoo
from torchoptics_tpu.models import glass

from tests.reference_oracle import build_reference_lens, load_reference

_ref = load_reference()
pytestmark = pytest.mark.skipif(_ref is None, reason="reference unavailable")
if _ref is not None:
    rt_ref, lm_ref = _ref


NAMES = ["singlet", "doublet", "cooke", "tessar"]


@pytest.mark.parametrize("name", NAMES)
def test_first_order_parity(name):
    import torch
    p = zoo.get_prescription(name)
    _, _, ref_lens = build_reference_lens(p, lm_ref)
    ref_efl, ref_bfl = rt_ref.get_first_order(ref_lens)

    specs, lens = zoo.build(name)
    efl, bfl = abcd.get_first_order(lens)
    np.testing.assert_allclose(np.asarray(efl), ref_efl.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bfl), ref_bfl.numpy(), rtol=1e-5)


@pytest.mark.parametrize("name", NAMES)
def test_pupil_position_parity(name):
    p = zoo.get_prescription(name)
    _, _, ref_lens = build_reference_lens(p, lm_ref)
    ref = rt_ref.compute_pupil_position(ref_lens).numpy()
    _, lens = zoo.build(name)
    got = np.asarray(abcd.compute_pupil_position(lens))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", NAMES)
def test_refractive_indices_parity(name):
    p = zoo.get_prescription(name)
    _, _, ref_lens = build_reference_lens(p, lm_ref)
    wavelengths = [459.0, 520.0, 640.0]
    ref_n = ref_lens.get_refractive_indices(wavelengths).numpy()
    _, lens = zoo.build(name)
    got = np.asarray(lens.get_refractive_indices(wavelengths))
    np.testing.assert_allclose(got, ref_n, rtol=1e-6, atol=1e-6)


def test_glass_whitening_parity():
    import torch
    n = np.asarray([1.5168, 1.62], dtype=np.float32)
    v = np.asarray([64.17, 36.37], dtype=np.float32)
    ref_g = lm_ref.g_from_n_v(torch.tensor(n), torch.tensor(v)).numpy()
    got_g = np.asarray(glass.g_from_n_v(jnp.asarray(n), jnp.asarray(v)))
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-5, atol=1e-5)

    ref_nv = [t.numpy() for t in lm_ref.n_v_from_g(torch.tensor(ref_g))]
    got_nv = [np.asarray(a) for a in glass.n_v_from_g(jnp.asarray(got_g))]
    np.testing.assert_allclose(got_nv[0], ref_nv[0], rtol=1e-5)
    np.testing.assert_allclose(got_nv[1], ref_nv[1], rtol=1e-4)


def _ref_trace(name, mode="circular", n_rays=(6, 6), aiming=0,
               aggregate=False, fields=(0.0, 0.707, 1.0),
               wavelengths=(459.0, 520.0, 640.0)):
    p = zoo.get_prescription(name)
    _, ref_specs, ref_lens = build_reference_lens(p, lm_ref)
    tracer = rt_ref.RayTracer(mode=mode, n_rays=n_rays, rel_fields=list(fields),
                              wavelengths=list(wavelengths),
                              n_ray_aiming_iter=aiming, default_device="cpu")
    return tracer.trace_rays(ref_specs, ref_lens, aggregate=aggregate)


def _our_trace(name, mode="circular", n_rays=(6, 6), aiming=0,
               aggregate=(), fields=(0.0, 0.707, 1.0),
               wavelengths=(459.0, 520.0, 640.0)):
    specs, lens = zoo.build(name)
    cfg = trace.TraceConfig(mode=mode, n_rays=n_rays, rel_fields=fields,
                            wavelengths=wavelengths, n_ray_aiming_iter=aiming)
    return trace.trace_rays(specs, lens, cfg, aggregate=aggregate)


@pytest.mark.parametrize("name", NAMES)
def test_trace_parity_no_aiming(name):
    ref_x, ref_y, ref_cx, ref_cy, ref_ok, ref_bw = _ref_trace(name)
    res = _our_trace(name)
    np.testing.assert_allclose(np.asarray(res.x), ref_x.detach().numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.y), ref_y.detach().numpy(),
                               rtol=1e-4, atol=2e-5)
    ok = np.broadcast_arrays(np.asarray(res.ray_ok), ref_ok.numpy())
    np.testing.assert_array_equal(ok[0], ok[1])


@pytest.mark.parametrize("name", ["doublet", "cooke", "tessar"])
def test_trace_parity_with_ray_aiming(name):
    ref_x, ref_y, *_ = _ref_trace(name, aiming=1)
    res = _our_trace(name, aiming=1)
    np.testing.assert_allclose(np.asarray(res.x), ref_x.detach().numpy(),
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(res.y), ref_y.detach().numpy(),
                               rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("name", ["cooke", "tessar"])
def test_aggregate_and_rms_parity(name):
    import torch
    ref_out = _ref_trace(name, aggregate=True, aiming=1)
    ref_x, ref_y, _, _, ref_ok, _, ref_stacks = ref_out
    res = _our_trace(name, aggregate=("z_RELU", "theta_norm",
                                      "theta_prime_norm"), aiming=1)
    for key in ("z_RELU", "theta_norm", "theta_prime_norm"):
        ref_stack = torch.stack(ref_stacks[key], dim=0).detach().numpy()
        np.testing.assert_allclose(np.asarray(res.stacks[key]), ref_stack,
                                   rtol=2e-3, atol=2e-4, err_msg=key)
    ref_rms = rt_ref.compute_rms2d(ref_x, ref_y, ref_ok).detach().numpy()
    got_rms = np.asarray(metrics.compute_rms2d(res.x, res.y, res.ray_ok))[0]
    np.testing.assert_allclose(got_rms, ref_rms, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["cooke", "doublet"])
def test_last_curvature_parity(name):
    import torch
    p = zoo.get_prescription(name)
    st_ref, _, ref_lens = build_reference_lens(p, lm_ref)
    efl = rt_ref.get_first_order(ref_lens)[0]
    unit_ref = ref_lens.scale(1.0 / efl)
    ref_c = rt_ref.compute_last_curvature(
        st_ref, unit_ref.flat_c_but_last, unit_ref.flat_t,
        unit_ref.flat_nd).detach().numpy()

    specs, lens = zoo.build(name)
    unit = lens.scale(1.0 / lens.efl)
    got_c = np.asarray(abcd.compute_last_curvature(
        unit.structure, unit.flat_c_but_last, unit.flat_t, unit.flat_nd))
    np.testing.assert_allclose(got_c, ref_c, rtol=1e-4, atol=1e-6)


def test_gradient_parity_cooke():
    """Full-chain gradient parity: d(rms)/d(curvatures) vs torch autograd."""
    import torch
    p = zoo.get_prescription("cooke")
    _, ref_specs, ref_lens = build_reference_lens(p, lm_ref)
    ref_lens.c.requires_grad_(True)
    tracer = rt_ref.RayTracer(mode="circular", n_rays=(6, 6),
                              rel_fields=[0.0, 1.0], wavelengths=[587.6],
                              n_ray_aiming_iter=0, default_device="cpu")
    rx, ry, _, _, rok, _ = tracer.trace_rays(ref_specs, ref_lens)
    ref_rms = rt_ref.compute_rms2d(rx, ry, rok)
    ref_rms.backward()
    ref_grad = ref_lens.c.grad.numpy()

    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(6, 6),
                            rel_fields=(0.0, 1.0), wavelengths=(587.6,))

    def loss(c):
        res = trace.trace_rays(specs, lens.replace(c=c), cfg)
        return metrics.compute_rms2d(res.x, res.y, res.ray_ok)[0]

    got_grad = np.asarray(jax.grad(loss)(lens.c))
    np.testing.assert_allclose(got_grad, ref_grad, rtol=5e-3, atol=1e-5)
