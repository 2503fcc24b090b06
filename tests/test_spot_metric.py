"""The 2-D ('xy') spot metric: semantics, and parity of every loss path
that can compute it (XLA, fused single/batched kernels, sharded psum'd
moments) — VERDICT r3 #1. The 'y' default stays reference-parity
(`ray_tracing_lite.py:678-702`) and is pinned elsewhere
(tests/test_reference_parity.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchoptics_tpu import metrics, trace, zoo
from torchoptics_tpu import simulator as sim
from torchoptics_tpu.ops import pallas_batch, pallas_trace


def test_xy_metric_sees_sagittal_blur_y_misses():
    """The defining property: pure x-spread is invisible to the y-only
    reference metric but fully visible to 'xy'."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 64, 1)).astype(np.float32))
    y = jnp.zeros_like(x)
    ok = jnp.ones_like(x, dtype=bool)
    assert float(metrics.compute_spot_rms(x, y, ok, "y")[0]) == 0.0
    assert float(metrics.compute_spot_rms(x, y, ok, "xy")[0]) > 0.1


def test_xy_metric_gradient_safe_at_perfect_focus():
    """All rays coincident -> rms 0 with zero (not NaN) gradient."""
    def f(x):
        y = jnp.full((1, 1, 5, 1), 0.2)
        ok = jnp.ones_like(y, dtype=bool)
        return metrics.compute_spot_rms(
            jnp.broadcast_to(x, y.shape), y, ok, "xy")[0]
    val, grad = jax.value_and_grad(f)(jnp.asarray(0.3))
    assert float(val) == 0.0
    assert np.isfinite(float(grad))


def test_flat_wouter_xy_reduction_matches_metric():
    """The relayout-free flat reductions == metrics.compute_spot_rms_xy."""
    rng = np.random.default_rng(1)
    B, F, P, W = 3, 4, 40, 2
    x = rng.normal(size=(B, W, F, P)).astype(np.float32)
    y = rng.normal(size=(B, W, F, P)).astype(np.float32)
    ok = rng.random((B, W, F, P)) > 0.2
    # packaged layout (B, F, P, W) for the metric
    xp = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    yp = jnp.asarray(np.transpose(y, (0, 2, 3, 1)))
    okp = jnp.asarray(np.transpose(ok, (0, 2, 3, 1)))
    want = np.asarray(
        jnp.mean(metrics.compute_spot_rms_xy(xp, yp, okp), axis=1))
    got_b = np.asarray(pallas_batch.spot_rms_xy_flat_wouter_batch(
        jnp.asarray(x.reshape(B, -1)), jnp.asarray(y.reshape(B, -1)),
        jnp.asarray(ok.reshape(B, -1)), F, P, W))
    np.testing.assert_allclose(got_b, want, rtol=1e-5)
    got_1 = float(pallas_trace.spot_rms_xy_flat_wouter(
        jnp.asarray(x[0].reshape(-1)), jnp.asarray(y[0].reshape(-1)),
        jnp.asarray(ok[0].reshape(-1)), F, P, W))
    np.testing.assert_allclose(got_1, want[0], rtol=1e-5)


def _cfg(**kw):
    base = dict(n_sampled_fields=3, n_pupil_rings=4,
                pupil_sampling="circular", n_ray_aiming_iter=1,
                wavelengths=(459.0, 520.0, 640.0), spot_metric="xy")
    base.update(kw)
    return sim.SimulatorConfig(**base)


def test_xla_loss_uses_selected_metric():
    specs, lens = zoo.build("cooke")
    config = _cfg()
    res, ld = sim.do_ray_tracing(specs, lens, config)
    want = float(jnp.mean(
        metrics.compute_spot_rms_xy(res.x, res.y, res.ray_ok)))
    np.testing.assert_allclose(float(ld["rms"]), want, rtol=1e-6)
    _, ld_y = sim.do_ray_tracing(specs, lens, dataclasses.replace(
        config, spot_metric="y"))
    assert float(ld_y["rms"]) != float(ld["rms"])


def test_fused_single_xy_matches_xla():
    """unsupervised + full losses, single spherical system, value + grads."""
    specs, lens = zoo.build("double_gauss")
    config = _cfg()
    cfg_p = dataclasses.replace(config, trace_engine="pallas")

    def lu_xla(c, t):
        _, ld = sim.do_ray_tracing(specs, lens.replace(c=c, t=t), config)
        return ld["loss_unsup"]

    def lu_pal(c, t):
        _, ld = sim.do_ray_tracing(specs, lens.replace(c=c, t=t), cfg_p)
        return ld["loss_unsup"]

    v_x, g_x = jax.value_and_grad(lu_xla, argnums=(0, 1))(lens.c, lens.t)
    with pltpu.force_tpu_interpret_mode():
        v_p, g_p = jax.value_and_grad(lu_pal, argnums=(0, 1))(lens.c, lens.t)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=2e-5)
    for gp, gx, name in zip(g_p, g_x, ("dc", "dt")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=2e-3, atol=1e-6, err_msg=name)

    with pltpu.force_tpu_interpret_mode():
        tot_p, d_p = sim.compute_losses(specs, lens, cfg_p)
    tot_x, d_x = sim.compute_losses(specs, lens, config)
    np.testing.assert_allclose(float(tot_p), float(tot_x), rtol=2e-5)
    np.testing.assert_allclose(float(d_p["spot_size"]),
                               float(d_x["spot_size"]), rtol=2e-5)


def test_fused_batch_xy_matches_xla():
    from tests.test_sharding import _tiled_population
    specs, lens = _tiled_population("cooke", n_pop=3, perturb=0.02)
    config = _cfg(n_sampled_fields=2)
    with pltpu.force_tpu_interpret_mode():
        _, ld = pallas_batch.batched_unsupervised_loss(specs, lens, config)
    cfg = config.trace_config()
    res = trace.trace_rays(specs, lens, cfg)
    want = metrics.compute_spot_rms(res.x, res.y, res.ray_ok, "xy")
    np.testing.assert_allclose(np.asarray(ld["rms"]), np.asarray(want),
                               rtol=2e-5, atol=1e-7)


def test_fused_asphere_xy_matches_xla():
    specs, lens = zoo.build("double_gauss_asph")
    config = _cfg(n_sampled_fields=2)
    cfg_p = dataclasses.replace(config, trace_engine="pallas")
    with pltpu.force_tpu_interpret_mode():
        tot_p, d_p = sim.compute_losses(specs, lens, cfg_p)
    tot_x, d_x = sim.compute_losses(specs, lens, config)
    np.testing.assert_allclose(float(d_p["rms"]), float(d_x["rms"]),
                               rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(float(tot_p), float(tot_x), rtol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_xy_matches_single_device_fused():
    from tests.test_sharding import _tiled_population
    from torchoptics_tpu.parallel import mesh as mesh_mod
    from torchoptics_tpu.parallel import shard as shard_mod
    specs, lens = _tiled_population("cooke", n_pop=4, perturb=0.02)
    config = _cfg(n_sampled_fields=2, trace_engine="pallas")
    mesh = mesh_mod.make_mesh(lens_parallel=2)

    def loss_sh(c, t):
        total, d = shard_mod.sharded_fused_losses(
            specs, lens.replace(c=c, t=t), config, mesh)
        return total, d

    def loss_si(c, t):
        return pallas_batch.batched_compute_losses_fused(
            specs, lens.replace(c=c, t=t), config)

    with pltpu.force_tpu_interpret_mode():
        (v_sh, d_sh), g_sh = jax.value_and_grad(
            loss_sh, argnums=(0, 1), has_aux=True)(lens.c, lens.t)
        (v_si, d_si), g_si = jax.value_and_grad(
            loss_si, argnums=(0, 1), has_aux=True)(lens.c, lens.t)
    np.testing.assert_allclose(float(v_sh), float(v_si), rtol=2e-5)
    np.testing.assert_allclose(float(d_sh["rms"]), float(d_si["rms"]),
                               rtol=2e-5)
    for gs, gi, name in zip(g_sh, g_si, ("dc", "dt")):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gi),
                                   rtol=1e-3, atol=1e-6, err_msg=name)
