"""Simulator layer: unsupervised loss, penalties, wrapper API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import Lens, Specs, Structure, trace, zoo
from torchoptics_tpu import simulator as sim
from torchoptics_tpu.models import glass


CFG = sim.SimulatorConfig(n_sampled_fields=4, n_pupil_rings=4,
                          pupil_sampling="circular", n_ray_aiming_iter=1)


def test_do_ray_tracing_loss_dict():
    specs, lens = zoo.build("cooke")
    res, loss_dict = sim.do_ray_tracing(specs, lens, CFG)
    assert set(loss_dict) == {"loss_unsup", "rms", "penalty"}
    for v in loss_dict.values():
        assert np.isfinite(float(v))
    # Lu = rms + rate * penalty
    np.testing.assert_allclose(
        float(loss_dict["loss_unsup"]),
        float(loss_dict["rms"]) + CFG.penalty_rate * float(loss_dict["penalty"]),
        rtol=1e-5)


def test_rel_fields_single_field_special_case():
    cfg = sim.SimulatorConfig(n_sampled_fields=1)
    assert cfg.rel_fields() == (1.0,)
    cfg = sim.SimulatorConfig(n_sampled_fields=3)
    np.testing.assert_allclose(cfg.rel_fields(), [0.0, 0.5, 1.0])


def test_unsupervised_loss_differentiable():
    specs, lens = zoo.build("cooke")

    def f(c):
        return sim.unsupervised_loss(specs, lens.replace(c=c), CFG)

    g = jax.grad(f)(lens.c)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_ray_path_penalty_respects_bounds():
    specs, lens = zoo.build("cooke")
    cfg = CFG
    res = trace.trace_rays(specs, lens, cfg.trace_config(), aggregate=("z",))
    # Loose bounds -> zero penalty; absurd lower bound -> positive.
    zero = sim.compute_ray_path_penalty(lens, res.stacks["z"],
                                        (None, None, None), (None, None, None))
    assert float(zero) == 0.0
    big = sim.compute_ray_path_penalty(lens, res.stacks["z"],
                                       (5.0, 5.0, 50.0), (None, None, None))
    assert float(big) > 0


def test_ray_angle_penalty():
    # cos^2 = 1 (normal incidence) everywhere -> no penalty
    ones = jnp.ones((4, 1, 2, 3, 2))
    assert float(sim.compute_ray_angle_penalty(ones, 60.0)) == 0.0
    # grazing incidence cos^2 = 0 -> penalty = sum over stack of threshold
    zeros = jnp.zeros((4, 1, 2, 3, 2))
    want = 4 * np.cos(np.deg2rad(60.0)) ** 2
    np.testing.assert_allclose(
        float(sim.compute_ray_angle_penalty(zeros, 60.0)), want, rtol=1e-6)


def test_glass_penalty_zero_on_catalog():
    specs, lens = zoo.build("doublet")
    catalog = glass.default_catalog_g()
    g_exact = catalog[:2]
    pen = sim.compute_glass_penalty(lens.structure, g_exact, catalog)
    np.testing.assert_allclose(float(pen), 0.0, atol=1e-8)
    g_off = g_exact + 0.5
    assert float(sim.compute_glass_penalty(lens.structure, g_off, catalog)) > 0
    assert float(sim.compute_glass_penalty(lens.structure, g_off, None)) == 0.0


def test_compute_losses_full():
    specs, lens = zoo.build("cooke")
    catalog = glass.default_catalog_g()
    g = glass.g_from_n_v(lens.flat_nd, lens.flat_v)
    total, loss_dict = sim.compute_losses(specs, lens, CFG, g=g,
                                          catalog_g=catalog)
    for k in ("spot_size", "ray_path", "ray_angle", "glass", "loss_unsup"):
        assert k in loss_dict, k
        assert np.isfinite(float(loss_dict[k])), k
    assert np.isfinite(float(total))


def test_raytraced_optics_wrapper_defaults():
    ro = sim.RaytracedOptics(
        initial_lens_path="",
        stop_index=np.array([0]),
        sequence=np.array(["AGA"]),
        hfov=np.array([0.0, 17.5, 25.0]),
        epd=np.array([0.7]),
        curvature=(0.0, -0.242432341, -0.424975232),
        thickness=(1.21071062, 0.25, 9.86362667),
        n_refractive=(1.5224147149313454,),
        abbe_number=(59.450346241693694,),
        n_sampled_fields=3,
        n_pupil_rings=4,
        pupil_sampling="circular",
    )
    x, y, ray_ok = ro.do_ray_tracing()
    assert "loss_unsup" in ro.loss_dict
    assert np.isfinite(float(ro.loss_dict["loss_unsup"]))
    assert x.shape[1] == 3  # fields


def test_raytraced_optics_from_prescription_dict():
    ro = sim.RaytracedOptics(initial_lens_path=zoo.get_prescription("cooke"),
                             n_sampled_fields=3, n_pupil_rings=4,
                             pupil_sampling="circular")
    x, y, ok = ro.do_ray_tracing()
    assert np.isfinite(float(ro.loss_dict["rms"]))


def test_compute_loss_out_batched_mean_rms():
    """Regression: batched lenses must use the mean spot RMS over systems,
    not system 0 only."""
    from torchoptics_tpu.models.structure import Lens, Specs, Structure
    p = zoo.get_prescription("cooke")
    st = Structure(tuple(p["stop_idx"] * 2), tuple(p["sequence"] * 2))
    c = np.tile(np.asarray(p["c"], np.float32), (2, 1))
    c[1] *= 1.10  # system 1 is notably worse
    t = np.tile(np.asarray(p["t"], np.float32), (2, 1))
    gpos = [i for i, ch in enumerate(p["sequence"][0]) if ch == "G"]
    nd = np.ones_like(c)
    v = np.ones_like(c)
    for gi, i in enumerate(gpos):
        nd[:, i] = p["nd"][gi]
        v[:, i] = p["v"][gi]
    lens = Lens(st, jnp.asarray(c), jnp.asarray(t), jnp.asarray(nd),
                jnp.asarray(v))
    s1, lens1 = zoo.build("cooke")
    specs = Specs(st, jnp.tile(s1.epd, 2), jnp.tile(s1.hfov, 2))
    _, ld_batch = sim.do_ray_tracing(specs, lens, CFG)
    _, ld_single = sim.do_ray_tracing(s1, lens1, CFG)
    # the perturbed system must pull the batch rms above the clean one
    assert float(ld_batch["rms"]) > float(ld_single["rms"]) * 1.2
