"""Pallas production-config coverage: the fused kernels must accept every
trace configuration the XLA engine accepts — vignetting, backward-ray
removal, padded tails, heterogeneous batched populations — or raise loudly
(VERDICT r1 #1). All kernel runs use interpret mode (CPU).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchoptics_tpu import metrics, trace, zoo
from torchoptics_tpu.models.structure import Lens, Specs, Structure

from tests.test_fuzz_engines import random_mixed_batch, random_system

# Interpret-mode kernel parity is exhaustive and multi-minute; the fast
# profile (pytest -m 'not slow') keeps kernel coverage via the unmarked
# fuzz tests in test_fuzz_engines.py.
pytestmark = pytest.mark.slow

VIG_FN = lambda fields, coeff: coeff  # reference-style constant vignetting


def _cfg(engine="unroll", **kw):
    base = dict(mode="circular", n_rays=(4, 4), rel_fields=(0.0, 0.7, 1.0),
                wavelengths=("C", "d", "F"))
    base.update(kw)
    return trace.TraceConfig(engine=engine, **base)


def _pallas(specs, lens, cfg, **kw):
    with pltpu.force_tpu_interpret_mode():
        return trace.trace_rays(specs, lens,
                                dataclasses.replace(cfg, engine="pallas"),
                                **kw)


def _assert_trace_match(r_u, r_p, seed=""):
    np.testing.assert_array_equal(np.asarray(r_u.ray_ok),
                                  np.asarray(r_p.ray_ok), err_msg=str(seed))
    ok = np.asarray(r_u.ray_ok)
    if ok.any():
        np.testing.assert_allclose(np.asarray(r_p.y)[ok],
                                   np.asarray(r_u.y)[ok],
                                   rtol=1e-4, atol=1e-5, err_msg=str(seed))
        np.testing.assert_allclose(np.asarray(r_p.x)[ok],
                                   np.asarray(r_u.x)[ok],
                                   rtol=1e-4, atol=1e-5, err_msg=str(seed))


def test_pallas_vignetting_parity():
    """SimulatorConfig's own default workload uses vignetting
    (`optics_simulator_lite.py:361-363`); the fused path must apply it."""
    specs0, lens = zoo.build("cooke")
    specs = Specs(specs0.structure, specs0.epd, specs0.hfov,
                  vig_up=jnp.asarray([0.2]), vig_down=jnp.asarray([0.1]),
                  vig_x=jnp.asarray([0.05]))
    cfg = _cfg(vig_fn=VIG_FN, n_ray_aiming_iter=1)
    r_u = trace.trace_rays(specs, lens, cfg)
    r_p = _pallas(specs, lens, cfg)
    _assert_trace_match(r_u, r_p)
    # Vignetting actually changed the result vs the unvignetted trace.
    r_novig = trace.trace_rays(specs, lens, _cfg(n_ray_aiming_iter=1))
    assert not np.allclose(np.asarray(r_u.y), np.asarray(r_novig.y))


def _system_with_backward_rays():
    """Find a seeded random system where backward rays survive the trace —
    so allow_backward_rays=False actually removes rays."""
    for seed in range(200):
        rng = np.random.default_rng(seed)
        specs, lens = random_system(rng)
        lens = lens.replace(c=lens.c * 3.0)
        r = trace.trace_rays(specs, lens, _cfg())
        if bool((np.asarray(r.ray_backward) & np.asarray(r.ray_ok)).any()):
            return specs, lens, seed
    raise AssertionError("no surviving-backward-ray system in 200 seeds")


def test_pallas_allow_backward_false_parity():
    specs, lens, seed = _system_with_backward_rays()
    cfg = _cfg(allow_backward_rays=False)
    r_u = trace.trace_rays(specs, lens, cfg)
    # Backward-ray removal must actually fail some rays vs the default.
    r_def = trace.trace_rays(specs, lens, _cfg())
    assert np.asarray(r_u.ray_ok).sum() < np.asarray(r_def.ray_ok).sum()
    r_p = _pallas(specs, lens, cfg)
    _assert_trace_match(r_u, r_p, seed)

    def loss(c, engine):
        r = trace.trace_rays(
            specs, lens.replace(c=c),
            dataclasses.replace(cfg, engine=engine))
        return metrics.compute_rms2d(r.x, r.y, r.ray_ok)[0]

    g_u = jax.grad(lambda c: loss(c, "unroll"))(lens.c)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda c: loss(c, "pallas"))(lens.c)
    scale = np.abs(np.asarray(g_u)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_p) / scale,
                               np.asarray(g_u) / scale, atol=2e-4)


def test_pallas_padded_tail_single_system():
    """A single-system lens carrying padded tail slots (pad_to) runs fused
    via host-side tail compression."""
    p = zoo.get_prescription("cooke")
    st = Structure(tuple(p["stop_idx"]), tuple(p["sequence"]), pad_to=10)
    lens = Lens(st, jnp.asarray(p["c"], jnp.float32),
                jnp.asarray(p["t"], jnp.float32),
                jnp.asarray(p["nd"], jnp.float32),
                jnp.asarray(p["v"], jnp.float32))
    specs0, _ = zoo.build("cooke")
    specs = Specs(st, specs0.epd, specs0.hfov)
    cfg = _cfg(n_ray_aiming_iter=1)
    r_u = trace.trace_rays(specs, lens, cfg)
    r_p = _pallas(specs, lens, cfg)
    _assert_trace_match(r_u, r_p)

    def loss(c, engine):
        r = trace.trace_rays(
            specs, lens.replace(c=c),
            dataclasses.replace(cfg, engine=engine))
        return metrics.compute_rms2d(r.x, r.y, r.ray_ok)[0]

    g_u = jax.grad(lambda c: loss(c, "unroll"))(lens.c)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda c: loss(c, "pallas"))(lens.c)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_u),
                               rtol=1e-3, atol=1e-6)
    # Padded slots carry (numerically) zero gradient in both engines — the
    # XLA engine traces through the dummy flat surfaces, leaving ~1e-11 f32
    # noise; the compressed kernel's are exactly zero.
    assert np.all(np.abs(np.asarray(g_u)[:, 7:]) < 1e-8)
    assert np.all(np.asarray(g_p)[:, 7:] == 0.0)


@pytest.mark.parametrize("seed", range(3))
def test_pallas_batch_heterogeneous_parity(seed):
    """The batch kernel traces a padded population mixing sequences; the
    per-system static masks drive the backward-ray bookkeeping."""
    rng = np.random.default_rng(700 + seed)
    specs, lens, _ = random_mixed_batch(rng, ("GA", "GAGAAGA", "GAAGA"))
    cfg = _cfg()
    r_u = trace.trace_rays(specs, lens, cfg)
    r_p = _pallas(specs, lens, cfg)
    _assert_trace_match(r_u, r_p, seed)

    def loss(c, engine):
        r = trace.trace_rays(
            specs, lens.replace(c=c),
            dataclasses.replace(cfg, engine=engine))
        return jnp.mean(metrics.compute_rms2d(r.x, r.y, r.ray_ok))

    g_u = jax.grad(lambda c: loss(c, "unroll"))(lens.c)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda c: loss(c, "pallas"))(lens.c)
    scale = np.abs(np.asarray(g_u)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_p) / scale,
                               np.asarray(g_u) / scale,
                               atol=2e-4, err_msg=str(seed))


def test_pallas_batch_heterogeneous_loss():
    """batched_unsupervised_loss on a mixed padded population matches the
    XLA per-sample semantics (per-system surface-count normalization)."""
    from torchoptics_tpu import simulator as sim_mod
    from torchoptics_tpu.ops import pallas_batch

    rng = np.random.default_rng(900)
    specs, lens, _ = random_mixed_batch(rng, ("GA", "GAGAAGA"))
    config = sim_mod.SimulatorConfig(
        n_sampled_fields=3, n_pupil_rings=4, pupil_sampling="circular",
        n_ray_aiming_iter=0, wavelengths=(459.0, 520.0, 640.0))
    _, ld_xla = sim_mod.do_ray_tracing(specs, lens, config)
    with pltpu.force_tpu_interpret_mode():
        mean_lu, ld_p = pallas_batch.batched_unsupervised_loss(
            specs, lens, config)
    np.testing.assert_allclose(float(mean_lu), float(ld_xla["loss_unsup"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(jnp.mean(ld_p["rms"])),
                               float(ld_xla["rms"]), rtol=1e-4)


def test_pallas_batch_via_trace_rays_dispatch():
    """trace_rays(engine='pallas') routes B > 1 spherical populations to the
    batch kernel."""
    rng = np.random.default_rng(123)
    seqs = ("GAGA",) * 3
    specs, lens, _ = random_mixed_batch(rng, seqs)
    cfg = _cfg()
    r_u = trace.trace_rays(specs, lens, cfg)
    r_p = _pallas(specs, lens, cfg)
    assert r_p.y.shape == r_u.y.shape
    _assert_trace_match(r_u, r_p)


def test_fused_compute_losses_parity():
    """simulator.compute_losses(trace_engine='pallas') — the FULL weighted
    loss (spot + ray-path + ray-angle + glass + Lu) fused in-kernel — must
    match the XLA stacks path in value and gradient."""
    from torchoptics_tpu import simulator as sim_mod
    from torchoptics_tpu.models import glass as glass_mod

    specs, lens = zoo.build("cooke")
    catalog_g = glass_mod.default_catalog_g()
    g = glass_mod.g_from_n_v(lens.flat_nd, lens.flat_v)
    base = dict(n_sampled_fields=5, n_pupil_rings=6,
                pupil_sampling="circular", n_ray_aiming_iter=1,
                wavelengths=(459.0, 520.0, 640.0),
                # tight bounds so the path/angle hinges are ACTIVE
                ray_path_lower_thresholds=(0.5, 1.5, 12.0),
                ray_path_upper_thresholds=(None, 3.0, 40.0),
                ray_angle_threshold=30.0)
    cfg_x = sim_mod.SimulatorConfig(**base)
    cfg_p = sim_mod.SimulatorConfig(trace_engine="pallas", **base)

    total_x, ld_x = sim_mod.compute_losses(specs, lens, cfg_x, g=g,
                                           catalog_g=catalog_g)
    with pltpu.force_tpu_interpret_mode():
        total_p, ld_p = sim_mod.compute_losses(specs, lens, cfg_p, g=g,
                                               catalog_g=catalog_g)
    assert float(ld_x["ray_path"]) > 0.0   # hinges really fired
    assert float(ld_x["ray_angle"]) > 0.0
    for k in ("loss_unsup", "rms", "spot_size", "ray_path", "ray_angle",
              "glass"):
        np.testing.assert_allclose(float(ld_p[k]), float(ld_x[k]),
                                   rtol=3e-4, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(float(total_p), float(total_x), rtol=3e-4)

    def total_fn(c, t, config):
        tot, _ = sim_mod.compute_losses(specs, lens.replace(c=c, t=t),
                                        config, g=g, catalog_g=catalog_g)
        return tot

    gx = jax.grad(total_fn, argnums=(0, 1))(lens.c, lens.t, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(total_fn, argnums=(0, 1))(lens.c, lens.t, cfg_p)
    for a, b, name in zip(gp, gx, ("dc", "dt")):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-4, err_msg=name)


def test_fused_compute_losses_batched_parity():
    """compute_losses(trace_engine='pallas') on a homogeneous POPULATION —
    the full weighted loss fused in-kernel per system — matches the XLA
    stacks path in value and gradient."""
    from torchoptics_tpu import simulator as sim_mod
    from torchoptics_tpu.models import glass as glass_mod
    from torchoptics_tpu.models.structure import Lens, Specs, Structure

    B = 3
    p = zoo.get_prescription("cooke")
    st = Structure(tuple(p["stop_idx"] * B), tuple(p["sequence"] * B))
    rng = np.random.default_rng(42)
    tile = lambda v: np.tile(np.asarray(v, np.float32)[None], (B, 1))
    c = tile(p["c"]) * (1 + 0.02 * rng.standard_normal((B, len(p["c"])))
                        ).astype(np.float32)
    lens = Lens(st, jnp.asarray(c), jnp.asarray(tile(p["t"])),
                jnp.asarray(np.asarray(list(p["nd"]) * B, np.float32)),
                jnp.asarray(np.asarray(list(p["v"]) * B, np.float32)))
    specs0, _ = zoo.build("cooke")
    specs = Specs(st, jnp.tile(specs0.epd, B), jnp.tile(specs0.hfov, B))
    catalog_g = glass_mod.default_catalog_g()
    g = glass_mod.g_from_n_v(lens.flat_nd, lens.flat_v)
    base = dict(n_sampled_fields=4, n_pupil_rings=5,
                pupil_sampling="circular", n_ray_aiming_iter=1,
                wavelengths=(459.0, 520.0, 640.0),
                ray_path_lower_thresholds=(0.5, 1.5, 12.0),
                ray_path_upper_thresholds=(None, 3.0, 40.0),
                ray_angle_threshold=30.0)
    cfg_x = sim_mod.SimulatorConfig(**base)
    cfg_p = sim_mod.SimulatorConfig(trace_engine="pallas", **base)

    total_x, ld_x = sim_mod.compute_losses(specs, lens, cfg_x, g=g,
                                           catalog_g=catalog_g)
    with pltpu.force_tpu_interpret_mode():
        total_p, ld_p = sim_mod.compute_losses(specs, lens, cfg_p, g=g,
                                               catalog_g=catalog_g)
    assert float(ld_x["ray_path"]) > 0.0
    assert float(ld_x["ray_angle"]) > 0.0
    for k in ("loss_unsup", "rms", "spot_size", "ray_path", "ray_angle",
              "glass"):
        np.testing.assert_allclose(float(ld_p[k]), float(ld_x[k]),
                                   rtol=3e-4, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(float(total_p), float(total_x), rtol=3e-4)

    def total_fn(c_, t_, config):
        tot, _ = sim_mod.compute_losses(specs, lens.replace(c=c_, t=t_),
                                        config, g=g, catalog_g=catalog_g)
        return tot

    gx = jax.grad(total_fn, argnums=(0, 1))(lens.c, lens.t, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(total_fn, argnums=(0, 1))(lens.c, lens.t, cfg_p)
    for a, b, name in zip(gp, gx, ("dc", "dt")):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-4, err_msg=name)

    # Aspherized homogeneous population: same fused full-loss contract.
    lens_a = lens.replace(
        kappa=jnp.asarray(rng.uniform(-0.4, 0.2, lens.c.shape), jnp.float32),
        asph=jnp.asarray(rng.uniform(-1, 1, lens.c.shape + (2,))
                         * np.asarray([1e-5, 1e-8]), jnp.float32))
    total_xa, ld_xa = sim_mod.compute_losses(specs, lens_a, cfg_x, g=g,
                                             catalog_g=catalog_g)
    with pltpu.force_tpu_interpret_mode():
        total_pa, ld_pa = sim_mod.compute_losses(specs, lens_a, cfg_p, g=g,
                                                 catalog_g=catalog_g)
    for k in ("loss_unsup", "rms", "ray_path", "ray_angle"):
        np.testing.assert_allclose(float(ld_pa[k]), float(ld_xa[k]),
                                   rtol=3e-4, atol=1e-7, err_msg=f"asph:{k}")
    np.testing.assert_allclose(float(total_pa), float(total_xa), rtol=3e-4)


def test_fused_compute_losses_asphere_parity():
    """compute_losses(trace_engine='pallas') on a single conic/asphere
    system — full weighted loss fused in-kernel — matches the XLA path."""
    from torchoptics_tpu import simulator as sim_mod
    from torchoptics_tpu.models import glass as glass_mod

    specs, lens0 = zoo.build("cooke")
    rng = np.random.default_rng(77)
    B, S = lens0.c.shape
    lens = lens0.replace(
        kappa=jnp.asarray(rng.uniform(-0.5, 0.2, (B, S)), jnp.float32),
        asph=jnp.asarray(rng.uniform(-1, 1, (B, S, 2))
                         * np.asarray([1e-5, 1e-8]), jnp.float32))
    catalog_g = glass_mod.default_catalog_g()
    g = glass_mod.g_from_n_v(lens.flat_nd, lens.flat_v)
    base = dict(n_sampled_fields=4, n_pupil_rings=5,
                pupil_sampling="circular", n_ray_aiming_iter=1,
                wavelengths=(459.0, 520.0, 640.0),
                ray_path_lower_thresholds=(0.5, 1.5, 12.0),
                ray_path_upper_thresholds=(None, 3.0, 40.0),
                ray_angle_threshold=30.0)
    cfg_x = sim_mod.SimulatorConfig(**base)
    cfg_p = sim_mod.SimulatorConfig(trace_engine="pallas", **base)

    total_x, ld_x = sim_mod.compute_losses(specs, lens, cfg_x, g=g,
                                           catalog_g=catalog_g)
    with pltpu.force_tpu_interpret_mode():
        total_p, ld_p = sim_mod.compute_losses(specs, lens, cfg_p, g=g,
                                               catalog_g=catalog_g)
    assert float(ld_x["ray_path"]) > 0.0
    for k in ("loss_unsup", "rms", "spot_size", "ray_path", "ray_angle",
              "glass"):
        np.testing.assert_allclose(float(ld_p[k]), float(ld_x[k]),
                                   rtol=3e-4, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(float(total_p), float(total_x), rtol=3e-4)

    def total_fn(c, kap, t, config):
        tot, _ = sim_mod.compute_losses(
            specs, lens.replace(c=c, kappa=kap, t=t), config, g=g,
            catalog_g=catalog_g)
        return tot

    gx = jax.grad(total_fn, argnums=(0, 1, 2))(lens.c, lens.kappa, lens.t,
                                               cfg_x)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(total_fn, argnums=(0, 1, 2))(lens.c, lens.kappa,
                                                   lens.t, cfg_p)
    for a, b, name in zip(gp, gx, ("dc", "dkappa", "dt")):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-4, err_msg=name)


def test_fused_do_ray_tracing_dispatch():
    """do_ray_tracing(trace_engine='pallas') returns the same loss_dict as
    the XLA aggregate path, for single systems and batches."""
    from torchoptics_tpu import simulator as sim_mod

    base = dict(n_sampled_fields=3, n_pupil_rings=4,
                pupil_sampling="circular", n_ray_aiming_iter=1,
                wavelengths=(459.0, 520.0, 640.0))
    cfg_x = sim_mod.SimulatorConfig(**base)
    cfg_p = sim_mod.SimulatorConfig(trace_engine="pallas", **base)

    specs, lens = zoo.build("cooke")
    _, ld_x = sim_mod.do_ray_tracing(specs, lens, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        res_p, ld_p = sim_mod.do_ray_tracing(specs, lens, cfg_p)
    assert res_p.stacks is None
    for k in ld_x:
        np.testing.assert_allclose(float(ld_p[k]), float(ld_x[k]),
                                   rtol=3e-4, err_msg=k)

    with pytest.raises(NotImplementedError, match="aggregate"):
        sim_mod.do_ray_tracing(specs, lens, cfg_p, aggregate=("z",))


def test_pallas_dispatch_raises_loudly():
    specs, lens = zoo.build("cooke")
    with pytest.raises(NotImplementedError, match="float32"):
        trace.trace_rays(specs, lens, _cfg(engine="pallas",
                                           double_precision=True))
    with pytest.raises(NotImplementedError, match="aggregate"):
        trace.trace_rays(specs, lens, _cfg(engine="pallas"),
                         aggregate=trace.AGG_TORCH)


@pytest.mark.parametrize("seed", range(2))
def test_pallas_batch_asphere_parity(seed):
    """Batched conic/asphere populations (the generator superset) trace in
    one fused launch and match the vmapped XLA engine incl. gradients."""
    rng = np.random.default_rng(800 + seed)
    seqs = ("GAGA", "GAGAAGA", "GA")
    specs, lens, _ = random_mixed_batch(rng, seqs)
    B, S = lens.c.shape
    kappa = jnp.asarray(
        rng.uniform(-0.8, 0.4, (B, S)).astype(np.float32)
        * lens.structure.mask)
    asph = jnp.asarray(
        (rng.uniform(-1, 1, (B, S, 2)) * np.asarray([1e-5, 1e-8])
         ).astype(np.float32) * lens.structure.mask[..., None])
    lens = lens.replace(kappa=kappa, asph=asph)
    cfg = _cfg(wavelengths=("d", "F"))
    r_u = trace.trace_rays(specs, lens, cfg)
    r_p = _pallas(specs, lens, cfg)
    _assert_trace_match(r_u, r_p, seed)

    def loss(c, kap, engine):
        r = trace.trace_rays(
            specs, lens.replace(c=c, kappa=kap),
            dataclasses.replace(cfg, engine=engine))
        return jnp.mean(metrics.compute_rms2d(r.x, r.y, r.ray_ok))

    g_u = jax.grad(loss, argnums=(0, 1))(lens.c, lens.kappa, "unroll")
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss, argnums=(0, 1))(lens.c, lens.kappa, "pallas")
    for a, b, name in zip(g_p, g_u, ("dc", "dkappa")):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=3e-4, err_msg=f"{seed}:{name}")


def test_pallas_batch_asphere_loss_bridge():
    """The generator loss bridge evaluates an aspherized population through
    the fused batch kernel (engine='pallas')."""
    from torchoptics_tpu import simulator as sim_mod
    from torchoptics_tpu.ops import pallas_batch

    rng = np.random.default_rng(950)
    specs, lens, _ = random_mixed_batch(rng, ("GAGA",) * 2)
    B, S = lens.c.shape
    lens = lens.replace(
        kappa=jnp.asarray(rng.uniform(-0.5, 0.2, (B, S)), jnp.float32),
        asph=jnp.asarray(rng.uniform(-1, 1, (B, S, 1)) * 1e-5, jnp.float32))
    config = sim_mod.SimulatorConfig(
        n_sampled_fields=2, n_pupil_rings=4, pupil_sampling="circular",
        n_ray_aiming_iter=0, wavelengths=(520.0,))
    _, ld_x = sim_mod.do_ray_tracing(specs, lens, config)
    with pltpu.force_tpu_interpret_mode():
        mean_lu, ld_p = pallas_batch.batched_unsupervised_loss(
            specs, lens, config)
    np.testing.assert_allclose(float(mean_lu), float(ld_x["loss_unsup"]),
                               rtol=3e-4)
