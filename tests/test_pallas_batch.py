"""Population-batched fused kernel vs per-system XLA engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchoptics_tpu import metrics, trace, zoo
from torchoptics_tpu import simulator as sim
from torchoptics_tpu.models.structure import Lens, Specs, Structure
from torchoptics_tpu.ops import pallas_batch as pb

# Interpret-mode kernel parity is exhaustive and multi-minute; the fast
# profile (pytest -m 'not slow') keeps kernel coverage via the unmarked
# fuzz tests in test_fuzz_engines.py.
pytestmark = pytest.mark.slow


def _population(n=3, name="cooke", seed=0):
    """A batch of same-structure lenses with perturbed parameters."""
    p = zoo.get_prescription(name)
    st = Structure(tuple(p["stop_idx"] * n), tuple(p["sequence"] * n))
    rng = np.random.default_rng(seed)
    c = np.tile(np.asarray(p["c"], np.float32), (n, 1))
    t = np.tile(np.asarray(p["t"], np.float32), (n, 1))
    c *= 1.0 + 0.02 * rng.standard_normal(c.shape).astype(np.float32)
    gmask = [i for i, ch in enumerate(p["sequence"][0]) if ch == "G"]
    nd = np.ones((n, c.shape[1]), np.float32)
    v = np.ones((n, c.shape[1]), np.float32)
    for gi, i in enumerate(gmask):
        nd[:, i] = p["nd"][gi]
        v[:, i] = p["v"][gi]
    lens = Lens(st, jnp.asarray(c), jnp.asarray(t), jnp.asarray(nd),
                jnp.asarray(v))
    base_specs, base_lens = zoo.build(name)
    specs = Specs(st, jnp.tile(base_specs.epd, n),
                  jnp.tile(base_specs.hfov, n))
    return specs, lens


CFG = sim.SimulatorConfig(n_sampled_fields=3, n_pupil_rings=4,
                          pupil_sampling="circular", n_ray_aiming_iter=0,
                          wavelengths=(459.0, 520.0, 640.0))


def test_batched_forward_matches_xla():
    specs, lens = _population(3)
    cfg = CFG.trace_config()
    res_ref = trace.trace_rays(specs, lens, cfg)
    with pltpu.force_tpu_interpret_mode():
        _, ld = pb.batched_unsupervised_loss(specs, lens, CFG)
    res_agg = trace.trace_rays(specs, lens, cfg,
                               aggregate=trace.AGG_TORCH)
    rms_ref = metrics.compute_rms2d(res_ref.x, res_ref.y, res_ref.ray_ok)
    np.testing.assert_allclose(np.asarray(ld["rms"]), np.asarray(rms_ref),
                               rtol=1e-4, atol=1e-6)
    # penalty parity per system
    n_seq = len(lens.structure.sequence[0])
    Q = (jnp.sum(res_agg.stacks["theta_norm"], 0)
         + jnp.sum(res_agg.stacks["theta_prime_norm"], 0)
         + jnp.sum(res_agg.stacks["z_RELU"], 0)) / n_seq
    pen_ref = jnp.sum(Q, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(ld["penalty"]),
                               np.asarray(pen_ref), rtol=1e-4)


def test_batched_gradients_match_xla():
    specs, lens = _population(2)

    def lu_ref(c, t):
        l = lens.replace(c=c, t=t)
        res = trace.trace_rays(specs, l, CFG.trace_config(),
                               aggregate=trace.AGG_TORCH)
        rms = metrics.compute_rms2d(res.x, res.y, res.ray_ok)
        n_seq = len(lens.structure.sequence[0])
        Q = (jnp.sum(res.stacks["theta_norm"], 0)
             + jnp.sum(res.stacks["theta_prime_norm"], 0)
             + jnp.sum(res.stacks["z_RELU"], 0)) / n_seq
        Lu = rms + CFG.penalty_rate * jnp.sum(Q, axis=(1, 2, 3))
        return jnp.mean(Lu)

    def lu_pal(c, t):
        mean_lu, _ = pb.batched_unsupervised_loss(
            specs, lens.replace(c=c, t=t), CFG)
        return mean_lu

    v_ref, g_ref = jax.value_and_grad(lu_ref, argnums=(0, 1))(lens.c, lens.t)
    with pltpu.force_tpu_interpret_mode():
        v_pal, g_pal = jax.value_and_grad(lu_pal, argnums=(0, 1))(lens.c,
                                                                  lens.t)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-4)
    for a, b, name in zip(g_ref, g_pal, ("dc", "dt")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-2,
                                   err_msg=name)


def test_batched_systems_independent():
    """Each system's output must depend only on its own parameters."""
    specs, lens = _population(3)
    with pltpu.force_tpu_interpret_mode():
        _, ld0 = pb.batched_unsupervised_loss(specs, lens, CFG)
        # perturb only system 1
        c2 = lens.c.at[1].mul(1.05)
        _, ld1 = pb.batched_unsupervised_loss(specs, lens.replace(c=c2), CFG)
    rms0 = np.asarray(ld0["rms"])
    rms1 = np.asarray(ld1["rms"])
    np.testing.assert_allclose(rms1[0], rms0[0], rtol=1e-6)
    np.testing.assert_allclose(rms1[2], rms0[2], rtol=1e-6)
    assert abs(rms1[1] - rms0[1]) > 1e-6
