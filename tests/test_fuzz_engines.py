"""Seeded fuzz: engine agreement over random valid lens systems.

Random (but physically bounded) sequences, curvatures, thicknesses, glasses,
stops, and pupils — the unrolled engine is the reference; scan and the
Pallas kernels (interpret mode) must agree on coordinates, masks, and
gradients. Catches parity drift in regions the fixed prescriptions miss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchoptics_tpu import metrics, trace
from torchoptics_tpu.models.structure import Lens, Specs, Structure

SEQUENCES = ["GA", "GAGA", "GAAGA", "GAGAAGA", "GAGGA"]


def random_system(rng):
    seq = SEQUENCES[rng.integers(len(SEQUENCES))]
    S = len(seq)
    stop = int(rng.integers(0, S))
    st = Structure((stop,), (seq,))
    n_glass = seq.count("G")
    c = rng.uniform(-0.08, 0.08, S).astype(np.float32)
    t = rng.uniform(0.5, 4.0, S).astype(np.float32)
    t[-1] = rng.uniform(5.0, 20.0)
    nd = rng.uniform(1.5, 1.9, n_glass).astype(np.float32)
    v = rng.uniform(25.0, 65.0, n_glass).astype(np.float32)
    lens = Lens(st, jnp.asarray(c), jnp.asarray(t), jnp.asarray(nd),
                jnp.asarray(v))
    epd = float(rng.uniform(1.0, 4.0))
    hfov = float(rng.uniform(0.05, 0.4))
    specs = Specs(st, jnp.asarray([epd]), jnp.asarray([hfov]))
    return specs, lens


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_unroll_vs_scan(seed):
    rng = np.random.default_rng(seed)
    specs, lens = random_system(rng)
    cfg_kw = dict(mode="circular", n_rays=(4, 5),
                  rel_fields=(0.0, 0.6, 1.0), wavelengths=("C", "d", "F"))
    r_u = trace.trace_rays(specs, lens, trace.TraceConfig(engine="unroll",
                                                          **cfg_kw))
    r_s = trace.trace_rays(specs, lens, trace.TraceConfig(engine="scan",
                                                          **cfg_kw))
    np.testing.assert_array_equal(np.asarray(r_u.ray_ok),
                                  np.asarray(r_s.ray_ok), err_msg=str(seed))
    ok = np.asarray(r_u.ray_ok)
    np.testing.assert_allclose(np.asarray(r_s.y)[ok], np.asarray(r_u.y)[ok],
                               rtol=1e-4, atol=1e-5, err_msg=str(seed))


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_pallas_forward_and_grad(seed):
    rng = np.random.default_rng(100 + seed)
    specs, lens = random_system(rng)
    cfg = trace.TraceConfig(mode="circular", n_rays=(4, 4),
                            rel_fields=(0.0, 1.0), wavelengths=("d", "F"))
    from torchoptics_tpu.ops import pallas_trace as pt
    r_u = trace.trace_rays(specs, lens, cfg)
    with pltpu.force_tpu_interpret_mode():
        r_p = pt.trace_rays_fused(specs, lens, cfg)
    np.testing.assert_array_equal(np.asarray(r_u.ray_ok),
                                  np.asarray(r_p.ray_ok), err_msg=str(seed))
    ok = np.asarray(r_u.ray_ok)
    if ok.any():
        np.testing.assert_allclose(np.asarray(r_p.y)[ok],
                                   np.asarray(r_u.y)[ok],
                                   rtol=1e-4, atol=1e-5, err_msg=str(seed))

    def loss(c, engine):
        l = lens.replace(c=c)
        r = (pt.trace_rays_fused(specs, l, cfg) if engine == "p"
             else trace.trace_rays(specs, l, cfg))
        return metrics.compute_rms2d(r.x, r.y, r.ray_ok)[0]

    g_u = jax.grad(lambda c: loss(c, "u"))(lens.c)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda c: loss(c, "p"))(lens.c)
    scale = np.abs(np.asarray(g_u)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_p) / scale,
                               np.asarray(g_u) / scale,
                               atol=2e-4, err_msg=str(seed))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_asphere_engine_vs_kernel(seed):
    rng = np.random.default_rng(200 + seed)
    specs, lens0 = random_system(rng)
    S = lens0.c.shape[1]
    kappa = rng.uniform(-0.8, 0.4, (1, S)).astype(np.float32)
    asph = (rng.uniform(-1, 1, (1, S, 2)) * np.asarray([1e-5, 1e-8])
            ).astype(np.float32)
    lens = lens0.replace(kappa=jnp.asarray(kappa), asph=jnp.asarray(asph))
    cfg = trace.TraceConfig(mode="circular", n_rays=(4, 4),
                            rel_fields=(0.0, 1.0), wavelengths=("d",))
    from torchoptics_tpu.ops import pallas_asphere as pa
    r_u = trace.trace_rays(specs, lens, cfg)
    with pltpu.force_tpu_interpret_mode():
        r_p = pa.trace_rays_fused_asphere(specs, lens, cfg)
    np.testing.assert_array_equal(np.asarray(r_u.ray_ok),
                                  np.asarray(r_p.ray_ok), err_msg=str(seed))
    ok = np.asarray(r_u.ray_ok)
    if ok.any():
        np.testing.assert_allclose(np.asarray(r_p.y)[ok],
                                   np.asarray(r_u.y)[ok],
                                   rtol=1e-4, atol=2e-5, err_msg=str(seed))
