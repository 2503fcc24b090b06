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
def test_fuzz_unroll_vs_scan_aggregate(seed):
    """Scan engine must produce the same aggregate stacks (and gradients
    through them) as the unrolled engine — no silent fallback."""
    rng = np.random.default_rng(400 + seed)
    specs, lens = random_system(rng)
    agg = trace.AGG_TORCH + ("z", "cos2", "cos2_prime")
    cfg_kw = dict(mode="circular", n_rays=(4, 4),
                  rel_fields=(0.0, 1.0), wavelengths=("d", "F"))

    def run(engine):
        return trace.trace_rays(
            specs, lens, trace.TraceConfig(engine=engine, **cfg_kw),
            aggregate=agg)

    r_u, r_s = run("unroll"), run("scan")
    S = lens.c.shape[1]
    for name in agg:
        expect_len = S + 1 if name == "z" else S
        assert r_s.stacks[name].shape[0] == expect_len, name
        # theta stacks pass through arccos, which is ill-conditioned near
        # cos = 1 — scan-vs-unroll fusion differences in cos2 amplify to
        # ~2e-5 abs there (real parity breaks are orders larger).
        atol = 5e-5 if name.startswith("theta") else 1e-6
        np.testing.assert_allclose(
            np.asarray(r_s.stacks[name]), np.asarray(r_u.stacks[name]),
            rtol=1e-5, atol=atol, err_msg=f"{seed}:{name}")

    def lu(c, engine):
        r = trace.trace_rays(
            specs, lens.replace(c=c),
            trace.TraceConfig(engine=engine, **cfg_kw),
            aggregate=trace.AGG_TORCH)
        from torchoptics_tpu import simulator as sim_mod
        return sim_mod.compute_loss_out(
            r, lens.structure.n_surfaces, 0.2)["loss_unsup"]

    g_u = jax.grad(lambda c: lu(c, "unroll"))(lens.c)
    g_s = jax.grad(lambda c: lu(c, "scan"))(lens.c)
    scale = np.abs(np.asarray(g_u)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_s) / scale,
                               np.asarray(g_u) / scale,
                               atol=2e-4, err_msg=str(seed))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_unroll_vs_scan_asphere(seed):
    """Scan engine on conic/asphere chains (incl. aggregate stacks and
    gradients through kappa) matches the unrolled Newton-intersection
    path."""
    rng = np.random.default_rng(600 + seed)
    specs, lens = random_system(rng)
    B, S = lens.c.shape
    lens = lens.replace(
        kappa=jnp.asarray(rng.uniform(-0.8, 0.4, (B, S)), jnp.float32),
        asph=jnp.asarray(rng.uniform(-1, 1, (B, S, 2))
                         * np.asarray([1e-5, 1e-8]), jnp.float32))
    cfg_kw = dict(mode="circular", n_rays=(4, 4),
                  rel_fields=(0.0, 1.0), wavelengths=("d", "F"))

    def run(engine):
        return trace.trace_rays(
            specs, lens, trace.TraceConfig(engine=engine, **cfg_kw),
            aggregate=trace.AGG_TORCH)

    r_u, r_s = run("unroll"), run("scan")
    np.testing.assert_array_equal(np.asarray(r_u.ray_ok),
                                  np.asarray(r_s.ray_ok), err_msg=str(seed))
    ok = np.asarray(r_u.ray_ok)
    if ok.any():
        np.testing.assert_allclose(np.asarray(r_s.y)[ok],
                                   np.asarray(r_u.y)[ok],
                                   rtol=1e-4, atol=1e-5, err_msg=str(seed))
    for name in trace.AGG_TORCH:
        np.testing.assert_allclose(
            np.asarray(r_s.stacks[name]), np.asarray(r_u.stacks[name]),
            rtol=1e-5, atol=1e-5, err_msg=f"{seed}:{name}")

    def lu(kap, engine):
        r = trace.trace_rays(
            specs, lens.replace(kappa=kap),
            trace.TraceConfig(engine=engine, **cfg_kw),
            aggregate=trace.AGG_TORCH)
        from torchoptics_tpu import simulator as sim_mod
        return sim_mod.compute_loss_out(
            r, lens.structure.n_surfaces, 0.2)["loss_unsup"]

    g_u = jax.grad(lambda k: lu(k, "unroll"))(lens.kappa)
    g_s = jax.grad(lambda k: lu(k, "scan"))(lens.kappa)
    scale = np.abs(np.asarray(g_u)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_s) / scale,
                               np.asarray(g_u) / scale,
                               atol=2e-4, err_msg=str(seed))


MIXED_BATCHES = [("GA", "GAGAAGA"), ("GAGA", "GAGGA"),
                 ("GA", "GAAGA", "GAGAAGA"), ("GAGAAGA", "GA", "GAGA")]


def random_mixed_batch(rng, seqs):
    """One padded Lens/Specs batch mixing different sequences, plus the
    equivalent per-system single lenses padded to the same width."""
    width = max(len(s) for s in seqs)
    stops = tuple(0 for _ in seqs)
    params = []
    for seq in seqs:
        S, G = len(seq), seq.count("G")
        c = rng.uniform(-0.08, 0.08, S).astype(np.float32)
        t = rng.uniform(0.5, 4.0, S).astype(np.float32)
        t[-1] = rng.uniform(5.0, 20.0)
        nd = rng.uniform(1.5, 1.9, G).astype(np.float32)
        v = rng.uniform(25.0, 65.0, G).astype(np.float32)
        params.append((c, t, nd, v))
    st = Structure(stops, tuple(seqs))
    cat = lambda i: jnp.asarray(np.concatenate([p[i] for p in params]))
    lens = Lens(st, cat(0), cat(1), cat(2), cat(3))
    epd = rng.uniform(1.0, 3.0, len(seqs)).astype(np.float32)
    hfov = rng.uniform(0.05, 0.3, len(seqs)).astype(np.float32)
    specs = Specs(st, jnp.asarray(epd), jnp.asarray(hfov))

    singles = []
    for i, seq in enumerate(seqs):
        st_i = Structure((stops[i],), (seq,), pad_to=width)
        c, t, nd, v = params[i]
        lens_i = Lens(st_i, jnp.asarray(c), jnp.asarray(t),
                      jnp.asarray(nd), jnp.asarray(v))
        specs_i = Specs(st_i, jnp.asarray(epd[i: i + 1]),
                        jnp.asarray(hfov[i: i + 1]))
        singles.append((specs_i, lens_i))
    return specs, lens, singles


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_heterogeneous_batch_loss(seed):
    """A padded batch mixing sequences (e.g. GA + GAGAAGA) must (a) agree
    between engines and (b) normalize each system's penalty Q by its OWN
    surface count — the batch loss equals the mean of per-system losses
    (reference per-sample semantics, `optical_loss.py:105-111`)."""
    from torchoptics_tpu import simulator as sim_mod
    rng = np.random.default_rng(500 + seed)
    seqs = MIXED_BATCHES[seed % len(MIXED_BATCHES)]
    specs, lens, singles = random_mixed_batch(rng, seqs)
    cfg_kw = dict(mode="circular", n_rays=(4, 4),
                  rel_fields=(0.0, 0.7, 1.0), wavelengths=("C", "d", "F"))
    rate = 0.2

    r_u = trace.trace_rays(specs, lens, trace.TraceConfig(**cfg_kw),
                           aggregate=trace.AGG_TORCH)
    r_s = trace.trace_rays(specs, lens,
                           trace.TraceConfig(engine="scan", **cfg_kw),
                           aggregate=trace.AGG_TORCH)
    np.testing.assert_array_equal(np.asarray(r_u.ray_ok),
                                  np.asarray(r_s.ray_ok))
    ld_batch = sim_mod.compute_loss_out(r_u, lens.structure.n_surfaces, rate)

    per_system = []
    for i, (specs_i, lens_i) in enumerate(singles):
        r_i = trace.trace_rays(specs_i, lens_i, trace.TraceConfig(**cfg_kw),
                               aggregate=trace.AGG_TORCH)
        # The padded single-system trace must reproduce its batch row.
        np.testing.assert_allclose(np.asarray(r_i.y)[0],
                                   np.asarray(r_u.y)[i],
                                   rtol=1e-5, atol=1e-6, err_msg=str((seed, i)))
        ld_i = sim_mod.compute_loss_out(
            r_i, lens_i.structure.n_surfaces, rate)
        per_system.append(ld_i["loss_unsup"])
    np.testing.assert_allclose(
        float(ld_batch["loss_unsup"]),
        float(np.mean([float(v) for v in per_system])),
        rtol=1e-5, err_msg=str(seed))


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


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_heterogeneous_full_loss_pallas(seed):
    """Mixed-sequence populations run the FULL weighted loss fused: a
    host-side group-by sequence, one batched-kernel launch per lens type,
    recombined with per-group weights B_g/B (VERDICT r2 #2). Values and
    gradients must match the XLA engine's whole-batch reductions."""
    from torchoptics_tpu import simulator as sim_mod
    rng = np.random.default_rng(700 + seed)
    seqs = MIXED_BATCHES[seed % len(MIXED_BATCHES)]
    specs, lens, _ = random_mixed_batch(rng, seqs)
    mk = lambda engine: sim_mod.SimulatorConfig(
        n_sampled_fields=3, n_pupil_rings=4, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(459.0, 520.0, 640.0),
        trace_engine=engine)
    tot_x, d_x = sim_mod.compute_losses(specs, lens, mk("unroll"))
    with pltpu.force_tpu_interpret_mode():
        tot_p, d_p = sim_mod.compute_losses(specs, lens, mk("pallas"))
    np.testing.assert_allclose(float(tot_p), float(tot_x), rtol=5e-4,
                               err_msg=str(seed))
    for k in d_x:
        np.testing.assert_allclose(float(d_p[k]), float(d_x[k]),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=f"{seed}:{k}")

    def total(c, engine):
        tot, _ = sim_mod.compute_losses(specs, lens.replace(c=c), mk(engine))
        return tot

    g_x = jax.grad(lambda c: total(c, "unroll"))(lens.c)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda c: total(c, "pallas"))(lens.c)
    # Compare REAL surface slots only: the padded XLA trace runs phantom
    # surfaces, so d/dc at padding slots is nonzero there, while the grouped
    # fused path traces each group at natural length (grad exactly 0 — the
    # reference's per-sample semantics). Padding slots are never trainable
    # (find_valid_curvatures masks them), so only real slots matter.
    m = lens.structure.mask
    assert np.all(np.asarray(g_p)[~m] == 0.0), str(seed)
    scale = np.abs(np.asarray(g_x)[m]).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_p)[m] / scale,
                               np.asarray(g_x)[m] / scale,
                               atol=1e-3, err_msg=str(seed))
