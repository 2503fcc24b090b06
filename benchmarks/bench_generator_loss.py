"""Benchmark the generator-training loss over a lens population.

Workload: the reference's neural-lens-design loss (`optical_loss.py:81-83`:
8 fields x 8x8 pupil rays x 3 wavelengths per sample), batched. Compares:

  * fused Pallas population kernel (grid over systems),
  * vmapped XLA engine,
  * (reference executes this as a serial Python loop per sample on torch;
    see tests/test_reference_parity.py for the oracle — it is orders of
    magnitude slower and not timed here.)

Usage: python benchmarks/bench_generator_loss.py [--batch 256]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.utils.backend import ensure_backend


def make_population(n, name="cooke", seed=0):
    from torchoptics_tpu import zoo
    from torchoptics_tpu.models.structure import Lens, Specs, Structure
    p = zoo.get_prescription(name)
    st = Structure(tuple(p["stop_idx"] * n), tuple(p["sequence"] * n))
    rng = np.random.default_rng(seed)
    c = np.tile(np.asarray(p["c"], np.float32), (n, 1))
    t = np.tile(np.asarray(p["t"], np.float32), (n, 1))
    c *= 1.0 + 0.02 * rng.standard_normal(c.shape).astype(np.float32)
    gpos = [i for i, ch in enumerate(p["sequence"][0]) if ch == "G"]
    nd = np.ones_like(c)
    v = np.ones_like(c)
    for gi, i in enumerate(gpos):
        nd[:, i] = p["nd"][gi]
        v[:, i] = p["v"][gi]
    lens = Lens(st, jnp.asarray(c), jnp.asarray(t), jnp.asarray(nd),
                jnp.asarray(v))
    base_specs, _ = zoo.build(name)
    specs = Specs(st, jnp.tile(base_specs.epd, n),
                  jnp.tile(base_specs.hfov, n))
    return specs, lens


def make_mixed_population(n, names=("cooke", "double_gauss"), seed=0):
    """Padded batch mixing lens types (the generator-curriculum shape,
    `optical_loss.py:99-122`): n/len(names) perturbed copies of each zoo
    prescription, padded to the widest sequence."""
    from torchoptics_tpu import zoo
    from torchoptics_tpu.models.structure import Lens, Specs, Structure
    rng = np.random.default_rng(seed)
    per = n // len(names)
    seqs, stops, cs, ts, nds, vs, epds, hfovs = ([] for _ in range(8))
    for name in names:
        p = zoo.get_prescription(name)
        base_specs, _ = zoo.build(name)
        c0 = np.asarray(p["c"], np.float32)
        t0 = np.asarray(p["t"], np.float32)
        nd0 = np.asarray(p["nd"], np.float32)
        v0 = np.asarray(p["v"], np.float32)
        for _ in range(per):
            seqs.append(p["sequence"][0])
            stops.append(p["stop_idx"][0])
            cs.append(c0 * (1 + 0.02 * rng.standard_normal(c0.shape)
                            ).astype(np.float32))
            ts.append(t0)
            nds.append(nd0)
            vs.append(v0)
            epds.append(float(base_specs.epd[0]))
            hfovs.append(float(base_specs.hfov[0]))
    st = Structure(tuple(stops), tuple(seqs))
    cat = lambda xs: jnp.asarray(np.concatenate(xs))
    lens = Lens(st, cat(cs), cat(ts), cat(nds), cat(vs))
    specs = Specs(st, jnp.asarray(epds, jnp.float32),
                  jnp.asarray(hfovs, jnp.float32))
    return specs, lens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    ensure_backend()

    from torchoptics_tpu import metrics, trace
    from torchoptics_tpu import simulator as sim
    from torchoptics_tpu.ops import pallas_batch as pb

    specs, lens = make_population(args.batch)
    # reference loss-bridge scale: 8 fields x 8x8 rays x 3 wavelengths
    cfg = sim.SimulatorConfig(n_sampled_fields=8, n_pupil_rings=8,
                              pupil_sampling="circular",
                              n_ray_aiming_iter=1,
                              wavelengths=(459.0, 520.0, 640.0))
    n_rays = args.batch * 8 * 64 * 3
    n_surf = int(lens.structure.n_surfaces[0])

    def lu_xla(c, t):
        l = lens.replace(c=c, t=t)
        res = trace.trace_rays(specs, l, cfg.trace_config(),
                               aggregate=trace.AGG_TORCH)
        rms = metrics.compute_rms2d(res.x, res.y, res.ray_ok)
        n_seq = len(lens.structure.sequence[0])
        Q = (jnp.sum(res.stacks["theta_norm"], 0)
             + jnp.sum(res.stacks["theta_prime_norm"], 0)
             + jnp.sum(res.stacks["z_RELU"], 0)) / n_seq
        return jnp.mean(rms + cfg.penalty_rate * jnp.sum(Q, axis=(1, 2, 3)))

    def lu_pallas(c, t):
        mean_lu, _ = pb.batched_unsupervised_loss(specs,
                                                  lens.replace(c=c, t=t), cfg)
        return mean_lu

    # Aspherized population (the generator superset): same batch with conic
    # + 2 even-asphere terms per surface, on the batched asphere kernel.
    rng = np.random.default_rng(1)
    B, S = lens.c.shape
    lens_a = lens.replace(
        kappa=jnp.asarray(rng.uniform(-0.3, 0.1, (B, S)), jnp.float32),
        asph=jnp.asarray(rng.uniform(-1, 1, (B, S, 2))
                         * np.asarray([1e-5, 1e-8]), jnp.float32))

    def lu_xla_asph(c, t):
        l = lens_a.replace(c=c, t=t)
        res = trace.trace_rays(specs, l, cfg.trace_config(),
                               aggregate=trace.AGG_TORCH)
        rms = metrics.compute_rms2d(res.x, res.y, res.ray_ok)
        n_seq = len(lens.structure.sequence[0])
        Q = (jnp.sum(res.stacks["theta_norm"], 0)
             + jnp.sum(res.stacks["theta_prime_norm"], 0)
             + jnp.sum(res.stacks["z_RELU"], 0)) / n_seq
        return jnp.mean(rms + cfg.penalty_rate * jnp.sum(Q, axis=(1, 2, 3)))

    def lu_pallas_asph(c, t):
        mean_lu, _ = pb.batched_unsupervised_loss(
            specs, lens_a.replace(c=c, t=t), cfg)
        return mean_lu

    # Mixed-sequence population (the generator-curriculum shape): cooke +
    # double-Gauss padded into one batch; the fused path is the host-side
    # group-by-sequence full loss (simulator.compute_losses with
    # trace_engine='pallas' — one batched-kernel launch per lens type).
    specs_m, lens_m = make_mixed_population(args.batch)
    mk = lambda e: sim.SimulatorConfig(
        n_sampled_fields=8, n_pupil_rings=8, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(459.0, 520.0, 640.0),
        trace_engine=e)

    def full_mixed_xla(c, t):
        tot, _ = sim.compute_losses(specs_m, lens_m.replace(c=c, t=t),
                                    mk("unroll"))
        return tot

    def full_mixed_pallas(c, t):
        tot, _ = sim.compute_losses(specs_m, lens_m.replace(c=c, t=t),
                                    mk("pallas"))
        return tot

    fns = [("xla", lens, lu_xla), ("xla-asphere", lens, lu_xla_asph),
           ("xla-mixed-full", lens_m, full_mixed_xla)]
    if jax.default_backend() == "tpu":
        fns.append(("pallas-batch", lens, lu_pallas))
        fns.append(("pallas-asphere", lens, lu_pallas_asph))
        fns.append(("pallas-mixed-full", lens_m, full_mixed_pallas))

    print(f"batch={args.batch} systems x {8 * 64 * 3} rays x {n_surf} "
          f"surfaces, device={jax.devices()[0]}")
    for name, l, f in fns:
        from torchoptics_tpu.utils.timing import time_step
        step = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
        best = time_step(step, (l.c, l.t))
        n_int = (n_rays * n_surf if l is lens else
                 8 * 64 * 3 * int(np.sum(l.structure.n_surfaces)))
        print(f"{name:18s} {best * 1e3:8.3f} ms/step  "
              f"{args.batch / best:8.0f} designs/s  "
              f"{n_int / best / 1e6:8.0f} Mint/s")


if __name__ == "__main__":
    main()
