#!/usr/bin/env python
"""Multi-start refinement of a lens design against mean spot RMS.

This is the recipe that produced the shipped double-Gauss flagships
(``zoo.DOUBLE_GAUSS``: 0.0034 mm polychromatic RMS at f/2, and
``zoo.DOUBLE_GAUSS_ASPH``: 0.0011 mm with conic + r^4/r^6 terms): a
population of perturbed copies of the starting design is optimized
simultaneously — one batched trace per step on one chip — against

    mean spot RMS
    + 1e-4 * Lu penalty (keeps geometry away from ray failure)
    + hinge(min thickness >= --min-t)
    + 0.1 * hinge(image clearance >= --min-image)
    + 0.01 * hinge(total track <= --max-track)

with catalog glass frozen and EFL pinned by the last-curvature solve.
The best valid member is then polished solo with denser sampling.

Note: the stock unsupervised objective Lu alone (penalty_rate 0.2) will
happily DIVERGE an already-good design — its angle/path penalty sum
dominates the spot term; this script's explicit constraint hinges are the
honest refinement objective.

Examples:
  python examples/refine_flagship.py --lens double_gauss --steps 25000
  python examples/refine_flagship.py --lens double_gauss --aspherize \
      --steps 30000 --save out.json
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lens", default="double_gauss")
    ap.add_argument("--pop", type=int, default=24)
    ap.add_argument("--steps", type=int, default=25000)
    ap.add_argument("--polish-steps", type=int, default=12000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--min-t", type=float, default=0.8)
    ap.add_argument("--min-image", type=float, default=12.0)
    ap.add_argument("--max-track", type=float, default=110.0)
    ap.add_argument("--aspherize", action="store_true",
                    help="add conic + r^4/r^6 terms (population of 1)")
    ap.add_argument("--metric", default="y", choices=("y", "xy"),
                    help="spot metric: 'y' = reference-parity Y-deviation "
                         "RMS; 'xy' = radial 2-D RMS (sees sagittal blur)")
    ap.add_argument("--save", default=None, help="write the result as JSON")
    args = ap.parse_args()

    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp
    import optax
    from torchoptics_tpu import metrics, optimize as opt, trace, zoo
    from torchoptics_tpu.models import glass as glass_mod
    from torchoptics_tpu.models.structure import Lens, Specs, Structure

    rng = np.random.default_rng(11)
    p = zoo.get_prescription(args.lens)
    base_specs, base_lens = zoo.build(args.lens)
    S = base_lens.c.shape[1]
    B = 1 if args.aspherize else args.pop
    st = Structure(tuple(p["stop_idx"] * B), tuple(p["sequence"] * B))
    tile = lambda v: np.tile(np.asarray(v, np.float32)[None, 0], (B, 1))
    c0, t0 = tile(base_lens.c), tile(base_lens.t)
    sig = np.resize(np.repeat([0.0, 0.002, 0.005, 0.01, 0.02, 0.04], 4), B)
    c = (c0 * (1 + sig[:, None] * rng.standard_normal((B, S)))
         ).astype(np.float32)
    t = np.maximum(t0 * (1 + 0.5 * sig[:, None]
                         * rng.standard_normal((B, S))).astype(np.float32),
                   1.0)
    kw = {}
    if args.aspherize:
        kw = dict(kappa=jnp.zeros((B, S), jnp.float32),
                  asph=jnp.zeros((B, S, 2), jnp.float32))
    lens = Lens(st, jnp.asarray(c), jnp.asarray(t),
                tile(base_lens.nd), tile(base_lens.v), **kw)
    specs = Specs(st, jnp.tile(base_specs.epd, B),
                  jnp.tile(base_specs.hfov, B))
    efl_target = float(base_lens.efl[0])
    catalog_g = glass_mod.default_catalog_g()

    train_cfg = trace.TraceConfig(
        mode="circular", n_rays=(10, 10),
        rel_fields=(0.0, 0.45, 0.707, 0.88, 1.0),
        wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=1)
    eval_cfg = trace.TraceConfig(
        mode="circular", n_rays=(10, 10), rel_fields=(0.0, 0.707, 1.0),
        wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=1)

    def make_problem(st_, specs_, cfg):
        def build(params):
            l = opt.lens_from_normalized(st_, params, catalog_g,
                                         add_bfl=True, qc_variables=True)
            return l.scale(efl_target / l.efl)

        def loss_fn(params):
            l = build(params)
            res = trace.trace_rays(specs_, l, cfg,
                                   aggregate=trace.AGG_TORCH)
            rms = metrics.compute_spot_rms(res.x, res.y, res.ray_ok,
                                           args.metric)
            nseq = jnp.asarray(st_.n_surfaces, rms.dtype)
            Q = (jnp.sum(res.stacks["theta_norm"], 0)
                 + jnp.sum(res.stacks["theta_prime_norm"], 0)
                 + jnp.sum(res.stacks["z_RELU"], 0))
            sumQ = jnp.sum(Q, axis=(1, 2, 3)) / nseq
            tmin_pen = jnp.sum(jnp.maximum(args.min_t - l.t, 0.0) ** 2,
                               axis=1)
            bfl_pen = jnp.maximum(args.min_image - l.t[:, -1], 0.0) ** 2
            track_pen = jnp.maximum(jnp.sum(l.t, axis=1) - args.max_track,
                                    0.0) ** 2
            return jnp.mean(rms + 1e-4 * sumQ + tmin_pen + 0.1 * bfl_pen
                            + 0.01 * track_pen)
        return build, loss_fn

    @jax.jit
    def evaluate(l, s):
        res = trace.trace_rays(s, l, eval_cfg)
        rms = metrics.compute_spot_rms(res.x, res.y, res.ray_ok, args.metric)
        okf = jnp.mean(res.ray_ok.astype(jnp.float32), axis=(1, 2, 3))
        return rms, okf

    @jax.jit
    def evaluate_both(l, s):
        """Final report: y-only (reference parity) AND radial xy, plus the
        field-edge xy RMS the y-metric is blind to."""
        res = trace.trace_rays(s, l, eval_cfg)
        rms_y = metrics.compute_rms2d(res.x, res.y, res.ray_ok)
        rms_xy_f = metrics.compute_spot_rms_xy(res.x, res.y, res.ray_ok)
        return rms_y, jnp.mean(rms_xy_f, axis=1), rms_xy_f[:, -1]

    def run(st_, specs_, lens_, steps, lr, cfg):
        build, loss_fn = make_problem(st_, specs_, cfg)
        params = opt.get_normalized_lens_variables(lens_, add_bfl=True)
        tx = optax.adam(lr)
        ostate = tx.init(params)

        @jax.jit
        def step(params, ostate):
            val, grads = jax.value_and_grad(loss_fn)(params)
            grads["g"] = jnp.zeros_like(grads["g"])  # glass frozen
            finite = jnp.isfinite(val)
            for gg in jax.tree_util.tree_leaves(grads):
                finite = finite & jnp.all(jnp.isfinite(gg))
            grads = jax.tree_util.tree_map(
                lambda a: jnp.where(finite, a, 0.0), grads)
            upd, ostate2 = tx.update(grads, ostate, params)
            params2 = optax.apply_updates(params, upd)
            keep = lambda n_, o_: jax.tree_util.tree_map(
                lambda a, b_: jnp.where(finite, a, b_), n_, o_)
            return keep(params2, params), keep(ostate2, ostate), val

        # Keep the best-seen snapshot (by the eval metric over valid
        # members) rather than the last step — Adam can wander off a
        # minimum late in a long run, which is exactly what the final
        # 12k-step polish did on the first xy refinement (0.0205 ->
        # 0.0230 mean xy at the last step).
        eval_every = max(100, min(500, steps // 50 or 1))
        best_score, best_params = np.inf, params
        for i in range(steps):
            params, ostate, val = step(params, ostate)
            if i % 2500 == 0:
                print(f"  step {i}: loss={float(val):.6f}", flush=True)
            if (i + 1) % eval_every == 0 or i + 1 == steps:
                l = build(params)
                rms_e, okf_e = map(np.asarray, evaluate(l, specs_))
                t_ = np.asarray(l.t)
                valid = ((okf_e >= 1.0) & (t_.min(axis=1) > 0.5)
                         & (t_[:, -1] > args.min_image - 1.0)
                         & np.isfinite(rms_e))
                score = float(np.min(np.where(valid, rms_e, np.inf)))
                if score < best_score:
                    best_score, best_params = score, params
        if np.isfinite(best_score):
            return build(best_params)
        return build(params)

    t0_ = time.time()
    lens_out = run(st, specs, lens, args.steps, args.lr, train_cfg)
    rms, okf = map(np.asarray, evaluate(lens_out, specs))
    tmin = np.asarray(lens_out.t).min(axis=1)
    tlast = np.asarray(lens_out.t)[:, -1]
    valid = ((okf >= 1.0) & (tmin > 0.5) & (tlast > args.min_image - 1.0)
             & np.isfinite(rms))
    best = int(np.argsort(np.where(valid, rms, np.inf))[0])
    print(f"best member {best}: rms={rms[best]:.5f} "
          f"(member 0 = unperturbed: {rms[0]:.5f}) "
          f"[{time.time() - t0_:.0f}s]", flush=True)

    # Polish the best member solo with denser sampling.
    st1 = Structure(tuple(p["stop_idx"]), tuple(p["sequence"]))
    sel = lambda a: jnp.asarray(np.asarray(a)[best])
    mg = np.asarray(st1.mask_G[0])
    kw = {}
    if lens_out.kappa is not None:
        kw = dict(kappa=sel(lens_out.kappa)[None],
                  asph=sel(lens_out.asph)[None])
    bl = Lens(st1, sel(lens_out.c), sel(lens_out.t),
              jnp.asarray(np.asarray(lens_out.nd)[best][mg]),
              jnp.asarray(np.asarray(lens_out.v)[best][mg]), **kw)
    sp1 = Specs(st1, base_specs.epd, base_specs.hfov)
    polish_cfg = trace.TraceConfig(
        mode="circular", n_rays=(14, 14),
        rel_fields=(0.0, 0.3, 0.55, 0.707, 0.85, 1.0),
        wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=1)
    final = run(st1, sp1, bl, args.polish_steps, args.lr / 4, polish_cfg)
    rms1, okf1 = evaluate(final, sp1)
    ry, rxy, rxy_edge = map(np.asarray, evaluate_both(final, sp1))
    print(f"FINAL rms({args.metric})={float(rms1[0]):.6f} "
          f"ok={float(okf1[0]):.4f} "
          f"efl={float(final.efl[0]):.4f} tmin={float(final.t.min()):.3f} "
          f"t_last={float(final.t[0, -1]):.3f}")
    print(f"FINAL metrics: rms_y={float(ry[0]):.6f} "
          f"rms_xy={float(rxy[0]):.6f} rms_xy_edge={float(rxy_edge[0]):.6f}")
    if args.save:
        out = dict(c=np.asarray(final.flat_c).tolist(),
                   t=np.asarray(final.flat_t).tolist(),
                   nd=np.asarray(final.flat_nd).tolist(),
                   v=np.asarray(final.flat_v).tolist())
        if final.kappa is not None:
            out["kappa"] = np.asarray(final.kappa[0]).tolist()
            out["asph"] = np.asarray(final.asph[0]).tolist()
        json.dump(out, open(args.save, "w"))
        print("saved", args.save)


if __name__ == "__main__":
    main()
