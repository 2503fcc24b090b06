#!/usr/bin/env python
"""Train a neural lens-design generator against the unsupervised optical loss.

This is the end-to-end purpose of the reference framework (a port of the
joint-lens-design pipeline, arXiv:2212.04441): a small MLP maps lens
specifications (EPD, HFOV) to design vectors (glass g-pairs, curvatures,
thicknesses); the differentiable ray tracer scores each design by spot RMS +
physical penalties; gradients flow through the trace back into the network.
The reference's own training stack is non-functional (missing external
packages, serial per-sample loss loop); here the whole batch trains in one
jitted step.

Usage:
  python examples/train_generator.py --steps 300 --batch 32
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def init_mlp(key, sizes):
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        params.append({
            "w": jax.random.normal(k1, (din, dout)) * (2.0 / din) ** 0.5,
            "b": jnp.zeros(dout),
        })
    return params


def mlp(params, x):
    for layer in params[:-1]:
        x = jax.nn.gelu(x @ layer["w"] + layer["b"])
    last = params[-1]
    return x @ last["w"] + last["b"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lens-type", default="GA")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--penalty-rate", type=float, default=0.2,
                    help="Lu penalty weight (reference default 0.2). The "
                    "stock rate lets the penalty sum dominate the spot "
                    "term over long runs — training loss keeps falling "
                    "while generated designs' spot RMS degrades (same "
                    "pathology RESULTS.md documents for refine_flagship); "
                    "drop it for spot-quality-focused training")
    ap.add_argument("--metric", default="y", choices=("y", "xy"),
                    help="spot metric: 'y' = reference parity (blind to "
                    "sagittal blur), 'xy' = radial 2-D (use for real runs)")
    ap.add_argument("--engine", default=None, choices=(None, "xla", "pallas"),
                    help="loss engine (default: pallas fused batch kernel "
                    "on TPU, vmapped XLA off)")
    ap.add_argument("--eval-designs", type=int, default=256,
                    help="designs sampled for the post-training quality "
                    "distribution (0 disables)")
    ap.add_argument("--snap-glass", action="store_true",
                    help="quantize glass to the Ohara catalog INSIDE "
                    "training (straight-through gradient, "
                    "glass.quantize_glass_st) so the generator optimizes "
                    "the same catalog-snapped designs the eval scores — "
                    "without it, trained g-vectors drift off-catalog and "
                    "the snapped distribution degrades even as the "
                    "training loss falls")
    args = ap.parse_args()

    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()
    from torchoptics_tpu.loss import OpticalLoss
    from torchoptics_tpu.models import glass as glass_mod

    on_tpu = jax.default_backend() == "tpu"
    engine = args.engine or ("pallas" if on_tpu else "xla")
    ol = OpticalLoss(args.lens_type, n_sampled_fields=4, n_pupil_rings=6,
                     spot_metric=args.metric,
                     penalty_rate=args.penalty_rate)
    G, S = ol.numglass, ol.numsurf
    n_out = ol.numout

    key = jax.random.PRNGKey(args.seed)
    key, knet = jax.random.split(key)
    net = init_mlp(knet, (2, args.hidden, args.hidden, n_out))

    # Output heads start near a sane design: glass near the catalog center,
    # curvature near 0.3 (EFL-1 scale), thicknesses ~0.2.
    base = np.zeros(n_out, np.float32)
    base[2 * G: 2 * G + S - 1] = 0.3
    base[2 * G + S - 1:] = 0.2
    base = jnp.asarray(base)

    def sample_specs(key, n):
        kepd, khfov = jax.random.split(key)
        epd = jax.random.uniform(kepd, (n,), minval=0.15, maxval=0.35)
        hfov = jax.random.uniform(khfov, (n,), minval=0.2, maxval=0.45)
        return epd, hfov

    catalog_g_train = glass_mod.default_catalog_g()

    def snap_outputs_st(outputs):
        n = outputs.shape[0]
        g_q = glass_mod.quantize_glass_st(
            outputs[:, : 2 * G].reshape(-1, 2), catalog_g_train)
        return jnp.concatenate([g_q.reshape(n, 2 * G),
                                outputs[:, 2 * G:]], axis=1)

    def batch_loss(net_params, key):
        epd, hfov = sample_specs(key, args.batch)
        inputs = jnp.stack([epd, hfov], axis=1)
        outputs = mlp(net_params, inputs) * 0.1 + base
        if args.snap_glass:
            outputs = snap_outputs_st(outputs)
        # engine='pallas': the whole population traces fwd+bwd in ONE fused
        # batch kernel launch; 'xla': vmapped per-sample XLA engine.
        lu, _, _ = ol.unsupervised(inputs, outputs, stop_idx=1,
                                   engine=engine)
        return lu

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(net)

    @jax.jit
    def train_step(net_params, opt_state, key):
        loss, grads = jax.value_and_grad(batch_loss)(net_params, key)
        # generator training can hit non-finite designs early on
        finite = jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(g))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, net_params)
        net_params = optax.apply_updates(net_params, updates)
        return net_params, opt_state, loss

    print(f"training {args.lens_type} generator: batch={args.batch}, "
          f"metric={args.metric}, engine={engine}, "
          f"device={jax.devices()[0]}")
    first = loss = float("nan")
    for i in range(args.steps):
        key, k = jax.random.split(key)
        net, opt_state, loss = train_step(net, opt_state, k)
        if i == 0:
            first = float(loss)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i:5d}: loss={float(loss):.5f}", flush=True)
    print(f"final loss {float(loss):.5f} (from {first:.5f})")

    if args.eval_designs > 0:
        # Design-quality distribution of the trained generator: sample
        # specs, generate designs, snap glass to the Ohara catalog, rebuild
        # and score both spot metrics (the paper's actual deliverable is
        # the design distribution, not the train loss).
        from torchoptics_tpu.models import glass as glass_mod
        from torchoptics_tpu.ops import metrics as metrics_mod
        from torchoptics_tpu.ops import trace as trace_mod

        key, keval = jax.random.split(key)
        epd, hfov = sample_specs(keval, args.eval_designs)
        inputs = jnp.stack([epd, hfov], axis=1)
        outputs = mlp(net, inputs) * 0.1 + base

        catalog_g = glass_mod.default_catalog_g()
        g = np.asarray(outputs[:, : 2 * G]).reshape(-1, 2)
        g_snap = glass_mod.map_glass_to_closest(jnp.asarray(g), catalog_g)
        outputs_snap = jnp.concatenate(
            [jnp.asarray(g_snap).reshape(args.eval_designs, 2 * G),
             outputs[:, 2 * G:]], axis=1)

        @jax.jit
        def score(specs_b, lens_b):
            cfg = ol._sim_config().trace_config()
            res = trace_mod.trace_rays(specs_b, lens_b, cfg)
            rms_y = metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)
            rms_xy = jnp.mean(metrics_mod.compute_spot_rms_xy(
                res.x, res.y, res.ray_ok), axis=1)
            frac_ok = jnp.mean(res.ray_ok.astype(jnp.float32),
                               axis=(1, 2, 3))
            return rms_y, rms_xy, frac_ok

        for label, outs in (("catalog-snapped glass", outputs_snap),
                            ("raw (unsnapped) glass", outputs)):
            specs_b, lens_b = ol.build_batch(inputs, outs, stop_idx=1)
            rms_y, rms_xy, frac_ok = map(np.asarray, score(specs_b, lens_b))
            valid = np.isfinite(rms_xy) & (frac_ok > 0.5)
            print(f"\ndesign-quality distribution ({args.eval_designs} "
                  f"specs, {label}; {valid.mean() * 100:.0f}% trace "
                  f">50% of rays):")
            for name, v in (("rms_y", rms_y[valid]),
                            ("rms_xy", rms_xy[valid])):
                if v.size == 0:
                    print(f"  {name}: no valid designs")
                    continue
                q = np.percentile(v, (10, 50, 90))
                print(f"  {name}  p10 {q[0]:.5f}  p50 {q[1]:.5f}  "
                      f"p90 {q[2]:.5f}  (EFL=1 units)")


if __name__ == "__main__":
    main()
