#!/usr/bin/env python
"""Optimize a lens directly on its WAVEFRONT error.

The classical workflow optimizes geometric spot size; at the diffraction
limit the physical objective is the OPD across the pupil. Here Adam runs
on d(mean wavefront RMS)/d(c, t) through the differentiable trace ->
optical-path-length -> reference-sphere chain (`ops.wavefront`), and the
result is reported as Strehl per field. TPU-build superset — the reference
has no optical path lengths at all.

Example:
  python examples/optimize_wavefront.py --lens cooke --steps 60 --defocus 0.4
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


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--lens", default="cooke")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--defocus", type=float, default=0.4,
                    help="image-distance perturbation to recover from (mm)")
    ap.add_argument("--grid", type=int, default=11,
                    help="pupil grid side for the OPD sampling")
    ap.add_argument("--fields", type=float, nargs="+", default=(0.0, 0.7))
    args = ap.parse_args()

    from torchoptics_tpu import analysis, trace, zoo
    from torchoptics_tpu.ops import wavefront as wf

    specs, lens = zoo.build(args.lens)
    lens = lens.replace(t=lens.t.at[0, -1].add(args.defocus))

    n = args.grid
    g = np.linspace(-0.85, 0.85, n)
    X, Y = np.meshgrid(g, g, indexing="xy")
    xy = (jnp.asarray(X.ravel()[None, None, :, None], jnp.float32),
          jnp.asarray(Y.ravel()[None, None, :, None], jnp.float32))
    cfg = trace.TraceConfig(mode="circular", n_rays=(2, 2),
                            rel_fields=tuple(args.fields),
                            wavelengths=(520.0,), n_ray_aiming_iter=0,
                            engine="scan")
    lam = 520e-6

    def strehls(l):
        out = wf.opd_map(specs, l, cfg, xy=xy)
        vals = []
        for fi in range(len(args.fields)):
            opd = out["opd"][0, fi, :, 0]
            ok = out["ok"][0, fi, :, 0]
            # piston+tilt removed — same reference as the objective, so the
            # before/after Strehl is apples-to-apples (defocus counts).
            cz = wf.zernike_fit(opd, xy[0][0, 0, :, 0], xy[1][0, 0, :, 0],
                                ok, j_max=3)
            low = jnp.sum(wf.zernike_basis(3, xy[0][0, 0, :, 0],
                                           xy[1][0, 0, :, 0])
                          * cz[None, :], axis=-1)
            vals.append(float(wf.strehl_ratio(
                jnp.where(ok, opd - low, 0.0), ok, lam)))
        return vals

    from torchoptics_tpu import optimize as opt_mod
    from torchoptics_tpu import simulator as sim

    def wf_loss(specs_, lens_, config_, g_, catalog_g_, key_):
        w = analysis.wavefront_rms(specs_, lens_, cfg, xy=xy, remove_j=3)
        return w, {"wavefront_rms": w}

    opt = opt_mod.LensOptimizer(
        specs, sim.SimulatorConfig(trace_engine="scan"),
        learning_rate=args.lr, add_bfl=False, trainable=("c", "t"),
        efl_target=float(zoo.build(args.lens)[1].efl[0]), loss_fn=wf_loss)
    state = opt.init(lens)
    v0 = float(opt.loss(state.params)[0])
    print(f"{args.lens} +{args.defocus}mm defocus: "
          f"initial wavefront RMS {v0 / lam:.3f} waves, "
          f"Strehl {strehls(lens)}")
    for i in range(args.steps):
        state, v, _ = opt.step(state, None)
        if (i + 1) % max(1, args.steps // 6) == 0:
            print(f"  step {i + 1:4d}: wavefront RMS {float(v) / lam:.4f} waves")
    final = opt.build_lens(state.params)
    print(f"final: wavefront RMS {float(opt.loss(state.params)[0]) / lam:.4f}"
          f" waves, Strehl {strehls(final)}")


if __name__ == "__main__":
    main()
