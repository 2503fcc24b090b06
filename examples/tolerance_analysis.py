#!/usr/bin/env python
"""Monte-Carlo tolerancing of a lens design in one fused kernel launch.

Tiles the design into a perturbed population, traces every sample in one
batched Pallas launch (W-outer fast path on TPU), and reports the RMS
spot-size distribution, manufacturing yield, the gradient-based sensitivity
table, and per-field MTF. TPU-build superset — the reference has no
tolerancing machinery.

Examples:
  python examples/tolerance_analysis.py --lens double_gauss --samples 4096
  python examples/tolerance_analysis.py --lens cooke --sigma-c 2e-4 \
      --sigma-t 0.02 --rms-threshold 0.01 --seed 7
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--lens", default="double_gauss",
                    help="zoo prescription name (default: double_gauss)")
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--sigma-c", type=float, default=1e-4,
                    help="curvature sigma, 1/mm")
    ap.add_argument("--sigma-t", type=float, default=0.01,
                    help="thickness sigma, mm")
    ap.add_argument("--sigma-nd", type=float, default=5e-4)
    ap.add_argument("--sigma-v", type=float, default=0.1)
    ap.add_argument("--rms-threshold", type=float, default=None,
                    help="spot-RMS spec (mm) for the yield estimate")
    ap.add_argument("--uniform", action="store_true",
                    help="uniform (half-width) instead of normal tolerances")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--engine", default=None, choices=(None, "pallas",
                                                       "unroll", "scan"),
                    help="trace engine (default: pallas on TPU, unroll off)")
    args = ap.parse_args()

    from torchoptics_tpu import analysis, simulator as sim, zoo

    on_tpu = jax.default_backend() == "tpu"
    engine = args.engine or ("pallas" if on_tpu else "unroll")
    specs, lens = zoo.build(args.lens)
    config = sim.SimulatorConfig(
        n_sampled_fields=5, n_pupil_rings=8, pupil_sampling="circular",
        n_ray_aiming_iter=1, wavelengths=(459.0, 520.0, 640.0),
        psf_shape=(33, 33), psf_abs_pixel_size=4e-3, trace_engine=engine)
    tol = analysis.Tolerances(
        c=args.sigma_c, t=args.sigma_t, nd=args.sigma_nd, v=args.sigma_v,
        distribution="uniform" if args.uniform else "normal")

    run = jax.jit(lambda k, comp: analysis.tolerance_analysis(
        specs, lens, config, tol, args.samples, k,
        rms_threshold=args.rms_threshold, compensator=comp),
        static_argnums=1)
    key = jax.random.key(args.seed)
    out = run(key, None)
    # Classical tolerancing convention: back-focus is the universal free
    # compensator — every sample is re-focused (closed-form least-squares
    # image shift) before scoring. Uncompensated yields are what a rigid
    # as-built stack would show; compensated is what a manufacturer sees.
    out_c = run(key, "refocus")

    print(f"{args.lens}: {args.samples} perturbed samples, engine={engine}")
    print(f"  {'':24s} {'nominal focus':>14s} {'refocused':>14s}")
    print(f"  {'nominal RMS':24s} {float(out['nominal_rms']):14.5f} "
          f"{float(out_c['nominal_rms']):14.5f}")
    print(f"  {'mean':24s} {float(out['mean']):14.5f} "
          f"{float(out_c['mean']):14.5f}")
    print(f"  {'std':24s} {float(out['std']):14.5f} "
          f"{float(out_c['std']):14.5f}")
    for q in (50, 90, 99):
        print(f"  {f'p{q}':24s} {float(out[f'p{q}']):14.5f} "
              f"{float(out_c[f'p{q}']):14.5f}")
    if args.rms_threshold is not None:
        print(f"  {f'yield(RMS<={args.rms_threshold})':24s} "
              f"{float(out['yield_fraction']) * 100:13.1f}% "
              f"{float(out_c['yield_fraction']) * 100:13.1f}%")
    d = np.asarray(out_c["refocus_delta"][1:])
    print(f"  refocus shifts: mean |dz| {np.abs(d).mean():.4f} mm, "
          f"max |dz| {np.abs(d).max():.4f} mm")

    sens = analysis.sensitivities(specs, lens, config)
    np.set_printoptions(precision=3, suppress=False, linewidth=120)
    print("\nSensitivity d(RMS)/d(param), per surface:")
    for k in ("c", "t", "nd", "v"):
        print(f"  {k:3}", np.asarray(sens[k])[0])

    mtf = analysis.field_mtf(specs, lens, config)
    f = np.asarray(mtf["freqs_t"])
    # report tangential MTF at ~25 and ~50 cyc/mm, green channel
    for target in (25.0, 50.0):
        i = int(np.argmin(np.abs(f - target)))
        vals = np.asarray(mtf["mtf_t"][:, 1, i])
        print(f"MTF_t @ {f[i]:5.1f} cyc/mm per field: "
              + " ".join(f"{v:.3f}" for v in vals))

    # Wave picture: on-axis OPD -> Zernikes -> Strehl (ops.wavefront).
    from torchoptics_tpu.ops import trace as trace_mod
    from torchoptics_tpu.ops import wavefront as wfront
    n = 15
    g = np.linspace(-0.9, 0.9, n)
    X, Y = np.meshgrid(g, g, indexing="xy")
    xr = jax.numpy.asarray(X.ravel()[None, None, :, None],
                           jax.numpy.float32)
    yr = jax.numpy.asarray(Y.ravel()[None, None, :, None],
                           jax.numpy.float32)
    cfg0 = trace_mod.TraceConfig(mode="circular", n_rays=(2, 2),
                                 rel_fields=(0.0,), wavelengths=(520.0,),
                                 n_ray_aiming_iter=0)
    out_w = wfront.opd_map(specs, lens, cfg0, xy=(xr, yr))
    opd = out_w["opd"][0, 0, :, 0]
    ok = out_w["ok"][0, 0, :, 0] & jax.numpy.asarray(
        ((X ** 2 + Y ** 2) <= 1.0).ravel())
    lam = 520e-6
    cz = wfront.zernike_fit(opd, xr[0, 0, :, 0], yr[0, 0, :, 0], ok)
    low = wfront.zernike_basis(4, xr[0, 0, :, 0], yr[0, 0, :, 0]) @ cz[:4]
    s = float(wfront.strehl_ratio(
        jax.numpy.where(ok, opd - low, 0.0), ok, lam))
    print(f"\nOn-axis wavefront @ 520nm: Strehl {s:.3f} "
          f"(piston/tilt/defocus removed); Z11 spherical "
          f"{float(cz[10]) / lam:+.3f} waves")


if __name__ == "__main__":
    main()
