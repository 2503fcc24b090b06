#!/usr/bin/env python
"""Image-quality report card for a lens design.

Prints, per relative field: the reference-parity Y-deviation spot RMS
(`compute_rms2d` — `ray_tracing_lite.py:678-702` semantics), the radial
2-D spot RMS (sees the sagittal blur the y-metric is blind to), and the
monochromatic Strehl ratio at the d-line from the exact-OPD wavefront
(`ops.wavefront`). This is the evaluation used to compare flagship
candidates in RESULTS.md.

Examples:
  python examples/flagship_report.py --lens double_gauss
  python examples/flagship_report.py --lens double_gauss --design out.json
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lens", default="double_gauss",
                    help="zoo prescription supplying structure/specs")
    ap.add_argument("--design", default=None,
                    help="JSON with c/t/nd/v (+kappa/asph) overriding the "
                         "zoo parameters (refine_flagship.py --save output)")
    ap.add_argument("--fields", default="0,0.45,0.707,0.88,1.0")
    ap.add_argument("--no-vignetting", action="store_true",
                    help="skip the aperture model (solved vignetting "
                    "factors + relative illumination columns)")
    args = ap.parse_args()

    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp
    from torchoptics_tpu import metrics, trace, zoo
    from torchoptics_tpu.ops import wavefront as wf

    p = zoo.get_prescription(args.lens)
    if args.design:
        d = json.load(open(args.design))
        for k in ("c", "t", "nd", "v", "kappa", "asph"):
            if k in d:
                p[k] = d[k]
            elif k in p and k in ("kappa", "asph"):
                del p[k]
    specs, lens = zoo.build(p)

    fields = tuple(float(f) for f in args.fields.split(","))
    cfg = trace.TraceConfig(
        mode="circular", n_rays=(24, 24), rel_fields=fields,
        wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=1)
    wf_cfg = trace.TraceConfig(
        mode="circular", n_rays=(24, 24),
        rel_fields=fields, wavelengths=(520.0,), n_ray_aiming_iter=1)
    # Explicit pupil grid for the wavefront pass so per-field piston+tilt
    # (Noll Z1-Z3: a pure image-point displacement — distortion, not blur)
    # can be Zernike-fitted and removed before the Strehl sum. Defocus and
    # everything above stay in: this is the planar-sensor Strehl.
    ng = 24
    gg = np.linspace(-0.95, 0.95, ng)
    GX, GY = np.meshgrid(gg, gg, indexing="xy")
    in_pupil = (GX ** 2 + GY ** 2) <= 1.0
    gxr = jnp.asarray(GX.ravel()[None, None, :, None], jnp.float32)
    gyr = jnp.asarray(GY.ravel()[None, None, :, None], jnp.float32)

    def rms_y_per_field(y, ray_ok):
        # compute_rms2d semantics (`ray_tracing_lite.py:678-702`) without
        # the final field mean: all-ray centroid, valid-ray deviations.
        B, F, P, W = ray_ok.shape
        y = jnp.broadcast_to(y, (B, F, P, W))
        ymean = jnp.mean(jnp.mean(y, axis=2), axis=-1)
        dev2 = jnp.where(ray_ok, (y - ymean[:, :, None, None]) ** 2, 0.0)
        ss = jnp.sum(dev2, axis=(2, 3))
        pos = ss > 0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, ss, 1.0) / (P * W)),
                         0.0)

    @jax.jit
    def report(l):
        res = trace.trace_rays(specs, l, cfg)
        ok = jnp.mean(res.ray_ok.astype(jnp.float32))
        rms_y = rms_y_per_field(res.y, res.ray_ok)
        rms_xy = metrics.compute_spot_rms_xy(res.x, res.y, res.ray_ok)
        m = wf.opd_map(specs, l, wf_cfg, xy=(gxr, gyr))
        xg = gxr[0, 0, :, 0]
        yg = gyr[0, 0, :, 0]
        strehls, wrms = [], []
        lam = 520e-6
        for fi in range(len(fields)):
            opd = m["opd"][0, fi, :, 0]
            okw = m["ok"][0, fi, :, 0] & jnp.asarray(in_pupil.ravel())
            cz = wf.zernike_fit(opd, xg, yg, okw, j_max=3)
            low = wf.zernike_basis(3, xg, yg) @ cz
            resid = jnp.where(okw, opd - low, 0.0)
            strehls.append(wf.strehl_ratio(resid, okw, lam))
            w = okw.astype(opd.dtype)
            wrms.append(jnp.sqrt(jnp.sum(w * resid * resid)
                                 / jnp.maximum(jnp.sum(w), 1.0)) / lam)
        return (ok, rms_y, rms_xy, jnp.stack(strehls)[None],
                jnp.stack(wrms)[None])

    ok, rms_y, rms_xy, strehl, wrms = map(np.asarray, report(lens))

    # Aperture model (VERDICT r4 #5): solve the per-field vignetting
    # factors against the axial-beam apertures, feed them back through a
    # vignetted trace, and report the relative illumination — the
    # "transmission" number becomes aperture-aware instead of assuming an
    # unobstructed pupil (reference consumes factors at
    # `ray_tracing.py:479-490`; this build solves them).
    vig = ri = None
    ok_vig = float("nan")
    if not args.no_vignetting:
        import dataclasses
        from torchoptics_tpu.ops import vignetting as vig_mod
        vig = jax.jit(lambda l: vig_mod.solve_vignetting(
            specs, l, fields, n_ray_aiming_iter=0))(lens)
        vf = vig_mod.solved_tables_vig_fn(fields)
        specs_v = dataclasses.replace(
            specs, vig_up=jnp.asarray(vig["vig_up"]),
            vig_down=jnp.asarray(vig["vig_down"]),
            vig_x=jnp.asarray(vig["vig_x"]))
        ri = np.asarray(jax.jit(lambda l: metrics.compute_relative_illumination(
            specs_v, l, fields, vig_fn=vf, n_ray_aiming_iter=1))(lens))
        cfg_v = dataclasses.replace(cfg, vig_fn=vf)
        res_v = jax.jit(lambda l: trace.trace_rays(specs_v, l, cfg_v))(lens)
        ok_vig = float(np.asarray(res_v.ray_ok, np.float32).mean())

    efl = float(lens.efl[0])
    trans = (f"transmission={float(ok):.4f} (full pupil), "
             f"{ok_vig:.4f} (solved vignetting)"
             if vig is not None else f"transmission={float(ok):.4f}")
    print(f"lens={args.lens} design={args.design or 'zoo'} "
          f"efl={efl:.4f} {trans}")
    hdr = (f"{'field':>6} {'rms_y mm':>10} {'rms_xy mm':>10} "
           f"{'wfe rms λ':>10} {'strehl(d)':>10}")
    if vig is not None:
        hdr += f" {'vig_up':>8} {'vig_dn':>8} {'vig_x':>8} {'rel_illum':>9}"
    print(hdr)
    for i, f in enumerate(fields):
        row = (f"{f:6.3f} {rms_y[0, i]:10.5f} {rms_xy[0, i]:10.5f} "
               f"{wrms[0, i]:10.3f} {strehl[0, i]:10.4f}")
        if vig is not None:
            row += (f" {float(vig['vig_up'][0, i]):8.4f}"
                    f" {float(vig['vig_down'][0, i]):8.4f}"
                    f" {float(vig['vig_x'][0, i]):8.4f}"
                    f" {float(ri[0, i, 0]):9.4f}")
        print(row)
    print(f"  mean {np.mean(rms_y[0]):10.5f} {np.mean(rms_xy[0]):10.5f} "
          f"{np.mean(wrms[0]):10.3f} {np.mean(strehl[0]):10.4f}")
    print("  (wfe/strehl at d-line, piston+tilt removed; strehl is only "
          "meaningful when wfe ≲ 0.2λ; vig/rel_illum columns from the "
          "solved axial-beam aperture model)")


if __name__ == "__main__":
    main()
