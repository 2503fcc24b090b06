#!/usr/bin/env python
"""Decompose the fused-path XLA front-end cost on the chip.

The roofline analysis (`docs/ARCHITECTURE.md` §4b) shows the fused kernels
at the measured VPU ceiling while the end-to-end step sits at ~0.63 — the
gap being `prepare_fused_inputs` (pupil sampling, vignetting, aiming, EPD
scaling, broadcast/flatten) plus per-call dispatch. This script times each
front-end stage with the in-jit `lax.scan` chain protocol (per-step time =
total/K with dispatch amortized; each iteration data-depends on the last so
nothing is CSE'd away), at the bench's 2.46M-ray scale.

Run: python benchmarks/profile_frontend.py [--fields 32 --rings 160]
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


def chain_time(make_step, feedback, args, K=10, reps=5):
    """Median per-step seconds of K sequentially-dependent steps in one jit.

    ``make_step(*args)`` -> pytree out; ``feedback(out)`` -> scalar folded
    into the first arg so iteration i+1 depends on i (defeats CSE)."""

    def chained(*a):
        def body(carry, _):
            a0, acc = carry
            out = make_step(a0, *a[1:])
            fb = feedback(out)
            return (a0 + 1e-30 * fb, acc + fb), None
        (_, acc), _ = jax.lax.scan(body, (a[0], 0.0), None, length=K)
        return acc

    f = jax.jit(chained)
    _ = np.asarray(f(*args))  # compile + true sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fields", type=int, default=32)
    ap.add_argument("--rings", type=int, default=160)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    ensure_backend()
    from torchoptics_tpu import simulator as sim
    from torchoptics_tpu import zoo
    from torchoptics_tpu.ops import pallas_trace as pt
    from torchoptics_tpu.ops import pupil as pupil_mod

    specs, lens = zoo.build("double_gauss")
    mk = lambda aim: sim.SimulatorConfig(
        n_sampled_fields=args.fields, n_pupil_rings=args.rings,
        pupil_sampling="circular", n_ray_aiming_iter=aim,
        wavelengths=(459.0, 520.0, 640.0), trace_engine="pallas")
    cfg1, cfg0 = mk(1).trace_config(), mk(0).trace_config()
    F, W = len(cfg1.rel_fields), 3
    dev = jax.devices()[0]
    print(f"device={dev}  fields={F} rings={args.rings} W={W}")

    rows = {}

    # 1. full front-end (aim on / off)
    for name, cfg in (("frontend_aim1", cfg1), ("frontend_aim0", cfg0)):
        def step(epd, c, t):
            import dataclasses
            sp = dataclasses.replace(specs, epd=epd)
            out = pt.prepare_fused_inputs(sp, lens.replace(c=c, t=t), cfg)
            return out
        rows[name] = chain_time(
            step, lambda o: jnp.sum(o[0][:8]) + jnp.sum(o[1][:8]),
            (specs.epd, lens.c, lens.t), reps=args.reps)

    # 2. pupil sampling alone
    def samp(epd):
        xp, yp = pupil_mod.sample_pupil(cfg0.mode, cfg0.n_rays, 1)
        return pupil_mod.scale_to_epd(xp, epd), pupil_mod.scale_to_epd(yp, epd)
    rows["sample_pupil"] = chain_time(
        samp, lambda o: jnp.sum(o[0][..., :8]), (specs.epd,), reps=args.reps)

    # 3. broadcast + flatten alone (the (F,P,W) materialization)
    xp_rel, yp_rel = pupil_mod.sample_pupil(cfg0.mode, cfg0.n_rays, 1)
    P = xp_rel.shape[2]

    def bcast(xp, yp):
        xpb = jnp.broadcast_to(xp, (1, F, P, W))[0]
        ypb = jnp.broadcast_to(yp, (1, F, P, W))[0]
        cyb = jnp.broadcast_to(jnp.ones((F,))[:, None, None], (F, P, W))
        return xpb.reshape(-1), ypb.reshape(-1), cyb.reshape(-1)
    xp4 = jnp.broadcast_to(xp_rel[..., None], xp_rel.shape + (W,))
    rows["broadcast_flatten"] = chain_time(
        bcast, lambda o: jnp.sum(o[0][:8]),
        (xp_rel, yp_rel), reps=args.reps)

    # 4. the fused forward kernel alone, fed precomputed inputs
    xpb, ypb, cyb, z0, mu, shape = jax.jit(
        lambda: pt.prepare_fused_inputs(specs, lens, cfg1))()
    xpb, ypb, cyb = map(jnp.asarray, (xpb, ypb, cyb))

    def kern(xp, yp, cy, c, t):
        outs = pt.trace_fused(xp, yp, cy, z0, c[0], t[0], mu,
                              allow_backward=cfg1.allow_backward_rays)
        return outs
    rows["fwd_kernel_only"] = chain_time(
        kern, lambda o: jnp.sum(o[1][:8]),
        (xpb, ypb, cyb, lens.c, lens.t), reps=args.reps)

    n_rays = F * P * W
    print(f"rays={n_rays/1e6:.2f}M")
    for k, v in rows.items():
        print(f"{k:20s} {v*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
