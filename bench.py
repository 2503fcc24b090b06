"""Benchmark: differentiable ray-surface intersections/sec through the
6-element double-Gauss (fwd+bwd), per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline target (BASELINE.json north star) is 100e6 differentiable
ray-surface intersections/s/chip; the reference publishes no numbers
(BASELINE.md), so vs_baseline is measured/target.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

TARGET_INTERSECTIONS_PER_SEC = 100e6


def _ensure_backend():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()


def _time_step(step, args, n_iter=10, reps=3):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torchoptics_tpu.utils.timing import time_step
    return time_step(step, args, n_iter=n_iter, reps=reps)


def main():
    _ensure_backend()
    from torchoptics_tpu.models import zoo
    from torchoptics_tpu.ops import metrics as metrics_mod
    from torchoptics_tpu.ops import pallas_trace as pallas_mod
    from torchoptics_tpu.ops import trace as trace_mod

    specs, lens = zoo.build("double_gauss")
    n_surfaces = int(lens.structure.n_surfaces[0])

    # Dense pupil grid: 32 fields x 160^2 rays x 3 wavelengths = 2.46M rays
    # (throughput keeps rising with ray count as fixed overheads amortize).
    n_fields = 32
    rings = 160
    rows = 64
    cfg = trace_mod.TraceConfig(
        mode="circular", n_rays=(rings, rings),
        rel_fields=tuple(float(f) for f in np.linspace(0, 1, n_fields)),
        wavelengths=(459.0, 520.0, 640.0),
        n_ray_aiming_iter=1)
    n_rays_total = (len(cfg.rel_fields) * rings * rings
                    * len(cfg.wavelengths))

    on_tpu = jax.default_backend() == "tpu"

    def loss_xla(c, t):
        res = trace_mod.trace_rays(specs, lens.replace(c=c, t=t), cfg)
        return metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)[0]

    def loss_pallas(c, t):
        res = pallas_mod.trace_rays_fused(specs, lens.replace(c=c, t=t), cfg,
                                          rows=rows)
        return metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)[0]

    best_xla = _time_step(
        jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1))),
        (lens.c, lens.t))
    best = best_xla
    best_pallas = None
    if on_tpu:
        best_pallas = _time_step(
            jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1))),
            (lens.c, lens.t))
        best = min(best, best_pallas)

    # Second BASELINE metric: full lens-optimization step (unsupervised
    # objective Lu = rms + rate*sumQ, fwd+bwd) at the same ray count.
    import torchoptics_tpu.simulator as sim_mod
    sim_cfg = sim_mod.SimulatorConfig(
        n_sampled_fields=n_fields, n_pupil_rings=rings,
        pupil_sampling="circular", n_ray_aiming_iter=1,
        wavelengths=(459.0, 520.0, 640.0))

    def lu_pallas(c, t):
        Lu, _ = pallas_mod.unsupervised_loss_fused(
            specs, lens.replace(c=c, t=t), sim_cfg, rows=rows)
        return Lu

    def lu_xla(c, t):
        _, ld = sim_mod.do_ray_tracing(specs, lens.replace(c=c, t=t),
                                       sim_cfg)
        return ld["loss_unsup"]

    lu_fn = lu_pallas if on_tpu else lu_xla
    best_lu = _time_step(
        jax.jit(jax.value_and_grad(lu_fn, argnums=(0, 1))),
        (lens.c, lens.t))

    rays_per_sec = n_rays_total / best
    intersections_per_sec = rays_per_sec * n_surfaces

    result = {
        "metric": "diff_ray_surface_intersections_per_sec_fwdbwd_double_gauss",
        "value": intersections_per_sec,
        "unit": "intersections/s/chip",
        "vs_baseline": intersections_per_sec / TARGET_INTERSECTIONS_PER_SEC,
        "extra": {
            "step_time_ms": best * 1e3,
            "step_time_ms_xla": best_xla * 1e3,
            "step_time_ms_pallas": (None if best_pallas is None
                                    else best_pallas * 1e3),
            "lens_opt_step_ms": best_lu * 1e3,
            "rays_per_step": n_rays_total,
            "surfaces": n_surfaces,
            "rays_per_sec": rays_per_sec,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
