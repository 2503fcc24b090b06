#!/usr/bin/env python
"""fp64 fallback cost: what a ``double_precision=True`` user actually pays.

The fused Pallas kernels are f32-only (loud raise — `ops/trace.py`); fp64
requests run the XLA engines. This probe measures the fp64 spot-RMS loss
fwd+bwd (scan engine, the fp64-supported one) against the same-scale f32
fused path, on whatever backend is available (TPU via relay if the chip
grant is up, else CPU), so RESULTS.md can quote a measured fallback factor
rather than hand-waving. Reference context: `ray_tracing_lite.py:62,76-78`
(its ``double_precision`` flag covers the whole torch engine).

x64 is process-global in JAX, so this runs standalone (not under pytest).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from torchoptics_tpu.utils.backend import ensure_backend

ensure_backend()

import dataclasses

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from torchoptics_tpu import metrics, trace, zoo
from torchoptics_tpu.utils.timing import time_step_stats


def main():
    specs, lens = zoo.build("double_gauss")
    n_fields, rings = 16, 96          # 442k-ray workload (bench.py medium)
    cfg64 = trace.TraceConfig(
        mode="circular", n_rays=(rings, rings),
        rel_fields=tuple(float(f) for f in np.linspace(0, 1, n_fields)),
        wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=1,
        engine="scan", double_precision=True)
    cfg32 = dataclasses.replace(cfg64, double_precision=False)
    n_rays = n_fields * rings * rings * 3
    n_surf = int(lens.structure.n_surfaces[0])

    def loss(c, t, cfg):
        res = trace.trace_rays(specs, lens.replace(c=c, t=t), cfg)
        return metrics.compute_rms2d(res.x, res.y, res.ray_ok)[0]

    for name, cfg, cast in (("f32_scan", cfg32, jnp.float32),
                            ("f64_scan", cfg64, jnp.float64)):
        args = (lens.c.astype(cast), lens.t.astype(cast))
        try:
            fn = jax.jit(jax.value_and_grad(
                lambda c, t: loss(c, t, cfg), argnums=(0, 1)))
            s = time_step_stats(fn, args, n_iter=3, reps=3)
            rate = n_rays * n_surf / s["min"]
            print(f"{name}: {s['min']*1e3:.2f} ms/step "
                  f"({rate/1e6:.0f} M intersections/s)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe reports, not crashes
            print(f"{name}: UNSUPPORTED on {jax.default_backend()}: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
