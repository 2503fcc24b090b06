"""Profiling harness: per-engine step timing + optional jax.profiler traces.

Usage:
  python benchmarks/profile_trace.py [--rings 96] [--fields 16] [--profile]

Writes a jax.profiler trace (viewable in TensorBoard / Perfetto) when
--profile is given; otherwise prints a timing table over engines and scales.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from torchoptics_tpu.utils.backend import ensure_backend


def run(rings: int, fields: int, profile: bool, aiming: int):
    ensure_backend()
    from torchoptics_tpu import metrics, trace, zoo
    from torchoptics_tpu.ops import pallas_trace

    specs, lens = zoo.build("double_gauss")
    cfg_kw = dict(
        mode="circular", n_rays=(rings, rings),
        rel_fields=tuple(float(f) for f in np.linspace(0, 1, fields)),
        wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=aiming)
    n_rays = fields * rings * rings * 3
    n_surf = int(lens.structure.n_surfaces[0])

    from torchoptics_tpu.utils.timing import time_step

    def bench(name, loss_fn, grad=True):
        f = jax.value_and_grad(loss_fn, argnums=(0, 1)) if grad else loss_fn
        step = jax.jit(f)
        best = time_step(step, (lens.c, lens.t))
        print(f"{name:24s} {best * 1e3:8.3f} ms  "
              f"{n_rays / best / 1e6:8.1f} Mrays/s  "
              f"{n_rays * n_surf / best / 1e6:8.0f} Mint/s")
        return step

    def mk_loss(engine):
        def loss(c, t):
            l = lens.replace(c=c, t=t)
            if engine == "pallas":
                r = pallas_trace.trace_rays_fused(
                    specs, l, trace.TraceConfig(**cfg_kw))
            else:
                r = trace.trace_rays(
                    specs, l, trace.TraceConfig(engine=engine, **cfg_kw))
            return metrics.compute_rms2d(r.x, r.y, r.ray_ok)[0]
        return loss

    print(f"double_gauss: {n_rays} rays x {n_surf} surfaces, "
          f"device={jax.devices()[0]}")
    bench("xla-unroll fwd", mk_loss("unroll"), grad=False)
    bench("xla-unroll fwd+bwd", mk_loss("unroll"))
    bench("xla-scan fwd+bwd", mk_loss("scan"))
    if jax.default_backend() == "tpu":
        step = bench("pallas fwd+bwd", mk_loss("pallas"))
        if profile:
            with jax.profiler.trace("/tmp/tot_profile"):
                for _ in range(5):
                    out = step(lens.c, lens.t)
                jax.block_until_ready(out)
            print("profile written to /tmp/tot_profile")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rings", type=int, default=96)
    ap.add_argument("--fields", type=int, default=16)
    ap.add_argument("--aiming", type=int, default=1)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()
    run(args.rings, args.fields, args.profile, args.aiming)
