"""Probe: cost of packaging fused-kernel outputs as (B, F, P, W).

Compares, at the 2.46M-ray bench scale, value_and_grad of
compute_rms2d-on-packaged-result for three packagings:

  a) current: W-inner front-end + W-inner flat kernel + plain reshape
  b) W-outer front-end + kernel, then transpose (W,F,P) -> (F,P,W)
  c) loss fast path (no packaging) as the floor

Decides VERDICT r3 #2 (relayout-free packaged trace) empirically.
Run on the real chip: python benchmarks/probe_packaging.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.utils.backend import ensure_backend

ensure_backend()

from torchoptics_tpu.models import zoo
from torchoptics_tpu.ops import metrics as metrics_mod
from torchoptics_tpu.ops import pallas_trace as pt
from torchoptics_tpu.ops import trace as trace_mod
from torchoptics_tpu.utils.timing import time_step_stats

specs, lens0 = zoo.build("double_gauss")
lens = pt.compress_padded_tail(lens0)
ROWS = 64
cfg = trace_mod.TraceConfig(
    mode="circular", n_rays=(160, 160),
    rel_fields=tuple(float(f) for f in np.linspace(0, 1, 32)),
    wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=1)
n_int = 32 * 160 * 160 * 3 * 11


def pkg_inner(c, t):
    res = pt.trace_rays_fused(specs, lens.replace(c=c, t=t), cfg, rows=ROWS)
    return metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)[0]


def pkg_outer_transpose(c, t):
    l = lens.replace(c=c, t=t)
    xp, yp, cyb, z0, mu, shape = pt.prepare_fused_inputs(
        specs, l, cfg, w_order="outer")
    _, F, P, W = shape
    outs = pt.trace_fused(xp, yp, cyb, z0, l.c[0], l.t[0], mu, ROWS,
                          False, cfg.allow_backward_rays, F * P)
    pack = lambda a: jnp.transpose(a.reshape(W, F, P), (1, 2, 0))[None]
    x, y, ok = pack(outs[0]), pack(outs[1]), pack(outs[4])
    return metrics_mod.compute_rms2d(x, y, ok)[0]


def loss_floor(c, t):
    return pt.spot_rms_fused(specs, lens.replace(c=c, t=t), cfg, rows=ROWS)


for name, fn in [("a_pkg_winner", pkg_inner),
                 ("b_pkg_wouter_T", pkg_outer_transpose),
                 ("c_loss_floor", loss_floor)]:
    s = time_step_stats(jax.jit(jax.value_and_grad(fn, argnums=(0, 1))),
                        (lens.c, lens.t), n_iter=5, reps=4)
    print(f"{name}: {s['min']*1e3:.2f} ms  ({n_int/s['min']/1e9:.2f} B int/s)"
          f"  spread {s['spread']:.2f}")

# Forward-only packaging too (consumers like PSF sampling don't grad).
def fwd_inner(c, t):
    res = pt.trace_rays_fused(specs, lens.replace(c=c, t=t), cfg, rows=ROWS)
    return res.x.sum() + res.y.sum() + res.cx.sum() + res.cy.sum()


def fwd_outer_T(c, t):
    l = lens.replace(c=c, t=t)
    xp, yp, cyb, z0, mu, shape = pt.prepare_fused_inputs(
        specs, l, cfg, w_order="outer")
    _, F, P, W = shape
    outs = pt.trace_fused(xp, yp, cyb, z0, l.c[0], l.t[0], mu, ROWS,
                          False, cfg.allow_backward_rays, F * P)
    pack = lambda a: jnp.transpose(a.reshape(W, F, P), (1, 2, 0))[None]
    return (pack(outs[0]).sum() + pack(outs[1]).sum()
            + pack(outs[2]).sum() + pack(outs[3]).sum())


for name, fn in [("fwd_pkg_winner", fwd_inner),
                 ("fwd_pkg_wouter_T", fwd_outer_T)]:
    s = time_step_stats(jax.jit(fn), (lens.c, lens.t), n_iter=5, reps=4)
    print(f"{name}: {s['min']*1e3:.2f} ms  ({n_int/s['min']/1e9:.2f} B int/s)"
          f"  spread {s['spread']:.2f}")
