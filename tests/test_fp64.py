"""fp64 end-to-end: ``TraceConfig.double_precision`` as a *tested* feature.

Runs in a subprocess with ``jax_enable_x64`` on (the flag is process-global;
enabling it in-process would leak into every other test), traces the Cooke
triplet, and asserts paraxial closure against the analytic ABCD focal length
at the 1e-9 level — two orders tighter than float32 can reach on this chain.

Reference context: `ray_tracing_lite.py:69-75` exposes ``double_precision``
on ``RayTracer``; the reference never tests it either way.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu import abcd, trace, zoo

specs, lens = zoo.build("cooke")
# The analytic reference itself must be f64: the ABCD chain on the f32 lens
# carries ~1e-7 arithmetic error, an order above the closure being tested.
efl_abcd = float(abcd.get_first_order(lens.astype(jnp.float64))[0][0])

def ray_efl(h_rel, double):
    cfg = trace.TraceConfig(mode="tee", rel_fields=(0.0,),
                            wavelengths=("d",), n_ray_aiming_iter=0,
                            double_precision=double)
    dt = jnp.float64 if double else jnp.float32
    y_rel = jnp.asarray([h_rel], dt).reshape(1, 1, 1, 1)
    x_rel = jnp.zeros_like(y_rel)
    res = jax.jit(
        lambda l: trace.trace_rays(specs, l, cfg, xy=(x_rel, y_rel))
    )(lens.astype(dt))
    assert res.y.dtype == dt, res.y.dtype
    assert bool(res.ray_ok.all())
    h_abs = float(h_rel) * float(specs.epd[0]) / 2.0
    slope = res.cy / jnp.sqrt(1.0 - res.cx**2 - res.cy**2)
    return -h_abs / float(slope.reshape(-1)[0])

# Richardson extrapolation kills the h^2 spherical-aberration term, so the
# remaining error is h^4 aberration + arithmetic noise. In f64 the closure
# reaches ~1e-10 relative; f32 is stuck near its ~1e-7 rounding floor.
def closure(double, h=1e-3):
    e1, e2 = ray_efl(h, double), ray_efl(h / 2, double)
    efl_extrap = (4.0 * e2 - e1) / 3.0
    return abs(efl_extrap / efl_abcd - 1.0)

err64 = closure(True)
err32 = closure(False)
print(f"closure f64={err64:.3e} f32={err32:.3e} efl={efl_abcd:.12f}")
assert err64 < 1e-9, f"f64 paraxial closure too loose: {err64:.3e}"
assert err32 > err64 * 10, (
    f"f32 ({err32:.3e}) should be far looser than f64 ({err64:.3e}); "
    "double_precision is not actually changing the compute dtype")

# Gradients stay finite and f64 through the full unsupervised objective.
# engine='scan' + aiming off: XLA:CPU's x64 compile of the fully unrolled
# fwd+bwd trace takes >25 min on this 1-core host (the f32 twin takes ~1
# min); the scan engine compiles the surface body once. The unrolled f64
# forward path is already covered by the closure traces above.
from torchoptics_tpu import simulator as sim_mod
cfg = sim_mod.SimulatorConfig(n_sampled_fields=2, n_pupil_rings=3,
                              pupil_sampling="circular", trace_engine="scan",
                              n_ray_aiming_iter=0, double_precision=True)
lens64 = lens.astype(jnp.float64)

def lu(c, t):
    _, ld = sim_mod.do_ray_tracing(specs, lens64.replace(c=c, t=t), cfg)
    return ld["loss_unsup"]

val, (gc, gt) = jax.jit(jax.value_and_grad(lu, argnums=(0, 1)))(
    lens64.c, lens64.t)
assert val.dtype == jnp.float64 and gc.dtype == jnp.float64
assert bool(jnp.isfinite(val)) and bool(jnp.isfinite(gc).all())
assert bool(jnp.isfinite(gt).all())
assert float(jnp.abs(gc).max()) > 0.0
print("fp64 end-to-end OK")
"""


@pytest.mark.slow
def test_fp64_end_to_end():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "fp64 end-to-end OK" in proc.stdout
