"""Numerical debugging: NaN policing and trace health reports.

The reference's only runtime checking is scattered asserts (SURVEY §4); on
TPU the equivalents are ``jax.checkify`` (functional error checking inside
jit) and post-hoc health summaries of the failure masks the engine already
maintains.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *, nan: bool = True, div: bool = True,
            oob: bool = False) -> Callable:
    """Wrap a jittable function with checkify error tracking.

    Returns a function with the same signature that raises on the first NaN
    (or division/index error) produced anywhere inside, with a source
    location — usable under jit, unlike numpy-level asserts.

    Example::

        safe_loss = debugging.checked(loss_fn)
        value = safe_loss(lens)          # raises JaxRuntimeError on NaN
    """
    errors = set()
    if nan:
        errors |= checkify.nan_checks
    if div:
        errors |= checkify.div_checks
    if oob:
        errors |= checkify.index_checks

    cfn = checkify.checkify(fn, errors=errors)

    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def trace_health(result) -> Dict[str, jnp.ndarray]:
    """Summarize a ``TraceResult``'s failure bookkeeping — the metrics the
    reference logged as ray_tracing/* (`optics_simulator_lite.py:495-502`)."""
    ok = result.ray_ok
    return {
        "ray_failures": jnp.sum(~ok),
        "ray_failure_fraction": jnp.mean((~ok).astype(jnp.float32)),
        "backward_rays": jnp.sum(result.ray_backward),
        "nonfinite_coords": (jnp.sum(~jnp.isfinite(result.x))
                             + jnp.sum(~jnp.isfinite(result.y))),
    }
