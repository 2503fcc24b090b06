"""NaN policing and trace health utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import trace, zoo
from torchoptics_tpu.utils import debugging


def test_checked_passes_clean_function():
    f = debugging.checked(lambda x: jnp.sum(x * 2))
    assert float(f(jnp.ones(4))) == 8.0


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.sum(jnp.log(x))  # log(-1) -> NaN

    f = debugging.checked(jax.jit(bad))
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0, 2.0]))


def test_trace_health():
    specs, lens = zoo.build("cooke")
    cfg = trace.TraceConfig(mode="circular", n_rays=(4, 4),
                            rel_fields=(0.0, 1.0), wavelengths=("d",))
    res = trace.trace_rays(specs, lens, cfg)
    health = debugging.trace_health(res)
    assert float(health["ray_failure_fraction"]) == 0.0
    assert int(health["nonfinite_coords"]) == 0

    bad = trace.trace_rays(specs, lens.replace(c=lens.c * 3.0), cfg)
    health_bad = debugging.trace_health(bad)
    assert float(health_bad["ray_failure_fraction"]) > 0
    assert int(health_bad["nonfinite_coords"]) == 0  # masks keep it finite
