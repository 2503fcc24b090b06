"""Ray aiming: Newton correction of pupil coordinates so rays fill the stop.

Reference ``RayTracer.ray_aiming`` (`ray_tracing_lite.py:129-208`) — an
autodiff-inside-the-forward fixed-point solver. The reference differentiates
the stop-plane coordinates w.r.t. the pupil coordinates with
``Tensor.backward`` (`:179-181`); here the same accumulated-cotangent
derivative comes from one ``jax.vjp`` call with all-ones cotangents on both
outputs, so the whole solve (including the recursive marginal-ray trace in
``compute_pupil_radius``) stays inside a single jitted XLA program. The
caller treats the result as a constant (``stop_gradient`` + clamp at
`ray_tracing_lite.py:108-110`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from torchoptics_tpu.models.structure import Lens, Specs
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu.ops import pupil as pupil_mod


def compute_pupil_radius(specs: Specs, lens2stop: Lens,
                         double_precision: bool = False) -> jnp.ndarray:
    """Entrance-pupil radius via a real marginal-ray trace to the stop
    (reference `ray_tracing_lite.py:834-844`). Returns (B,)."""
    from torchoptics_tpu.ops import trace as trace_mod
    dtype = jnp.float64 if double_precision else jnp.float32
    x = jnp.zeros((1, 1, 1, 1), dtype=dtype)
    y = jnp.ones((1, 1, 1, 1), dtype=dtype)
    cfg = trace_mod.TraceConfig(mode="tee", rel_fields=(0.0,),
                                wavelengths=("d",),
                                double_precision=double_precision)
    res = trace_mod.trace_rays(specs, lens2stop, cfg, xy=(x, y), use_vig=False)
    return res.y.squeeze(axis=(1, 2, 3))


def ray_aiming(specs: Specs, lens: Lens, config, use_vig: bool
               ) -> Callable[[jnp.ndarray, jnp.ndarray],
                             Tuple[jnp.ndarray, jnp.ndarray]]:
    """Build the linear pupil-coordinate correction function.

    Args:
      specs/lens: full system (lens should already be detached by the caller,
        mirroring `ray_tracing_lite.py:108`).
      config: the calling tracer's ``TraceConfig`` (wavelengths/fields reused
        for the tee rays).
      use_vig: apply vignetting to the reference tee coordinates.

    Returns:
      ``fn(xp_rel, yp_rel) -> (xp_rel', yp_rel')``; identity when every
      system's stop is the first surface (`ray_tracing_lite.py:131-133`).
    """
    from torchoptics_tpu.ops import trace as trace_mod

    if all(k == 0 for k in lens.structure.stop_idx):
        return lambda xp_rel, yp_rel: (xp_rel, yp_rel)

    dtype = config.dtype
    specs2stop = specs.up_to_stop()
    lens2stop = lens.up_to_stop()

    # Stop radius (reference `ray_tracing_lite.py:137-144`).
    if config.ray_aiming_mode == "paraxial":
        magnification = abcd_mod.compute_magnification(lens2stop)
        rs = (magnification * specs2stop.epd / 2.0).reshape(-1, 1, 1, 1)
    elif config.ray_aiming_mode == "real":
        rs = compute_pupil_radius(
            specs2stop, lens2stop, config.double_precision).reshape(-1, 1, 1, 1)
    else:
        raise ValueError(
            f"ray_aiming_mode must be 'real' or 'paraxial', got "
            f"{config.ray_aiming_mode!r}")

    # Reference tee rays for every system, field, and wavelength
    # (`ray_tracing_lite.py:148-161`).
    xp_tee, yp_tee = pupil_mod.tee()
    nw = len(config.wavelengths)
    shape = (len(lens), len(config.rel_fields), xp_tee.shape[2], nw)
    xp_tee = jnp.broadcast_to(xp_tee.astype(dtype), shape)
    yp_tee = jnp.broadcast_to(yp_tee.astype(dtype), shape)
    if use_vig and config.vig_fn is not None:
        fields = jnp.asarray(config.rel_fields, dtype=dtype)[None, :]
        vig_down = config.vig_fn(fields, specs.vig_down)
        vig_up = config.vig_fn(fields, specs.vig_up)
        vig_x = config.vig_fn(fields, specs.vig_x)
        yp_tee = pupil_mod.apply_vignetting(yp_tee, vig_up, vig_down)
        xp_tee = pupil_mod.apply_vignetting(xp_tee, vig_x, vig_x)
    xp_tee_ref, yp_tee_ref = xp_tee, yp_tee

    def stop_trace(xp, yp):
        res = trace_mod.trace_rays(specs2stop, lens2stop, config, xy=(xp, yp),
                                   use_vig=False, up_to_stop=True)
        return res.x / rs, res.y / rs

    aiming_fn = None
    for _ in range(config.n_ray_aiming_iter):
        if aiming_fn is not None:
            xp_tee, yp_tee = aiming_fn(xp_tee, yp_tee)

        # d(stop coords)/d(pupil coords): one reverse-mode pull-back with
        # all-ones cotangents on both outputs reproduces the reference's two
        # accumulated ``backward()`` calls (`ray_tracing_lite.py:179-181`).
        (xs_rel, ys_rel), pullback = jax.vjp(stop_trace, xp_tee, yp_tee)
        x_grad, y_grad = pullback((jnp.ones_like(xs_rel), jnp.ones_like(ys_rel)))

        delta_xs_tee = xs_rel - xp_tee_ref
        delta_ys_tee = ys_rel - yp_tee_ref

        # Newton step; non-finite steps disable aiming for that ray
        # (`ray_tracing_lite.py:188-194`).
        delta_xp_tee = -delta_xs_tee / x_grad
        delta_yp_tee = -delta_ys_tee / y_grad
        delta_xp_tee = jnp.where(jnp.isfinite(delta_xp_tee), delta_xp_tee, 0.0)
        delta_yp_tee = jnp.where(jnp.isfinite(delta_yp_tee), delta_yp_tee, 0.0)

        # Linear interpolation between the tee corrections
        # (`ray_tracing_lite.py:196-206`): x scales through the sagittal ray;
        # y maps affinely through the lower/upper meridional pair.
        delta_xp = delta_xp_tee[..., -1:, :]
        delta_yp_l = delta_yp_tee[..., 0:1, :]
        delta_yp_u = delta_yp_tee[..., 1:2, :]
        xp = xp_tee[..., -1:, :]
        yp_l = yp_tee[..., 0:1, :]
        yp_u = yp_tee[..., 1:2, :]
        yp_scale = (yp_u + delta_yp_u - (yp_l + delta_yp_l)) / (yp_u - yp_l)
        yp_offset = (yp_l * delta_yp_u - yp_u * delta_yp_l) / (yp_l - yp_u)

        def aiming_fn(xp_rel, yp_rel, _xp=xp, _dxp=delta_xp,
                      _scale=yp_scale, _offset=yp_offset):
            return (xp_rel * (_xp + _dxp) / _xp,
                    yp_rel * _scale + _offset)

    return aiming_fn
