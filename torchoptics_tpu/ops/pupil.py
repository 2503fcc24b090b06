"""Entrance-pupil sampling patterns and pupil-coordinate transforms.

All ten sampling modes of the reference (`ray_tracing.py:348-476` — the TF
twin carries the full set; the torch port only kept three,
`ray_tracing_lite.py:353-422`), re-designed for JAX:

* deterministic samplers are pure functions of static shape parameters and
  fold to compile-time constants under jit;
* the stochastic sampler threads an explicit ``jax.random`` key
  (replacing ``torch.rand`` at `ray_tracing_lite.py:400-401`).

Samplers return relative pupil coordinates ``(x, y)`` shaped
``(B_or_1, 1, n_rays, 1)`` in the (systems, fields, rays, wavelengths)
layout; broadcasting against fields/wavelengths happens in the tracer.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Coords = Tuple[jnp.ndarray, jnp.ndarray]


def _const(x, y) -> Coords:
    return (jnp.asarray(x, dtype=jnp.float32).reshape(1, 1, -1, 1),
            jnp.asarray(y, dtype=jnp.float32).reshape(1, 1, -1, 1))


def tee(*_args) -> Coords:
    """Bottom meridional, top meridional, and positive sagittal rays
    (reference `ray_tracing_lite.py:353-360`)."""
    return _const([0.0, 0.0, 1.0], [-1.0, 1.0, 0.0])


def meridional_uniform(n_rays: int) -> Coords:
    """n uniformly spaced meridional rays (reference `ray_tracing.py:358-365`)."""
    y = np.linspace(-1.0, 1.0, n_rays, dtype=np.float32)
    return _const(np.zeros_like(y), y)


def sagittal_uniform(n_rays: int) -> Coords:
    """n uniformly spaced positive sagittal rays (reference `ray_tracing.py:368-375`)."""
    x = np.linspace(0.0, 1.0, n_rays, dtype=np.float32)
    return _const(x, np.zeros_like(x))


def chief(*_args) -> Coords:
    """The chief ray: pupil center (reference `ray_tracing.py:378-385`)."""
    return _const([0.0], [0.0])


def circle_pseudo_random(key: jax.Array, batch: int, n_r: int,
                         n_theta: int) -> Coords:
    """Stratified-random polar sampling: jittered r² x θ grid, one independent
    draw per system (reference `ray_tracing_lite.py:393-410`)."""
    n_rays = n_r * n_theta
    kr, kt = jax.random.split(key)
    delta_r2 = jax.random.uniform(kr, (batch, n_r, n_theta)) / n_r
    delta_th = jax.random.uniform(kt, (batch, n_r, n_theta)) / n_theta
    r2_incr = jnp.asarray(
        np.linspace(0, 1, n_r, endpoint=False, dtype=np.float32))[None, :, None]
    th_incr = jnp.asarray(
        np.linspace(0, 1, n_theta, endpoint=False, dtype=np.float32))[None, None, :]
    r = jnp.sqrt(delta_r2 + r2_incr)
    theta = (delta_th + th_incr) * 2.0 * math.pi
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    return x.reshape(-1, 1, n_rays, 1), y.reshape(-1, 1, n_rays, 1)


def circle(n_r: int, n_theta: int) -> Coords:
    """Deterministic polar rings (reference `ray_tracing_lite.py:412-422`)."""
    r = np.linspace(0, 1.0, n_r, endpoint=False, dtype=np.float32)[:, None]
    theta = np.linspace(0, 2 * np.pi, n_theta, endpoint=False,
                        dtype=np.float32)[None, :]
    x = r * np.cos(theta)
    y = r * np.sin(theta)
    return _const(x, y)


def skew_uniform_half_equidistant(n_r: int, n_i: int) -> Coords:
    """Right-half pupil, equidistant shells: n_i*(2i+1) rays on shell i
    (reference `ray_tracing.py:421-433`)."""
    rays_per_shell = [n_i * (i * 2 + 1) for i in range(n_r)]
    shell_idx = [i for i in range(n_r) for _ in range(rays_per_shell[i])]
    r = ((np.arange(n_r) + 0.5) / n_r)[shell_idx]
    theta = np.array([(i / n - 0.5) * np.pi for n in rays_per_shell
                      for i in (np.arange(n) + 0.5)])
    return _const(r * np.cos(theta), r * np.sin(theta))


def skew_uniform_half_jittered(n_r: int, n_i: int) -> Coords:
    """Right-half pupil, alternating-radius shells that sample the pupil edge
    (reference `ray_tracing.py:436-451`). Deterministic despite the name."""
    rays_per_shell = np.array([n_i * (i * 2 + 1) for i in range(n_r)])
    shell_idx = np.array([i for i in range(n_r)
                          for _ in range(int(rays_per_shell[i]))])
    inner_r = np.linspace(0, 1, n_r * 2)[::2]
    delta_r = 1 / (2 * n_r - 1)
    r = inner_r[shell_idx] + delta_r * ((np.arange(len(shell_idx)) + shell_idx) % 2)
    theta = np.array([(i / n - 0.5) * np.pi for n in rays_per_shell
                      for i in (np.arange(n) + 0.5)])
    return _const(r * np.cos(theta), r * np.sin(theta))


def skew_inner_square_half(n_y: int) -> Coords:
    """Right-half inner-square grid (reference `ray_tracing.py:454-465`)."""
    x = np.linspace(-1, 1, n_y * 2)[-n_y:] / np.sqrt(2)
    y = np.linspace(-1, 1, n_y) / np.sqrt(2)
    xg = np.broadcast_to(x[None, :], (n_y, n_y))
    yg = np.broadcast_to(y[:, None], (n_y, n_y))
    return _const(xg.astype(np.float32), yg.astype(np.float32))


def circle_outer_edge_uniform(n_rays: int) -> Coords:
    """Uniform ring on the pupil edge (reference `ray_tracing.py:468-476`)."""
    theta = np.linspace(0, 2 * np.pi, n_rays, endpoint=False, dtype=np.float32)
    return _const(np.cos(theta), np.sin(theta))


#: mode name -> (needs_key, builder(n_rays tuple) -> sampler)
SAMPLER_MODES = (
    "skew_random", "skew_uniform_half_equidistant", "skew_uniform_half_jittered",
    "skew_inner_square_half", "skew_outer_edge_uniform", "meridional_uniform",
    "sagittal_uniform", "chief", "tee", "circular",
)


def sample_pupil(mode: str, n_rays, batch: int,
                 key: Optional[jax.Array] = None) -> Coords:
    """Dispatch a pupil sampling mode (reference `ray_tracing_lite.py:34-60`)."""
    if mode == "skew_random":
        assert key is not None, "skew_random sampling requires a PRNG key"
        return circle_pseudo_random(key, batch, *n_rays)
    if mode == "skew_uniform_half_equidistant":
        return skew_uniform_half_equidistant(*n_rays)
    if mode == "skew_uniform_half_jittered":
        return skew_uniform_half_jittered(*n_rays)
    if mode == "skew_inner_square_half":
        n = n_rays[0] if isinstance(n_rays, (tuple, list)) else n_rays
        return skew_inner_square_half(n)
    if mode == "skew_outer_edge_uniform":
        n = n_rays[0] if isinstance(n_rays, (tuple, list)) else n_rays
        return circle_outer_edge_uniform(n)
    if mode == "meridional_uniform":
        n = n_rays[0] if isinstance(n_rays, (tuple, list)) else n_rays
        return meridional_uniform(n)
    if mode == "sagittal_uniform":
        n = n_rays[0] if isinstance(n_rays, (tuple, list)) else n_rays
        return sagittal_uniform(n)
    if mode == "chief":
        return chief()
    if mode == "tee":
        return tee()
    if mode == "circular":
        return circle(*n_rays)
    raise ValueError(
        f"Unknown pupil sampling mode {mode!r}; expected one of {SAMPLER_MODES}")


def apply_vignetting(y: jnp.ndarray, vig_up: jnp.ndarray,
                     vig_down: jnp.ndarray) -> jnp.ndarray:
    """Linearly rescale normalized pupil coordinates for vignetting
    (reference `ray_tracing.py:479-490`)."""
    vig_up = jnp.asarray(vig_up)
    vig_down = jnp.asarray(vig_down)
    trailing = (1,) * (y.ndim - vig_down.ndim)
    vig_up = vig_up.reshape(vig_up.shape + trailing)
    vig_down = vig_down.reshape(vig_down.shape + trailing)
    scale = 1.0 - (vig_up + vig_down) / 2.0
    offset = (vig_down - vig_up) / 2.0
    return y * scale + offset


def scale_to_epd(y: jnp.ndarray, epd: jnp.ndarray) -> jnp.ndarray:
    """Relative pupil coordinates -> absolute heights via EPD/2, assuming
    infinite conjugates (reference `ray_tracing_lite.py:497-507`)."""
    trailing = (1,) * (y.ndim - 1)
    return y * jnp.reshape(epd, (-1,) + trailing) / 2.0
