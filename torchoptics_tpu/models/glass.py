"""Glass parameterization and chromatic dispersion.

Covers the reference's glass machinery:

* ``g_from_n_v`` / ``n_v_from_g`` — the invertible whitening map between
  (n_d, V_d) glass coordinates and the normalized 2-vector ``g`` optimized by
  neural lens generators (reference `lens_modeling.py:29-46`; the 2x2 weights
  and mean are part of the public model interface and are kept bit-identical
  so trained generators transfer).
* ``refractive_indices`` — two-parameter Cauchy model n(λ) = A + B/λ²
  anchored on (n_d, V_d) (reference `lens_modeling.py:355-374`, after
  Sun et al. 2021).
* ``compute_n`` — 3-line (C, d, F) linear-partial-dispersion model anchored
  on K7/F2 (reference `ray_tracing.py:273-293`).
* ``map_glass_to_closest`` + straight-through estimator for
  quantized-continuous glass variables (reference `lens_modeling.py:101-104`
  and the TF-era ``grad_pass_through`` comment at `lens_modeling.py:117-124`).
* Named-wavelength table (reference `ray_tracing_lite.py:71-75`).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# Fraunhofer line wavelengths [nm] (reference `ray_tracing_lite.py:71-75`)
WAVELENGTH_NAMES = {"C": 656.3, "d": 587.6, "F": 486.1}
W_C, W_D, W_F = 656.3, 587.6, 486.1

# Whitening map constants (reference `lens_modeling.py:33-44`).
_G_W = np.array(
    [[-7.497527849096219, -7.49752916467739],
     [0.07842101471405442, -0.07842100095362642]], dtype=np.float64)
_G_MEAN = np.array([[1.6426209211349487, 48.8505973815918]], dtype=np.float64)
_NV_W = np.array(
    [[-0.06668863644654068, 6.3758429552417315],
     [-0.0666886481483064, -6.375841836481304]], dtype=np.float64)


def resolve_wavelengths(wavelengths) -> Tuple[float, ...]:
    """Map named Fraunhofer lines ('C'/'d'/'F') to nm; pass floats through."""
    out = []
    for w in wavelengths:
        if isinstance(w, str):
            out.append(WAVELENGTH_NAMES[w])
        else:
            out.append(float(w))
    return tuple(out)


def g_from_n_v(n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(N,) n_d, (N,) V_d -> (N, 2) normalized glass variables.

    The 2x2 map is written elementwise: XLA's generic dot may take a
    reduced-precision path, and exact f32 matters for catalog snapping."""
    n = jnp.asarray(n)
    v = jnp.asarray(v)
    dn = n - _G_MEAN[0, 0]
    dv = v - _G_MEAN[0, 1]
    g0 = dn * _G_W[0, 0] + dv * _G_W[1, 0]
    g1 = dn * _G_W[0, 1] + dv * _G_W[1, 1]
    return jnp.stack((g0, g1), axis=-1)


def n_v_from_g(g: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 2) normalized glass variables -> ((N,) n_d, (N,) V_d)."""
    g = jnp.asarray(g)
    g0, g1 = g[..., 0], g[..., 1]
    n = g0 * _NV_W[0, 0] + g1 * _NV_W[1, 0] + _G_MEAN[0, 0]
    v = g0 * _NV_W[0, 1] + g1 * _NV_W[1, 1] + _G_MEAN[0, 1]
    return n, v


def refractive_indices(nd: jnp.ndarray, v: jnp.ndarray, mask_G: np.ndarray,
                       wavelengths) -> jnp.ndarray:
    """Interpolate refractive indices at ``wavelengths`` [nm].

    n(λ) = A + B/λ² with (A, B) recovered from (n_d, V_d)
    (reference `lens_modeling.py:355-374`):

        B = (n_d - 1) / (V_d (λ_F^-2 - λ_C^-2)),  A = n_d - B/λ_d².

    Air gaps (mask_G False) give n = 1; zero-Abbe entries are dispersionless
    and pass n_d through unchanged.

    Args:
      nd, v: (B, S) padded glass parameters.
      mask_G: (B, S) static numpy glass mask.
      wavelengths: sequence of floats [nm] or Fraunhofer names.

    Returns:
      (B, S, W) refractive index of the gap after each surface.
    """
    wl = jnp.asarray(resolve_wavelengths(wavelengths), dtype=nd.dtype)
    dispersive = v != 0
    v_safe = jnp.where(dispersive, v, 1.0)
    b = (nd - 1.0) / (v_safe * (W_F ** -2 - W_C ** -2))
    a = nd - b / W_D ** 2
    n = a[..., None] + b[..., None] / wl[None, None, :] ** 2
    n = jnp.where(dispersive[..., None], n, nd[..., None])
    n = jnp.where(jnp.asarray(mask_G)[..., None], n, 1.0)
    return n


def compute_n(nd: jnp.ndarray, v: jnp.ndarray,
              glass_mask=None) -> jnp.ndarray:
    """Refractive indices at the (C, d, F) lines via a linear partial
    dispersion model w.r.t. the Abbe number, anchored on K7 and F2 glasses
    (reference `ray_tracing.py:273-293`).

    Two call forms, matching the reference:

    * ``glass_mask is None`` — ``nd, v`` are (...,) glass parameters; returns
      (..., 3) indices at (C, d, F).
    * ``glass_mask`` given — the reference's full surface-table form
      (`ray_tracing.py:286-293`): ``nd, v`` are flat (n_glass,) vectors of the
      *actual* glasses, ``glass_mask`` a static (B, S) boolean glass mask.
      The flat (C, d, F) triples are scattered wavelength-major into the
      padded table, an air column (n = 1) is prepended, and air/invalid slots
      read 1.0. Returns (B, 3, S + 1) — the layout ``trace_rays`` consumes as
      its pre-``mu`` index table (`ray_tracing.py:85-88`).
    """
    alpha = -4.5757e-4
    beta = 7.2264e-1
    nf = nd + (nd - 1.0) * (alpha + beta / v)
    nc = nf - (nd - 1.0) / v
    if glass_mask is None:
        return jnp.stack((nc, nd, nf), axis=-1)

    from torchoptics_tpu.models.structure import mask_scatter
    glass_mask = np.asarray(glass_mask, dtype=bool)
    # Air row prepended per system (`ray_tracing.py:286`): column 0 never
    # holds a glass.
    padded_mask = np.concatenate(
        (np.zeros_like(glass_mask[:, :1]), glass_mask), axis=1)  # (B, S+1)
    n = jnp.stack((nc, nd, nf), axis=0)  # (3, n_glass), wavelength-major
    table = jnp.stack(
        [mask_scatter(padded_mask, n[w], 1.0) for w in range(3)],
        axis=0)  # (3, B, S+1)
    return jnp.transpose(table, (1, 0, 2))


def map_glass_to_closest(g: jnp.ndarray, catalog_g: jnp.ndarray) -> jnp.ndarray:
    """Snap each continuous glass variable to its nearest catalog glass (L2).

    Reference `lens_modeling.py:101-104`."""
    dist = jnp.linalg.norm(g[:, None, :] - catalog_g[None, :, :], axis=-1)
    idx = jnp.argmin(dist, axis=1)
    return catalog_g[idx]


def catalog_glass_indices(g: jnp.ndarray, catalog_g: jnp.ndarray) -> jnp.ndarray:
    """Index of the closest catalog glass for each optimized glass
    (reference ``get_catalog_glass_indices``,
    `optics_simulator_lite.py:403-409`)."""
    dist = jnp.linalg.norm(g[:, None, :] - catalog_g[None, :, :], axis=-1)
    return jnp.argmin(dist, axis=1)


def quantize_glass_st(g: jnp.ndarray, catalog_g: jnp.ndarray) -> jnp.ndarray:
    """Quantized-continuous glass with a straight-through gradient: forward
    pass snaps to the catalog, backward pass is the identity (the TF
    reference used ``tf.grad_pass_through``; see `lens_modeling.py:117-124`)."""
    snapped = map_glass_to_closest(g, catalog_g)
    return g + jax.lax.stop_gradient(snapped - g)


def load_catalog(path: str, dtype=jnp.float32) -> jnp.ndarray:
    """Load a headerless CSV glass catalog of (n_d, V_d) rows and return the
    normalized ``g`` coordinates, shape (N, 2). Mirrors the reference's
    catalog plumbing (`optics_simulator_lite.py:397-399`)."""
    raw = np.loadtxt(path, delimiter=",", dtype=np.float32)
    g = g_from_n_v(jnp.asarray(raw[:, 0], dtype=dtype),
                   jnp.asarray(raw[:, 1], dtype=dtype))
    return jnp.reshape(g, (-1, 2))


def default_catalog_g(dtype=jnp.float32) -> jnp.ndarray:
    """Normalized ``g`` coordinates of the built-in Ohara glass catalog."""
    from torchoptics_tpu.models.catalog import OHARA_GLASSES
    raw = np.asarray(OHARA_GLASSES, dtype=np.float32)
    g = g_from_n_v(jnp.asarray(raw[:, 0], dtype=dtype),
                   jnp.asarray(raw[:, 1], dtype=dtype))
    return jnp.reshape(g, (-1, 2))
