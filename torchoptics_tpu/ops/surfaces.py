"""Surface geometry: sag models, ray-surface intersection, refraction.

The reference traces **spherical surfaces only**, with a closed-form
intersection (`ray_tracing_lite.py:525-545`) and a sphere-specialized Snell
update (`ray_tracing_lite.py:548-571`). This module reimplements both with
identical failure-mask semantics — the masks shape gradients and must match —
and adds the TPU-build superset required by BASELINE.json: conic + even
aspheric sag with fixed-iteration Newton intersection and implicit
differentiation.

Conventions (vertex-local frame, as in the reference):
  * surface vertex at z = 0, axis along +z;
  * sag(r²) = c r² / (1 + sqrt(1 - (1+κ) c² r²)) + Σ_k a_k (r²)^(k+2)
    (even asphere, terms r⁴, r⁶, …);
  * direction cosines (cx, cy, cz) are unit vectors;
  * the surface unit normal at the hit point is
    n̂ = (2x g, 2y g, -1) / sqrt(1 + 4 r² g²) with g = d sag / d(r²),
    which reduces exactly to the reference's spherical normal
    (c·x, c·y, c·z − 1).

Failure-mask policy (reference `ray_tracing_lite.py:538-540, 556-567`):
missed surfaces, TIR, and numerical cz² collapse mark rays failed; the
guarded values keep the computation NaN-free in both passes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-6


class Intersection(NamedTuple):
    failures: jnp.ndarray   # bool — ray missed the surface
    distance: jnp.ndarray   # marching distance along the ray
    cos_theta: jnp.ndarray  # |cos| of incidence angle (guarded)
    cos2_theta: jnp.ndarray  # raw cos² of incidence angle


def update_ray_coordinates(x, y, z, cx, cy, cz, distance):
    """Advance a ray by ``distance`` (reference `ray_tracing_lite.py:514-522`)."""
    delta_z = distance * cz
    return x + distance * cx, y + distance * cy, z + delta_z, delta_z


def find_marching_distance_spherical(c, x, y, z, cx, cy, cz) -> Intersection:
    """Closed-form ray ↔ sphere intersection in the vertex-local frame.

    Reference `ray_tracing_lite.py:525-545`, including the numerically stable
    quotient form of the quadratic root and the cos²θ ≥ eps miss test.
    """
    e = -(x * cx + y * cy + z * cz)
    mz = z + e * cz
    m2 = x ** 2 + y ** 2 + z ** 2 - e ** 2
    temp = c * m2 - 2.0 * mz
    cos2_theta = cz ** 2 - c * temp

    failures = cos2_theta - EPS < 0
    cos_theta = jnp.sqrt(jnp.where(failures, 1.0, cos2_theta))
    dist = e + temp / (cz + cos_theta)
    return Intersection(failures, dist, cos_theta, cos2_theta)


def apply_snell_spherical(c, mu, x, y, cx, cy, cos_theta):
    """Snell's law on direction cosines at a spherical interface.

    Reference `ray_tracing_lite.py:548-571`: TIR mask via cos²θ' ≥ eps, then
    cz recovered from renormalization with its own failure guard.
    """
    cos2_prime = 1.0 - mu ** 2 * (1.0 - cos_theta ** 2)
    failures = cos2_prime - EPS < 0

    cos_prime = jnp.sqrt(jnp.where(failures, 1.0, cos2_prime))
    g = cos_prime - mu * cos_theta
    cx = mu * cx - g * c * x
    cy = mu * cy - g * c * y
    cz2 = 1.0 - (cx ** 2 + cy ** 2)

    failures = failures | (cz2 - EPS < 0)
    cz = jnp.sqrt(jnp.where(failures, 1.0, cz2))
    return failures, cx, cy, cz, cos2_prime


def reset_bad_rays(ray_ok, x, y, z, cx, cy, cz, normalize: bool = False):
    """Zero-out failed rays so neither pass produces NaNs
    (reference `ray_tracing_lite.py:574-591`). Gradients through failed lanes
    are exactly zero — this shapes the optimization landscape and must be
    preserved."""
    x = jnp.where(ray_ok, x, 0.0)
    y = jnp.where(ray_ok, y, 0.0)
    z = jnp.where(ray_ok, z, 0.0)
    cx = jnp.where(ray_ok, cx, 0.0)
    cy = jnp.where(ray_ok, cy, 0.0)
    cz = jnp.where(ray_ok, cz, 1.0)
    if normalize:
        norm = jnp.sqrt(cx ** 2 + cy ** 2 + cz ** 2)
        cx, cy, cz = cx / norm, cy / norm, cz / norm
    return x, y, z, cx, cy, cz


# ---------------------------------------------------------------------------
# Conic + even-asphere superset (not present in the reference; required by
# BASELINE.json's north star: "Newton-iteration intersection with
# conic+aspheric sag").
# ---------------------------------------------------------------------------


def sag_and_slope(c, kappa, asph, r2):
    """Evaluate sag s(r²) and g = ds/d(r²) for the conic + even asphere.

    ``kappa`` may be ``None`` (pure even asphere, zero conic). ``asph`` is
    ``None`` or an array of shape (..., K) holding coefficients of
    (r²)^(k+2), i.e. r⁴, r⁶, … terms, broadcastable against ``r2[..., None]``.
    """
    if kappa is None:
        kappa = 0.0
    u = (1.0 + kappa) * c ** 2 * r2
    # Domain guard: beyond the conic's valid aperture the sag is undefined;
    # callers must treat guard==True as a miss.
    guard = 1.0 - u < EPS
    root = jnp.sqrt(jnp.where(guard, 1.0, 1.0 - u))
    denom = 1.0 + root
    s = c * r2 / denom
    # d/d(r²) of c r²/(1+sqrt(1-(1+κ)c²r²)) = c/denom + c(1+κ)c² r²/(2 root denom²)
    g = c / denom + c * u / (2.0 * root * denom ** 2)
    if asph is not None:
        k = jnp.arange(asph.shape[-1])
        powers = k + 2.0
        r2e = r2[..., None]
        s = s + jnp.sum(asph * r2e ** powers, axis=-1)
        g = g + jnp.sum(asph * powers * r2e ** (powers - 1.0), axis=-1)
    return s, g, guard


def _newton_f(c, kappa, asph, x, y, z, cx, cy, cz, s):
    """F(s) = z(s) − sag(r²(s)) and its derivative along the ray."""
    xs = x + s * cx
    ys = y + s * cy
    zs = z + s * cz
    r2 = xs ** 2 + ys ** 2
    sag, g, guard = sag_and_slope(c, kappa, asph, r2)
    f = zs - sag
    fp = cz - g * 2.0 * (xs * cx + ys * cy)
    return f, fp, guard


def find_marching_distance_asphere(c, kappa, asph, x, y, z, cx, cy, cz,
                                   n_iter: int = 10,
                                   tol: float = 1e-5) -> Intersection:
    """Ray ↔ (conic + even asphere) intersection by Newton iteration.

    Strategy (all shapes static, fully fusable under jit):
      1. initial guess = closed-form intersection with the best-fit sphere
         (falling back to the vertex plane for near-flat surfaces);
      2. ``n_iter`` Newton steps under ``stop_gradient``;
      3. one *attached* Newton step — by the implicit function theorem this
         yields the exact first-order derivative of the root w.r.t. all
         surface/ray parameters while keeping the backward pass O(1) in
         ``n_iter``.

    Failure mask: sphere-guess miss is NOT fatal (the asphere may still be
    hit); fatal conditions are sag-domain violation at the solution,
    non-convergence (|F| > tol), negative incidence cos², or a stationary
    Newton derivative.
    """
    sph = find_marching_distance_spherical(c, x, y, z, cx, cy, cz)
    plane = jnp.where(jnp.abs(cz) > EPS, -z / jnp.where(jnp.abs(cz) > EPS, cz, 1.0), 0.0)
    s0 = jnp.where(sph.failures, plane, sph.distance)

    def body(s, _):
        f, fp, _ = _newton_f(c, kappa, asph, x, y, z, cx, cy, cz, s)
        fp_safe = jnp.where(jnp.abs(fp) > EPS, fp,
                            jnp.where(fp >= 0, EPS, -EPS))
        return s - f / fp_safe, None

    s_star = jax.lax.stop_gradient(
        jax.lax.scan(body, s0, None, length=n_iter)[0])

    # Attached polish step: s = s* − F(s*)/F'(s*) with s* constant.
    f, fp, guard = _newton_f(c, kappa, asph, x, y, z, cx, cy, cz, s_star)
    stationary = jnp.abs(jax.lax.stop_gradient(fp)) < EPS
    fp_safe = jnp.where(stationary, 1.0, fp)
    dist = s_star - f / fp_safe

    not_converged = jnp.abs(jax.lax.stop_gradient(f)) > tol

    # Incidence angle at the hit point: cosθ = −d·n̂.
    xs = x + dist * cx
    ys = y + dist * cy
    r2 = xs ** 2 + ys ** 2
    _, g, guard2 = sag_and_slope(c, kappa, asph, r2)
    norm2 = 1.0 + 4.0 * r2 * g ** 2
    inv_norm = jax.lax.rsqrt(norm2)
    cos_theta_raw = (cz - 2.0 * g * (xs * cx + ys * cy)) * inv_norm
    cos2_theta = cos_theta_raw ** 2

    failures = guard | guard2 | stationary | not_converged | (cos2_theta - EPS < 0)
    cos_theta = jnp.sqrt(jnp.where(failures, 1.0, cos2_theta))
    return Intersection(failures, dist, cos_theta, cos2_theta)


def apply_snell_general(c, kappa, asph, mu, x, y, cx, cy, cz, cos_theta):
    """Snell's law for a general sag surface using the true unit normal.

    d' = μ d − (cosθ' − μ cosθ) n̂ with n̂ = (2xg, 2yg, −1)/√(1+4r²g²);
    reduces bit-for-bit to ``apply_snell_spherical`` when κ = asph = 0 up to
    the normal parameterization. Same TIR / cz² failure-mask policy.
    """
    cos2_prime = 1.0 - mu ** 2 * (1.0 - cos_theta ** 2)
    failures = cos2_prime - EPS < 0
    cos_prime = jnp.sqrt(jnp.where(failures, 1.0, cos2_prime))
    gsnell = cos_prime - mu * cos_theta

    r2 = x ** 2 + y ** 2
    _, g, _ = sag_and_slope(c, kappa, asph, r2)
    inv_norm = jax.lax.rsqrt(1.0 + 4.0 * r2 * g ** 2)
    nx = 2.0 * x * g * inv_norm
    ny = 2.0 * y * g * inv_norm

    cx = mu * cx - gsnell * nx
    cy = mu * cy - gsnell * ny
    cz2 = 1.0 - (cx ** 2 + cy ** 2)
    failures = failures | (cz2 - EPS < 0)
    cz = jnp.sqrt(jnp.where(failures, 1.0, cz2))
    return failures, cx, cy, cz, cos2_prime
