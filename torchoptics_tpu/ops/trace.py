"""Exact skew ray tracing through a sequential surface chain.

TPU-native redesign of the reference's trace engine
(`ray_tracing_lite.py:26-127, 594-675` / `ray_tracing.py:26-203, 506-667`):

* The per-surface loop is **statically unrolled** over the padded surface
  count (≤ ~12 for real lenses), so XLA fuses the whole trace — forward and
  backward — into a single elementwise kernel over the
  (systems × fields × rays × wavelengths) block. A ``lax.scan`` engine is
  provided for long chains, and a Pallas kernel (``ops.pallas_trace``) keeps
  carries in VMEM for the production hot path.
* Configuration is a frozen, hashable dataclass (jit-static); RNG is an
  explicit ``jax.random`` key.
* Aggregate penalty stacks are requested by name so memory is only spent on
  what the loss consumes (the torch reference keeps
  z_RELU/theta_norm/theta_prime_norm, `ray_tracing_lite.py:641-657`; the TF
  twin keeps z/sin/sin_prime, `ray_tracing.py:637-646` — both sets are
  supported).

Failure-mask semantics are replicated exactly (miss, TIR, cz² collapse,
backward-ray bookkeeping) — they define the gradients at invalid rays.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.models.structure import Lens, Specs
from torchoptics_tpu.models import glass as glass_mod
from torchoptics_tpu.ops import abcd as abcd_mod
from torchoptics_tpu.ops import pupil as pupil_mod
from torchoptics_tpu.ops import surfaces as surf

# Aggregate stack names.
AGG_TORCH = ("z_RELU", "theta_norm", "theta_prime_norm")   # torch engine set
AGG_TF = ("z", "sin", "sin_prime")                          # TF engine set
# "dist" (TPU-build superset): per-surface geometric marching distance,
# with the final surface->image-plane leg appended (S+1 entries) — the
# building block for optical path lengths (ops.wavefront).
AGG_ALL = AGG_TORCH + AGG_TF + ("cos2", "cos2_prime", "x", "y", "dist")


class TraceResult(NamedTuple):
    x: jnp.ndarray            # (B, F, P, W) image-plane x
    y: jnp.ndarray            # (B, F, P, W) image-plane y
    cx: jnp.ndarray           # final direction cosines
    cy: jnp.ndarray
    ray_ok: jnp.ndarray       # (B, F, P, W) bool — traced successfully
    ray_backward: jnp.ndarray  # (B, F, P, W) bool — traveled backward
    stacks: Optional[Dict[str, jnp.ndarray]] = None  # name -> (S[+1], B, F, P, W)


@dataclass(frozen=True)
class TraceConfig:
    """Static ray-tracer configuration (reference ``RayTracer.__init__``,
    `ray_tracing_lite.py:26-78`). Hashable: safe as a jit-static argument."""

    mode: str = "skew_random"
    n_rays: Tuple[int, ...] = (8, 8)
    rel_fields: Tuple[float, ...] = (0.0, 0.707, 1.0)
    wavelengths: Tuple[Any, ...] = (656.3, 587.6, 486.1)
    vig_fn: Optional[Callable] = None
    n_ray_aiming_iter: int = 0
    ray_aiming_mode: str = "real"
    allow_backward_rays: bool = True
    double_precision: bool = False
    newton_iters: int = 10
    engine: str = "unroll"  # 'unroll' | 'scan' | 'pallas'

    def __post_init__(self):
        object.__setattr__(self, "n_rays", tuple(self.n_rays)
                           if isinstance(self.n_rays, (tuple, list)) else (self.n_rays,))
        object.__setattr__(self, "rel_fields", tuple(float(f) for f in self.rel_fields))
        object.__setattr__(self, "wavelengths",
                           glass_mod.resolve_wavelengths(self.wavelengths))
        if self.mode not in pupil_mod.SAMPLER_MODES:
            raise ValueError(
                f"Ray tracing mode must be one of {pupil_mod.SAMPLER_MODES}, "
                f"got {self.mode!r}")

    @property
    def dtype(self):
        return jnp.float64 if self.double_precision else jnp.float32


def _safe_sqrt(x, floor=0.0):
    """sqrt with a finite gradient at/below ``floor``.

    ``sqrt`` has an infinite derivative at 0, and ``0 * inf = NaN`` leaks
    through downstream ``where`` masks (the standard JAX where-grad hazard).
    Forward value is exact: sqrt(x) for x > floor, sqrt(floor) otherwise;
    the gradient below the floor is 0."""
    ok = x > floor
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), math.sqrt(floor))


def _agg_entry(name, ray_ok, z, cos2_theta, cos2_prime, full_shape):
    """One per-surface aggregate entry, broadcast to (B, F, P, W)."""
    eps = 1e-7
    if name == "z":
        return jnp.broadcast_to(z, full_shape)
    if name == "z_RELU":
        return jnp.broadcast_to(jnp.maximum(z, 0.0), full_shape)
    if name == "sin":
        return jnp.broadcast_to(_safe_sqrt(1.0 - cos2_theta), full_shape)
    if name == "sin_prime":
        return jnp.broadcast_to(_safe_sqrt(1.0 - cos2_prime), full_shape)
    if name == "cos2":
        return jnp.broadcast_to(cos2_theta, full_shape)
    if name == "cos2_prime":
        return jnp.broadcast_to(cos2_prime, full_shape)
    if name in ("theta_norm", "theta_prime_norm"):
        # Normalized incidence/refraction angle in [0, 1]; failed rays pinned
        # to 1 (reference `ray_tracing_lite.py:644-654`). cos² ≤ 0 only
        # occurs on lanes already failure-masked, so the sqrt guard keeps the
        # forward bit-identical while making the backward NaN-free.
        cos2 = cos2_theta if name == "theta_norm" else cos2_prime
        safe = _safe_sqrt(cos2)
        theta = jnp.arccos(jnp.clip(safe, -1.0 + eps, 1.0 - eps)) / (0.5 * math.pi)
        theta = jnp.where(ray_ok, theta, 1.0)
        return jnp.broadcast_to(theta, full_shape)
    raise ValueError(f"Unknown aggregate stack {name!r}; expected one of {AGG_ALL}")


def trace_skew(x, y, z, cx, cy, c, t, mu, mask,
               kappa=None, asph=None,
               aggregate: Tuple[str, ...] = (),
               allow_backward_rays: bool = True,
               newton_iters: int = 10,
               engine: str = "unroll") -> TraceResult:
    """March a batch of skew rays through every surface to the image plane.

    Reference `ray_tracing_lite.py:594-675`. Inputs are broadcastable within
    the (B, F, P, W) layout; per-surface parameters carry a trailing surface
    axis:

      c, t, mask: (B, 1, 1, 1, S);  mu: (B, 1, 1, W, S)
      kappa: like c (optional);     asph: (B, 1, 1, 1, S, K) (optional)

    ``engine='unroll'`` statically unrolls the surface loop (single XLA
    fusion — the TPU fast path); ``'scan'`` uses ``lax.scan`` (compile-time
    friendly for very long chains and for SPMD-partitioned CPU-mesh tests;
    spherical and conic/asphere). Both engines support ``aggregate`` stacks
    — the scan engine emits them as stacked scan ys.
    """
    n_surf = c.shape[-1]
    spherical = kappa is None and asph is None
    full_shape = jnp.broadcast_shapes(
        x.shape, y.shape, cx.shape, cy.shape, mu[..., 0].shape)

    ray_ok = jnp.ones(full_shape, dtype=bool)
    ray_backward = jnp.zeros(full_shape, dtype=bool)
    cz = jnp.sqrt(1.0 - cx ** 2 - cy ** 2)
    x, y, z, cx, cy, cz = [jnp.broadcast_to(a, full_shape).astype(c.dtype)
                           for a in (x, y, z, cx, cy, cz)]

    stacks = {k: [] for k in aggregate}

    def surface_step(k_params, state, prev_mask):
        (ck, tk, muk, maskk, kapk, asphk) = k_params
        x, y, z, cx, cy, cz, ray_ok, ray_backward = state

        if spherical:
            inter = surf.find_marching_distance_spherical(ck, x, y, z, cx, cy, cz)
        else:
            inter = surf.find_marching_distance_asphere(
                ck, kapk, asphk, x, y, z, cx, cy, cz, n_iter=newton_iters)

        x, y, z, delta_z = surf.update_ray_coordinates(
            x, y, z, cx, cy, cz, inter.distance)

        ray_ok = ray_ok & ~inter.failures
        x, y, z, cx, cy, cz = surf.reset_bad_rays(ray_ok, x, y, z, cx, cy, cz)

        if spherical:
            failures, cx, cy, cz, cos2_prime = surf.apply_snell_spherical(
                ck, muk, x, y, cx, cy, inter.cos_theta)
        else:
            failures, cx, cy, cz, cos2_prime = surf.apply_snell_general(
                ck, kapk, asphk, muk, x, y, cx, cy, cz, inter.cos_theta)

        # Backward-ray bookkeeping, skipping the pupil -> first-surface leg
        # (reference `ray_tracing_lite.py:625-632`).
        if prev_mask is not None:
            mask_k = ray_ok & prev_mask
            went_backward = (delta_z < 0) & mask_k
            if allow_backward_rays:
                ray_backward = ray_backward | went_backward
            else:
                ray_ok = ray_ok & ~went_backward

        ray_ok = ray_ok & ~failures
        x, y, z, cx, cy, cz = surf.reset_bad_rays(ray_ok, x, y, z, cx, cy, cz)

        z = z - tk
        state = (x, y, z, cx, cy, cz, ray_ok, ray_backward)
        return state, inter.cos2_theta, cos2_prime, inter.distance

    state = (x, y, z, cx, cy, cz, ray_ok, ray_backward)

    scan_stacks = None
    if engine == "scan":
        def scan_body(carry, xs):
            if spherical:
                ck, tk, muk, maskk, prev_maskk, first_k = xs
                kapk = asphk = None
            else:
                ck, tk, muk, maskk, prev_maskk, first_k, kapk, asphk = xs
            # prev_mask & ~first is all-False on the pupil -> first-surface
            # leg, making the bookkeeping a no-op there — same semantics as
            # the unrolled engine's prev_mask=None skip.
            state, cos2_theta, cos2_prime, distk = surface_step(
                (ck, tk, muk, maskk, kapk, asphk), carry,
                prev_maskk & ~first_k)
            x, y, z, _cx, _cy, _cz, ray_ok, _bw = state
            # Per-surface aggregate entries ride out as stacked scan ys —
            # same post-step state/locals as the unrolled engine uses.
            ys = tuple(
                jnp.broadcast_to(x if name == "x" else
                                 (y if name == "y" else distk), full_shape)
                if name in ("x", "y", "dist") else
                _agg_entry(name, ray_ok, z, cos2_theta, cos2_prime,
                           full_shape)
                for name in aggregate) or None
            return state, ys

        cs = jnp.moveaxis(c, -1, 0)
        ts = jnp.moveaxis(t, -1, 0)
        mus = jnp.moveaxis(mu, -1, 0)
        masks = jnp.moveaxis(mask, -1, 0)
        prev_masks = jnp.concatenate((masks[:1], masks[:-1]), axis=0)
        first = jnp.zeros((n_surf,) + (1,) * (masks.ndim - 1),
                          dtype=bool).at[0].set(True)
        xs = (cs, ts, mus, masks, prev_masks, first)
        if not spherical:
            xs = xs + (jnp.moveaxis(kappa, -1, 0),
                       jnp.moveaxis(asph, -2, 0))
        state, ys = jax.lax.scan(scan_body, state, xs)
        if aggregate:
            scan_stacks = {name: ys[i] for i, name in enumerate(aggregate)}
    else:
        for k in range(n_surf):
            params = (
                c[..., k], t[..., k], mu[..., k], mask[..., k],
                None if kappa is None else kappa[..., k],
                None if asph is None else asph[..., k, :],
            )
            prev_mask = mask[..., k - 1] if k > 0 else None
            state, cos2_theta, cos2_prime, dist_k = surface_step(
                params, state, prev_mask)
            if aggregate:
                x_, y_, z_, cx_, cy_, cz_, ok_, bw_ = state
                for name in aggregate:
                    if name == "x":  # per-surface hit heights
                        stacks[name].append(jnp.broadcast_to(x_, full_shape))
                    elif name == "y":
                        stacks[name].append(jnp.broadcast_to(y_, full_shape))
                    elif name == "dist":
                        stacks[name].append(
                            jnp.broadcast_to(dist_k, full_shape))
                    else:
                        stacks[name].append(_agg_entry(
                            name, ok_, z_, cos2_theta, cos2_prime,
                            full_shape))

    x, y, z, cx, cy, cz, ray_ok, ray_backward = state

    # Transfer to the image plane (reference `ray_tracing_lite.py:659-670`).
    delta_z = -z
    dist = delta_z / cz
    x = x + dist * cx
    y = y + dist * cy

    mask_last = ray_ok & mask[..., -1]
    went_backward = (delta_z < 0) & mask_last
    if allow_backward_rays:
        ray_backward = ray_backward | went_backward
    else:
        ray_ok = ray_ok & ~went_backward

    out_stacks = None
    if aggregate:
        out_stacks = (scan_stacks if scan_stacks is not None
                      else {k: jnp.stack(v, axis=0) for k, v in stacks.items()})
        if "z" in out_stacks:
            # The TF engine also records the image-plane z (== 0 after
            # transfer, in image-plane frame): `ray_tracing.py:664`.
            out_stacks["z"] = jnp.concatenate(
                (out_stacks["z"],
                 jnp.broadcast_to(z + delta_z, full_shape)[None]), axis=0)
        if "dist" in out_stacks:
            # Final leg: last surface -> image plane (see module header of
            # ops.wavefront for the OPL assembly that consumes this).
            out_stacks["dist"] = jnp.concatenate(
                (out_stacks["dist"],
                 jnp.broadcast_to(dist, full_shape)[None]), axis=0)

    return TraceResult(x, y, cx, cy, ray_ok, ray_backward, out_stacks)


def _broadcast_surface_params(lens: Lens, n: jnp.ndarray):
    """Arrange per-surface parameters into the 5-D trace layout
    (reference `ray_tracing_lite.py:87-89, 121-124`)."""
    B, S = lens.c.shape
    c = lens.c.reshape(B, 1, 1, 1, S)
    t = lens.t.reshape(B, 1, 1, 1, S)
    # n: (B, S, W) -> prepend air -> mu_k = n_k / n_{k+1}: (B, 1, 1, W, S)
    n_full = jnp.concatenate((jnp.ones_like(n[:, 0:1, :]), n), axis=1)
    n_full = jnp.transpose(n_full, (0, 2, 1))  # (B, W, S+1)
    mu = n_full[..., :-1] / n_full[..., 1:]
    mu = mu.reshape(B, 1, 1, mu.shape[1], S)
    mask = lens.structure.mask_jnp.reshape(B, 1, 1, 1, S)
    kappa = None if lens.kappa is None else lens.kappa.reshape(B, 1, 1, 1, S)
    asph = None if lens.asph is None else lens.asph.reshape(
        B, 1, 1, 1, S, lens.asph.shape[-1])
    return c, t, mu, mask, kappa, asph


def trace_rays(specs: Specs, lens: Lens, config: TraceConfig,
               key: Optional[jax.Array] = None,
               xy: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
               use_vig: bool = True,
               up_to_stop: bool = False,
               aggregate: Tuple[str, ...] = ()) -> TraceResult:
    """Trace a full bundle: dispersion → pupil placement → sampling →
    vignetting → ray aiming → EPD scaling → direction cosines → ``trace_skew``.

    Reference ``RayTracer.trace_rays`` (`ray_tracing_lite.py:80-127`).

    ``config.engine='pallas'`` dispatches to the fused TPU kernels —
    single-system spherical (``pallas_trace``), single-system conic/asphere
    (``pallas_asphere``), population-batched spherical (``pallas_batch``),
    or population-batched conic/asphere (``pallas_asphere``) — covering
    vignetting, ray aiming, backward-ray removal, and padded / heterogeneous
    structures. Unsupported requests raise instead of silently running
    another engine: ``double_precision`` (kernels are f32) and ``aggregate``
    stacks (use the fused penalty APIs or ``engine='unroll'``). Internal
    sub-traces (``xy`` given, or
    ``up_to_stop`` — the tiny stop-gradient ray-aiming solves) always run the
    jnp engine below.
    """
    internal = xy is not None or up_to_stop
    if config.engine == "pallas" and not internal:
        if config.double_precision:
            raise NotImplementedError(
                "engine='pallas' kernels are float32-only; use "
                "engine='unroll' for double_precision traces")
        if aggregate:
            raise NotImplementedError(
                "engine='pallas' does not materialize per-surface aggregate "
                "stacks; the losses that consume them have fused variants "
                "(pallas_trace.unsupervised_loss_fused, "
                "pallas_batch.batched_unsupervised_loss, "
                "simulator.do_ray_tracing/compute_losses with "
                "trace_engine='pallas') — or use engine='unroll'")
        if len(lens) == 1:
            if lens.is_spherical:
                from torchoptics_tpu.ops import pallas_trace
                return pallas_trace.trace_rays_fused(
                    specs, lens, config, key=key, use_vig=use_vig)
            # conic/asphere path; absent terms default to zeros
            from torchoptics_tpu.ops import pallas_asphere
            lens_a = lens
            if lens_a.kappa is None:
                lens_a = lens_a.replace(kappa=jnp.zeros_like(lens_a.c))
            if lens_a.asph is None:
                lens_a = lens_a.replace(asph=jnp.zeros(lens_a.c.shape + (1,)))
            return pallas_asphere.trace_rays_fused_asphere(
                specs, lens_a, config, key=key, use_vig=use_vig)
        if lens.is_spherical:
            from torchoptics_tpu.ops import pallas_batch
            return pallas_batch.trace_rays_fused_batch(
                specs, lens, config, key=key, use_vig=use_vig)
        from torchoptics_tpu.ops import pallas_asphere
        lens_a = lens
        if lens_a.kappa is None:
            lens_a = lens_a.replace(kappa=jnp.zeros_like(lens_a.c))
        if lens_a.asph is None:
            lens_a = lens_a.replace(asph=jnp.zeros(lens_a.c.shape + (1,)))
        return pallas_asphere.trace_rays_fused_asphere_batch(
            specs, lens_a, config, key=key, use_vig=use_vig)
    dtype = config.dtype
    if config.double_precision:
        specs = specs.astype(dtype)
        lens = lens.astype(dtype)

    n = lens.get_refractive_indices(config.wavelengths)  # (B, S, W)
    z = abcd_mod.compute_pupil_position(lens).reshape(-1, 1, 1, 1)

    if xy is None:
        xp_rel, yp_rel = pupil_mod.sample_pupil(
            config.mode, config.n_rays, len(lens), key=key)
    else:
        xp_rel, yp_rel = xy

    if use_vig and config.vig_fn is not None and config.mode != "chief":
        fields = jnp.asarray(config.rel_fields, dtype=dtype)[None, :]
        vig_up = config.vig_fn(fields, specs.vig_up)
        vig_down = config.vig_fn(fields, specs.vig_down)
        vig_x = config.vig_fn(fields, specs.vig_x)
        yp_rel = pupil_mod.apply_vignetting(yp_rel, vig_up, vig_down)
        xp_rel = pupil_mod.apply_vignetting(xp_rel, vig_x, vig_x)

    if config.n_ray_aiming_iter > 0 and not up_to_stop:
        from torchoptics_tpu.ops import aiming
        aiming_fn = aiming.ray_aiming(specs, lens.detach(), config, use_vig)
        xp_rel, yp_rel = [
            jax.lax.stop_gradient(jnp.clip(v, -2.0, 2.0))
            for v in aiming_fn(xp_rel, yp_rel)
        ]

    xp = pupil_mod.scale_to_epd(xp_rel, specs.epd)
    yp = pupil_mod.scale_to_epd(yp_rel, specs.epd)

    u = (specs.hfov[:, None]
         * jnp.asarray(config.rel_fields, dtype=dtype)[None, :])[..., None, None]
    cy = jnp.sin(u)
    cx = jnp.zeros((1, 1, 1, 1), dtype=dtype)

    c, t, mu, mask, kappa, asph = _broadcast_surface_params(lens, n)

    return trace_skew(
        xp.astype(dtype), yp.astype(dtype), z.astype(dtype), cx, cy,
        c, t, mu, mask, kappa=kappa, asph=asph,
        aggregate=aggregate,
        allow_backward_rays=config.allow_backward_rays,
        newton_iters=config.newton_iters,
        engine=config.engine)
