"""Differentiable point-spread functions from traced spot coordinates.

Port of the reference's soft-histogram PSF (`ray_tracing.py:206-270`, TF-only
there; the torch twin kept it commented out at
`ray_tracing_lite.py:211-275`): rays are splatted onto a pixel grid with a
Gaussian kernel of σ = pixel/2, the x half is mirrored (lens systems are
meridionally symmetric), and kernels are normalized to unit area. All shapes
static; fully fusable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def compute_psf(x: jnp.ndarray, y: jnp.ndarray,
                n_bins: Tuple[int, int] = (21, 21),
                increment: Optional[float] = None,
                y_target: Optional[jnp.ndarray] = None,
                weights: Optional[jnp.ndarray] = None):
    """Soft-histogram PSF per (system, field) grid.

    Args:
      x, y: spot coordinates, shape (n_lens, n_fields, n_channels, n_rays)
        (note: channels before rays, as in `ray_tracing.py:208`).
      n_bins: (n_x_bins, n_y_bins) PSF grid size.
      increment: pixel pitch; None sizes the grid from the data extents.
      y_target: (n_lens * n_fields,) grid centers; None uses the y centroid.
      weights: optional per-ray splat weights, broadcastable to
        (n_lens * n_fields, n_channels, n_rays) — used to assign arbitrary
        wavelength sets to color channels (zero weight = ray invisible to
        that channel); the accounted fraction is weighted accordingly.

    Returns:
      (x_size, y_size, y_target, kernels, accounted_ray_proportion) with
      kernels of shape (n_grids, n_channels, n_y_bins, n_x_bins).
    """
    nw = x.shape[-2]
    n_grids = x.shape[0] * x.shape[1]
    n_x_bins, n_y_bins = n_bins

    if y_target is None:
        y_target = jnp.mean(y.reshape(n_grids, -1), axis=1)

    y = y.reshape(n_grids, nw, -1) - y_target[:, None, None]
    x = x.reshape(n_grids, nw, -1)

    if increment is not None:
        x_incr = y_incr = jnp.full((n_grids,), increment, dtype=x.dtype)
        x_size = jnp.full((n_grids,), increment * n_x_bins, dtype=x.dtype)
        # The reference sizes y by n_x_bins here (`ray_tracing.py:226`) —
        # wrong for non-square grids; intended behavior implemented.
        y_size = jnp.full((n_grids,), increment * n_y_bins, dtype=x.dtype)
    else:
        y_min = jnp.min(y.reshape(n_grids, -1), axis=1)
        y_max = jnp.max(y.reshape(n_grids, -1), axis=1)
        x_size = jnp.max(x.reshape(n_grids, -1), axis=1)
        y_size = 2 * jnp.maximum(y_max, -y_min)
        x_incr = x_size / n_x_bins
        y_incr = y_size / n_y_bins

    # Half-grid pixel centers in x (meridional symmetry fold,
    # `ray_tracing.py:238-243`).
    if n_x_bins % 2 == 1:
        gx = jnp.arange(n_x_bins // 2 + 1, dtype=x.dtype)[None, :] * x_incr[:, None]
    else:
        gx = (jnp.arange(n_x_bins // 2, dtype=x.dtype) + 0.5)[None, :] * x_incr[:, None]
    gy = ((jnp.arange(n_y_bins, dtype=x.dtype) + 0.5 - n_y_bins / 2)[None, :]
          * y_incr[:, None])

    sigma_x = x_incr / 2
    sigma_y = y_incr / 2
    dx2 = (x.reshape(n_grids, nw, 1, 1, -1)
           - gx.reshape(n_grids, 1, 1, -1, 1)) ** 2
    dy2 = (y.reshape(n_grids, nw, 1, 1, -1)
           - gy.reshape(n_grids, 1, -1, 1, 1)) ** 2
    gaussian = (jnp.exp(-(dx2 / sigma_x.reshape(-1, 1, 1, 1, 1) ** 2) / 2)
                * jnp.exp(-(dy2 / sigma_y.reshape(-1, 1, 1, 1, 1) ** 2) / 2))
    if weights is not None:
        weights = jnp.broadcast_to(jnp.asarray(weights, x.dtype),
                                   x.shape)                # (g, nw, n_rays)
        gaussian = gaussian * weights[:, :, None, None, :]
    kernels = jnp.sum(gaussian, axis=-1)  # (n_grids, nw, n_y, n_x_half)

    if n_x_bins % 2 == 1:
        kernels = jnp.concatenate(
            (jnp.flip(kernels[..., 1:], axis=-1), kernels), axis=-1)
    else:
        kernels = jnp.concatenate(
            (jnp.flip(kernels, axis=-1), kernels), axis=-1)

    # max() guards channels with no assigned wavelengths (W < n_channels);
    # a real channel's Gaussian sum is strictly positive, so this is exact.
    kernels = kernels / jnp.maximum(
        jnp.sum(kernels, axis=(-1, -2), keepdims=True), 1e-20)

    accounted = ((jnp.abs(y) < y_size[:, None, None] / 2)
                 & (jnp.abs(x) < x_size[:, None, None] / 2))
    if weights is None:
        accounted_ray_proportion = jnp.mean(accounted.astype(x.dtype),
                                            axis=(-1, -2))
    else:
        wsum = jnp.maximum(jnp.sum(weights, axis=(-1, -2)), 1e-20)
        accounted_ray_proportion = jnp.sum(
            accounted.astype(x.dtype) * weights, axis=(-1, -2)) / wsum

    return x_size, y_size, y_target, kernels, accounted_ray_proportion


def compute_mtf(psf: jnp.ndarray, pixel_size: float):
    """Geometric MTF from a sampled PSF: the normalized magnitude of its
    discrete Fourier transform (TPU-build superset; the reference computes
    no transfer function). Differentiable — usable as an optimization
    objective ("maximize MTF at 50 cyc/mm").

    Args:
      psf: (..., n_y, n_x) sampled PSF (any non-negative normalization;
        the transform is normalized by its own DC term).
      pixel_size: PSF grid pitch in mm.

    Returns:
      dict with ``freqs_t``/``mtf_t`` — the tangential cut (modulation
      along y, the meridional direction; shapes (n_y//2+1,) and
      (..., n_y//2+1)) — and ``freqs_s``/``mtf_s``, the sagittal cut
      (along x). Frequencies in cycles/mm.
    """
    n_y, n_x = psf.shape[-2], psf.shape[-1]
    # 1-D transforms of the line-spread functions (projection-slice
    # theorem: the central slice of the 2-D MTF equals the 1-D transform
    # of the PSF projected onto that axis).
    lsf_y = jnp.sum(psf, axis=-1)                     # (..., n_y)
    lsf_x = jnp.sum(psf, axis=-2)                     # (..., n_x)
    mtf_t = jnp.abs(jnp.fft.rfft(lsf_y, axis=-1))
    mtf_s = jnp.abs(jnp.fft.rfft(lsf_x, axis=-1))
    mtf_t = mtf_t / jnp.maximum(mtf_t[..., :1], 1e-20)
    mtf_s = mtf_s / jnp.maximum(mtf_s[..., :1], 1e-20)
    return {
        "freqs_t": jnp.asarray(np.fft.rfftfreq(n_y, d=pixel_size), psf.dtype),
        "mtf_t": mtf_t,
        "freqs_s": jnp.asarray(np.fft.rfftfreq(n_x, d=pixel_size), psf.dtype),
        "mtf_s": mtf_s,
    }


def channel_assignment(n_wavelengths: int, n_channels: int = 3):
    """Static wavelength -> color-channel map: consecutive groups, sized as
    evenly as possible (``channel_of[i] = i * C // W``). For W a multiple
    of C this reproduces the reference's ``reshape(C, W//C)`` grouping
    (`optics_simulator_lite.py:660-663`)."""
    return [i * n_channels // n_wavelengths for i in range(n_wavelengths)]


def sample_psfs(x: jnp.ndarray, y: jnp.ndarray, y_center: jnp.ndarray,
                psf_size: Tuple[int, int], psf_increment: float,
                n_channels: int = 3):
    """Sample per-field PSFs from trace outputs
    (reference `optics_simulator_lite.py:656-677`, dormant there).

    Args:
      x, y: (1, n_fields, n_pupil, n_wavelengths) spot coordinates.
      y_center: (n_fields,) PSF grid centers on the image plane.
      n_channels: color channels of the rendered image (default RGB).
        Any wavelength count works: wavelengths are grouped into channels
        by :func:`channel_assignment` (the reference's reshape only
        handled W a multiple of 3).

    Returns:
      (psfs, accounted_energy): psfs (n_fields, n_y, n_x, n_channels)
      stacked and vertically flipped to image orientation.
    """
    W = x.shape[-1]
    # Combine wavelengths-per-channel into the ray dimension.
    x = jnp.transpose(x, (0, 1, 3, 2))  # (1, F, W, P)
    y = jnp.transpose(y, (0, 1, 3, 2))
    weights = None
    if W % n_channels == 0:
        # Even grouping: exact reshape, no redundant splats.
        x = x.reshape(*x.shape[:2], n_channels, -1)
        y = y.reshape(*y.shape[:2], n_channels, -1)
    else:
        # Uneven W: every ray is splatted into every channel with a static
        # one-hot weight selecting its assigned channel.
        ch = np.asarray(channel_assignment(W, n_channels))
        onehot = (ch[None, :] == np.arange(n_channels)[:, None])
        P = x.shape[-1]
        weights = jnp.asarray(
            np.repeat(onehot, P, axis=1)[None], x.dtype)  # (1, C, W*P)
        x = jnp.broadcast_to(x.reshape(*x.shape[:2], 1, -1),
                             x.shape[:2] + (n_channels, W * P))
        y = jnp.broadcast_to(y.reshape(*y.shape[:2], 1, -1),
                             y.shape[:2] + (n_channels, W * P))

    # Mirror every ray in x (meridional symmetry).
    x = jnp.concatenate((x, -x), axis=3)
    y = jnp.concatenate((y, y), axis=3)
    if weights is not None:
        weights = jnp.concatenate((weights, weights), axis=2)

    *_, y_centroid, psfs, accounted = compute_psf(
        x, y, n_bins=psf_size, increment=psf_increment, y_target=y_center,
        weights=weights)
    psfs = jnp.transpose(psfs, (0, 2, 3, 1))   # (F, n_y, n_x, C)
    psfs = jnp.flip(psfs, axis=1)
    return psfs, accounted
