"""Soft-histogram PSF."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu.ops import psf as psf_mod


def _point_cloud(cx=0.0, cy=0.0, spread=0.01, n=64, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.normal(cx, spread, (1, 1, 1, n))).astype(np.float32)
    y = (rng.normal(cy, spread, (1, 1, 1, n))).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_psf_unit_area_and_shape():
    x, y = _point_cloud()
    xs, ys, y_t, kernels, acc = psf_mod.compute_psf(x, y, n_bins=(21, 21),
                                                    increment=0.004)
    assert kernels.shape == (1, 1, 21, 21)
    np.testing.assert_allclose(float(jnp.sum(kernels)), 1.0, rtol=1e-5)
    assert acc.shape == (1,)  # one value per (system, field) grid
    assert float(acc[0]) > 0.9


def test_psf_x_symmetry():
    x, y = _point_cloud()
    *_, kernels, _ = psf_mod.compute_psf(x, y, n_bins=(21, 21), increment=0.004)
    k = np.asarray(kernels)[0, 0]
    np.testing.assert_allclose(k, k[:, ::-1], rtol=1e-5, atol=1e-8)


def test_psf_even_bins():
    x, y = _point_cloud()
    *_, kernels, _ = psf_mod.compute_psf(x, y, n_bins=(20, 20), increment=0.004)
    assert kernels.shape[-1] == 20
    np.testing.assert_allclose(float(jnp.sum(kernels)), 1.0, rtol=1e-5)


def test_psf_centroid_centering():
    """A cloud centered off-axis with y_target at its centroid must peak at
    the grid center row."""
    x, y = _point_cloud(cy=0.35, spread=0.004)
    y_target = jnp.asarray([0.35])
    *_, kernels, acc = psf_mod.compute_psf(x, y, n_bins=(21, 21),
                                           increment=0.004, y_target=y_target)
    k = np.asarray(kernels)[0, 0]
    peak_row = np.unravel_index(np.argmax(k), k.shape)[0]
    assert abs(peak_row - 10) <= 1
    assert float(acc[0]) > 0.9


def test_psf_auto_extent():
    x, y = _point_cloud(spread=0.05)
    xs, ys, y_t, kernels, acc = psf_mod.compute_psf(x, y, n_bins=(15, 15))
    assert np.isfinite(np.asarray(kernels)).all()
    np.testing.assert_allclose(float(jnp.sum(kernels)), 1.0, rtol=1e-5)


def test_sample_psfs_rgb_stacking():
    rng = np.random.default_rng(1)
    n_fields, n_pupil, n_w = 3, 16, 3
    x = jnp.asarray(rng.normal(0, 0.01, (1, n_fields, n_pupil, n_w)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 0.01, (1, n_fields, n_pupil, n_w)).astype(np.float32))
    y_center = jnp.zeros((n_fields,))
    psfs, acc = psf_mod.sample_psfs(x, y, y_center, (17, 17), 0.004)
    assert psfs.shape == (n_fields, 17, 17, 3)
    sums = np.asarray(jnp.sum(psfs, axis=(1, 2)))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-4)
