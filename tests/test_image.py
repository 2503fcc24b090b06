"""Image formation: SVOLA convolution, bicubic warp, IQ metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu.ops import image as img_mod


def _delta_psfs(n_patches, k, c, batch=1):
    psf = np.zeros((batch, n_patches, k, k, c), np.float32)
    psf[:, :, k // 2, k // 2, :] = 1.0
    return jnp.asarray(psf)


def test_svola_identity_with_delta_psf():
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.uniform(0, 1, (1, 36, 36, 3)).astype(np.float32))
    psfs = _delta_psfs(9, 7, 3)
    out = img_mod.svola_convolution(im, 4, psfs, (3, 3), "hann")
    np.testing.assert_allclose(np.asarray(out), np.asarray(im),
                               rtol=1e-4, atol=1e-4)


def test_svola_energy_conservation_uniform_blur():
    rng = np.random.default_rng(1)
    im = jnp.asarray(rng.uniform(0.4, 0.6, (1, 32, 32, 1)).astype(np.float32))
    k = 5
    psf = np.full((1, 4, k, k, 1), 1.0 / (k * k), np.float32)
    out = img_mod.svola_convolution(im, 4, jnp.asarray(psf), (2, 2), "hann")
    # away from borders, a uniform image stays uniform under unit-sum blur
    inner = np.asarray(out)[0, 8:-8, 8:-8, 0]
    want = np.asarray(im)[0, 8:-8, 8:-8, 0]
    np.testing.assert_allclose(inner.mean(), want.mean(), rtol=2e-2)


def test_svola_fast_fft_sizes_matches_exact():
    # fft_fast_sizes pads the patch FFTs up to the next 2^a·3^b·5^c length;
    # the kept (valid) region must be unchanged to FFT roundoff.
    rng = np.random.default_rng(7)
    im = jnp.asarray(rng.uniform(0, 1, (1, 33, 39, 2)).astype(np.float32))
    psfs = jnp.asarray(
        rng.uniform(0, 1, (1, 9, 7, 7, 2)).astype(np.float32))
    ref = img_mod.svola_convolution(im, 5, psfs, (3, 3), "hann")
    fast = img_mod.svola_convolution(im, 5, psfs, (3, 3), "hann",
                                     fft_fast_sizes=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_next_fast_fft_len():
    assert [img_mod.next_fast_fft_len(n) for n in
            (1, 2, 7, 97, 99, 101, 120, 121, 128, 131)] == \
        [1, 2, 8, 100, 100, 108, 120, 125, 128, 135]


def test_svola_differentiable():
    im = jnp.ones((1, 24, 24, 1))
    psf = jnp.full((1, 4, 5, 5, 1), 1.0 / 25)

    def f(p):
        return jnp.sum(img_mod.svola_convolution(im, 3, p, (2, 2)))

    g = jax.grad(f)(psf)
    assert np.isfinite(np.asarray(g)).all()


def test_bicubic_identity_grid():
    rng = np.random.default_rng(2)
    im = jnp.asarray(rng.uniform(0, 1, (1, 16, 20, 3)).astype(np.float32))
    h, w = 16, 20
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    out = img_mod.interpolate_bicubic(im, jnp.asarray(xs.ravel(), jnp.float32),
                                      jnp.asarray(ys.ravel(), jnp.float32),
                                      (h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(im),
                               rtol=1e-4, atol=1e-4)


def test_bicubic_shift_moves_content():
    im = jnp.zeros((1, 16, 16, 1)).at[0, 8, 8, 0].set(1.0)
    h = w = 16
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    shift = 2.0 / (w - 1) * 2  # shift sampling by 2 pixels
    out = img_mod.interpolate_bicubic(
        im, jnp.asarray((xs + shift).ravel(), jnp.float32),
        jnp.asarray(ys.ravel(), jnp.float32), (h, w))
    got = np.asarray(out)[0, :, :, 0]
    assert got[8, 6] > 0.8  # content appears shifted left
    assert got[8, 8] < 0.2


def test_warp_batched():
    rng = np.random.default_rng(3)
    im = jnp.asarray(rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32))
    ys, xs = np.meshgrid(np.linspace(-1, 1, 12), np.linspace(-1, 1, 12),
                         indexing="ij")
    out = img_mod.apply_distortion_by_warping(
        im, jnp.asarray(xs.ravel(), jnp.float32),
        jnp.asarray(ys.ravel(), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(im),
                               rtol=1e-4, atol=1e-4)


def test_psnr_ssim():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
    assert float(img_mod.psnr(a, a)[0]) > 100
    np.testing.assert_allclose(float(img_mod.ssim(a, a)[0]), 1.0, rtol=1e-5)
    noisy = a + 25.0
    assert float(img_mod.psnr(a, noisy)[0]) == pytest.approx(20.2, abs=0.5)
    assert float(img_mod.ssim(a, noisy)[0]) < 1.0


def test_ssim_matches_tf_image_ssim_goldens():
    """Golden values precomputed with tf.image.ssim 2.21 (Gaussian 11x11
    window, sigma=1.5 — the reference's metric,
    `optics_simulator_lite.py:303`) on these exact seeded fixtures."""
    rng = np.random.default_rng(42)
    x = np.linspace(0, 1, 48)
    base = np.sin(8 * x)[:, None] * np.cos(5 * x)[None, :] * 0.5 + 0.5
    a = np.stack([base, base ** 2, np.sqrt(base)], axis=-1) * 255.0
    noise = rng.normal(0, 12.0, a.shape)
    b = np.clip(a + noise, 0, 255)
    a = a.astype(np.float32)[None]
    b = b.astype(np.float32)[None]
    assert float(img_mod.ssim(a, b, 255.0)[0]) == pytest.approx(
        0.77833, abs=2e-5)
    assert float(img_mod.psnr(a, b, 255.0)[0]) == pytest.approx(
        26.729393, abs=1e-4)

    c = rng.uniform(0, 1, (1, 40, 40, 1)).astype(np.float32)
    d = np.clip(c + rng.normal(0, 0.05, c.shape), 0, 1).astype(np.float32)
    assert float(img_mod.ssim(c, d, 1.0)[0]) == pytest.approx(
        0.98401785, abs=2e-5)
    assert float(img_mod.ssim(c, c, 1.0)[0]) == pytest.approx(1.0, abs=1e-6)


def test_linear_interpolation():
    vals = jnp.asarray([0.0, 1.0, 4.0])
    got = img_mod.linear_interpolation(jnp.asarray([0.5, 1.5, 2.0]), vals)
    np.testing.assert_allclose(np.asarray(got), [0.5, 2.5, 4.0], rtol=1e-6)


def test_psf_weights_sum_to_one():
    field_map = jnp.asarray(np.random.default_rng(5).uniform(
        0, 1, (27, 27)).astype(np.float32))
    w = img_mod.get_psf_weights(3, 3, field_map, 5)
    assert w.shape == (9, 5)
    np.testing.assert_allclose(np.asarray(w).sum(axis=1), 1.0, rtol=1e-5)


def test_rotate_image_bilinear_quarter_turn():
    im = jnp.zeros((1, 9, 9, 1)).at[0, 2, 4, 0].set(1.0)
    out = img_mod.rotate_image_bilinear(im, jnp.asarray([np.pi / 2]))
    got = np.asarray(out)[0, :, :, 0]
    # the bright pixel moves to a 90-deg rotated position
    assert got[4, 2] + got[4, 6] > 0.8


def test_rotate_and_resize_psfs():
    rng = np.random.default_rng(6)
    psfs = jnp.asarray(rng.uniform(0, 1, (4, 9, 9, 3)).astype(np.float32))
    out = img_mod.rotate_and_resize_psfs(
        psfs, np.linspace(-1, 1, 8), np.linspace(-1, 1, 8), (2, 2), (7, 7))
    assert out.shape == (1, 4, 7, 7, 3)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(out, axis=(2, 3))), 1.0, rtol=1e-4)


def test_distortion_shift_interpolation():
    shifts = jnp.asarray([0.0, 0.01, 0.05])
    x = jnp.asarray([0.0, 0.5, 1.0])
    y = jnp.zeros(3)
    dx, dy = img_mod.interpolate_distortion_shifts(shifts, x, y)
    np.testing.assert_allclose(np.asarray(dy), 0.0, atol=1e-7)
    assert float(dx[0]) == 0.0
    assert float(dx[2]) == pytest.approx(0.05, rel=1e-5)


def test_warp_bicubic_shifts_matches_gather_bicubic():
    """Round-5: the gather-free tap-sum warp equals the interpolate_bicubic
    gather resampler (same neighbors, clamps, and Keys weights) for any
    shift map within the static bound — including at the borders where the
    coordinate clamp engages."""
    import jax
    from torchoptics_tpu.ops import image as image_mod

    rng = np.random.default_rng(3)
    B, H, W, C = 2, 37, 45, 3
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    # smooth-ish bounded shifts, deliberately pushing past the borders
    sx = jnp.asarray(3.5 * rng.standard_normal((H, W)), jnp.float32)
    sy = jnp.asarray(3.5 * rng.standard_normal((H, W)), jnp.float32)
    M = 5
    sx = jnp.clip(sx, -M, M)
    sy = jnp.clip(sy, -M, M)

    out_taps = image_mod.warp_bicubic_shifts(img, sx, sy, M)

    # reference path: normalized coordinates through the gather resampler
    jjn = jnp.linspace(-1.0, 1.0, W)[None, :].repeat(H, 0)
    iin = jnp.linspace(-1.0, 1.0, H)[:, None].repeat(W, 1)
    xc = (jjn - sx * 2.0 / (W - 1)).reshape(-1)
    yc = (iin - sy * 2.0 / (H - 1)).reshape(-1)
    out_gather = image_mod.apply_distortion_by_warping(img, xc, yc)

    # The gather path round-trips coordinates through the normalized [-1,1]
    # grid; a coordinate ULP perturbs the cubic weights, so agreement is at
    # the f32 weight-noise level (observed max 2.1e-5 on this seed).
    np.testing.assert_allclose(np.asarray(out_taps), np.asarray(out_gather),
                               rtol=1e-4, atol=1e-4)
