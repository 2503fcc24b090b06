"""Pupil samplers, vignetting, EPD scaling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu.ops import pupil


def test_tee():
    x, y = pupil.tee()
    np.testing.assert_array_equal(np.asarray(x).ravel(), [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(y).ravel(), [-1, 1, 0])


def test_meridional_sagittal_chief():
    x, y = pupil.meridional_uniform(5)
    np.testing.assert_allclose(np.asarray(y).ravel(), [-1, -0.5, 0, 0.5, 1])
    assert (np.asarray(x) == 0).all()
    x, y = pupil.sagittal_uniform(3)
    np.testing.assert_allclose(np.asarray(x).ravel(), [0, 0.5, 1])
    assert (np.asarray(y) == 0).all()
    x, y = pupil.chief()
    assert x.shape == (1, 1, 1, 1) and float(x[0, 0, 0, 0]) == 0.0


def test_circle_shapes_and_radius():
    x, y = pupil.circle(4, 8)
    r = np.hypot(np.asarray(x).ravel(), np.asarray(y).ravel())
    assert x.shape == (1, 1, 32, 1)
    assert (r <= 1.0 + 1e-6).all()
    # first ring is at r=0
    assert (r[:8] == 0).all()


def test_circle_pseudo_random_stratified():
    key = jax.random.PRNGKey(0)
    x, y = pupil.circle_pseudo_random(key, 2, 8, 8)
    assert x.shape == (2, 1, 64, 1)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # stratification: each radial shell occupied
    r2 = r2.reshape(2, 8, 8)
    shell_lo = (np.arange(8) / 8)[None, :, None]
    shell_hi = shell_lo + 1 / 8
    assert ((r2 >= shell_lo - 1e-6) & (r2 <= shell_hi + 1e-6)).all()
    # per-system independence
    assert not np.allclose(np.asarray(x)[0], np.asarray(x)[1])


def test_skew_half_samplers_right_half():
    for fn, args in ((pupil.skew_uniform_half_equidistant, (4, 2)),
                     (pupil.skew_uniform_half_jittered, (4, 2)),
                     (pupil.skew_inner_square_half, (4,))):
        x, y = fn(*args)
        assert (np.asarray(x) >= -1e-6).all(), fn.__name__
        r = np.hypot(np.asarray(x), np.asarray(y))
        assert (r <= 1.0 + 1e-6).all(), fn.__name__


def test_skew_uniform_counts():
    x, _ = pupil.skew_uniform_half_equidistant(4, 2)
    assert x.shape[2] == 2 * 4 ** 2  # n_i * n_r^2
    x, _ = pupil.skew_uniform_half_jittered(3, 5)
    assert x.shape[2] == 5 * 3 ** 2


def test_outer_edge():
    x, y = pupil.circle_outer_edge_uniform(16)
    r = np.hypot(np.asarray(x).ravel(), np.asarray(y).ravel())
    np.testing.assert_allclose(r, 1.0, rtol=1e-6)


def test_apply_vignetting():
    y = jnp.asarray(np.linspace(-1, 1, 5, dtype=np.float32)).reshape(1, 1, 5, 1)
    vig_up = jnp.asarray([[0.2]])
    vig_down = jnp.asarray([[0.1]])
    out = np.asarray(pupil.apply_vignetting(y, vig_up, vig_down)).ravel()
    # y=+1 -> 1 - vig_up; y=-1 -> -(1 - vig_down)
    np.testing.assert_allclose(out[-1], 0.8, rtol=1e-6)
    np.testing.assert_allclose(out[0], -0.9, rtol=1e-6)


def test_scale_to_epd():
    y = jnp.ones((2, 1, 3, 1))
    epd = jnp.asarray([2.0, 4.0])
    out = np.asarray(pupil.scale_to_epd(y, epd))
    np.testing.assert_allclose(out[0], 1.0)
    np.testing.assert_allclose(out[1], 2.0)


def test_sampler_dispatch_rejects_unknown():
    with pytest.raises(ValueError):
        pupil.sample_pupil("bogus", (4, 4), 1)
