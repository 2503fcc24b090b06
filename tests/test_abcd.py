"""Paraxial ABCD toolbox: identities and golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import Lens, Structure, abcd, zoo


def test_reduce_abcd_matches_sequential():
    rng = np.random.default_rng(1)
    for s in (1, 2, 3, 5, 8):
        mats = jnp.asarray(rng.normal(size=(2, s, 2, 2)).astype(np.float32))
        got = abcd.reduce_abcd(mats)
        want = np.eye(2, dtype=np.float32)[None].repeat(2, 0)
        for k in range(s):
            want = np.asarray(mats[:, k]) @ want
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_interface_propagation_identity_for_flat_air():
    c = jnp.zeros((1, 3))
    t = jnp.zeros((1, 3))
    n = jnp.ones((1, 4))
    m = abcd.interface_propagation_abcd(c, t, n)
    np.testing.assert_allclose(np.asarray(m),
                               np.broadcast_to(np.eye(2), (1, 3, 2, 2)))


def test_thin_lens_efl():
    # Thin lens in air: 1/f = (n-1) (c1 - c2). Use tiny thickness.
    n_glass = 1.5
    c1, c2 = 0.02, -0.02
    st = Structure((0,), ("GA",))
    lens = Lens(st, jnp.asarray([c1, c2]), jnp.asarray([1e-6, 10.0]),
                jnp.asarray([n_glass]), jnp.asarray([50.0]))
    efl = np.asarray(lens.efl)[0]
    assert abs(efl - 1.0 / ((n_glass - 1) * (c1 - c2))) < 1e-2


def test_thick_lens_efl_analytic():
    # Lensmaker's equation with thickness term:
    # 1/f = (n-1)[c1 - c2 + (n-1) d c1 c2 / n]
    n, c1, c2, d = 1.6, 0.05, -0.03, 2.0
    st = Structure((0,), ("GA",))
    lens = Lens(st, jnp.asarray([c1, c2]), jnp.asarray([d, 5.0]),
                jnp.asarray([n]), jnp.asarray([50.0]))
    inv_f = (n - 1) * (c1 - c2 + (n - 1) * d * c1 * c2 / n)
    np.testing.assert_allclose(np.asarray(lens.efl)[0], 1.0 / inv_f, rtol=1e-5)


# EFL/BFL golden values for the shipped prescriptions, computed once with
# this implementation and cross-checked against the reference engine's
# get_first_order (ray_tracing_lite.py:772-794) run under torch
# (see test_reference_parity.py for the live oracle check).
GOLDEN_FIRST_ORDER = {
    "singlet": (17.156055, 16.696377),
    "doublet": (17.156054, 13.140834),
    "cooke": (17.156055, 13.628480),
    "tessar": (17.154442, 13.116776),
}


@pytest.mark.parametrize("name", sorted(GOLDEN_FIRST_ORDER))
def test_first_order_golden(name):
    specs, lens = zoo.build(name)
    efl, bfl = abcd.get_first_order(lens)
    want_efl, want_bfl = GOLDEN_FIRST_ORDER[name]
    np.testing.assert_allclose(np.asarray(efl)[0], want_efl, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bfl)[0], want_bfl, rtol=1e-5)
    # design intent: EFL == sensor_diag/2/tan(hfov) = 8/tan(25 deg) ~ 17.15
    assert 16.5 < float(efl[0]) < 18.0


GOLDEN_PUPIL_POSITION = {
    "singlet": 0.0,
    "doublet": 7.524702,
    "cooke": 4.5090384,
    "tessar": 6.3861899,
}


@pytest.mark.parametrize("name", sorted(GOLDEN_PUPIL_POSITION))
def test_pupil_position_golden(name):
    specs, lens = zoo.build(name)
    got = np.asarray(abcd.compute_pupil_position(lens))[0]
    np.testing.assert_allclose(got, GOLDEN_PUPIL_POSITION[name],
                               rtol=1e-5, atol=1e-6)


def test_magnification_is_A_element():
    specs, lens = zoo.build("cooke")
    nd = jnp.concatenate((jnp.ones_like(lens.nd[:, :1]), lens.nd), axis=1)
    full = abcd.reduce_abcd(abcd.interface_propagation_abcd(lens.c, lens.t, nd))
    np.testing.assert_allclose(np.asarray(abcd.compute_magnification(lens)),
                               np.asarray(full[:, 0, 0]))


@pytest.mark.parametrize("name", ["cooke", "tessar", "doublet", "singlet"])
def test_compute_last_curvature_enforces_unit_efl(name):
    specs, lens = zoo.build(name)
    # Scale so EFL == 1, then ask the solver to recover the last curvature.
    unit = lens.scale(1.0 / lens.efl)
    st = unit.structure
    c_full = abcd.compute_last_curvature(
        st, unit.flat_c_but_last, unit.flat_t, unit.flat_nd)
    solved = unit.with_flat_c(c_full)
    np.testing.assert_allclose(np.asarray(solved.efl), 1.0, rtol=1e-4)
    # For these all-"...GA" systems the solved curvature is the original.
    np.testing.assert_allclose(np.asarray(solved.flat_c),
                               np.asarray(unit.flat_c), rtol=1e-3, atol=1e-5)


def test_compute_last_curvature_air_air_tail():
    # System ending in "...GAA": the solved curvature sits one surface early.
    st = Structure((0,), ("GAA",))
    lens = Lens(st, jnp.asarray([0.05, -0.05, 0.0]),
                jnp.asarray([0.5, 2.0, 1.0]),
                jnp.asarray([1.6]), jnp.asarray([50.0]))
    c_full = abcd.compute_last_curvature(
        st, lens.flat_c_but_last, lens.flat_t, lens.flat_nd)
    solved = lens.with_flat_c(c_full)
    np.testing.assert_allclose(np.asarray(solved.efl), 1.0, rtol=1e-4)
    # last surface stays flat (air-air)
    assert float(solved.flat_c[-1]) == 0.0


def test_paraxial_heights_sign_and_scale():
    specs, lens = zoo.build("cooke")
    h = abcd.get_paraxial_heights_at_image_plane(specs, lens, [0.0, 0.5, 1.0])
    h = np.asarray(h)[0]
    assert h[0] == 0.0
    # image height at full field should be near sensor semi-diagonal (8)
    assert 6.0 < abs(h[2]) < 10.0
    efl, bfl = (np.asarray(a)[0] for a in abcd.get_first_order(lens))
    # paraxial height ~ tan(hfov) * (focal-ish distance): same sign as field
    assert np.sign(h[2]) == np.sign(float(specs.hfov[0]))
