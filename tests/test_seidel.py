"""Seidel (third-order) aberration sums vs the real-ray engine.

The Seidel layer is validated end to end against the package's own
oracle-pinned real-ray analyses: for small fields/apertures the
third-order predictions must close on the differential-fan field curves,
the quadratic LSA coefficient, and the ABCD axial color — across three
shipped designs, so the sign/factor conventions cannot be coincidental.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import analysis, metrics, trace, zoo

DESIGNS = ("cooke", "tessar", "double_gauss")


def _real_ray_numbers(specs, lens):
    f = 0.25
    cfg = trace.TraceConfig(mode="meridional_uniform", n_rays=(7,),
                            rel_fields=(0.0, f), wavelengths=("d",))
    fc = analysis.field_curvature(specs, lens, cfg, n=7, pupil_fraction=0.03)
    dzt = np.asarray(fc["dz_t"])[0, :, 0]
    dzs = np.asarray(fc["dz_s"])[0, :, 0]
    la = analysis.longitudinal_aberration(specs, lens, cfg, n=4,
                                          pupil_fraction=0.12)
    p = np.asarray(la["p"])
    dz = np.asarray(la["dz"])[0, :, 0]
    lsa_quad = np.linalg.lstsq(np.stack([np.ones_like(p), p ** 2], 1), dz,
                               rcond=None)[0][1]
    return {"dz_t": (dzt[1] - dzt[0]) / f ** 2,
            "dz_s": (dzs[1] - dzs[0]) / f ** 2,
            "lsa": lsa_quad}


@pytest.mark.parametrize("name", DESIGNS)
def test_seidel_closes_on_real_ray_engine(name):
    specs, lens = zoo.build(name)
    sd = analysis.seidel_coefficients(specs, lens)
    fs = {k: float(np.asarray(v)[0])
          for k, v in analysis.seidel_focal_shifts(sd).items()}
    real = _real_ray_numbers(specs, lens)
    # third-order predictions vs differential real rays: <=6% + 5 um slack
    np.testing.assert_allclose(fs["dz_t"], real["dz_t"], rtol=0.06, atol=5e-3)
    np.testing.assert_allclose(fs["dz_s"], real["dz_s"], rtol=0.06, atol=5e-3)
    np.testing.assert_allclose(fs["lsa_marginal"], real["lsa"],
                               rtol=0.06, atol=5e-3)
    # axial color: C1/u'^2 == the paraxial ABCD chromatic focal shift
    parax = float(np.asarray(metrics.compute_axial_color(lens, ("F", "C")))[0])
    np.testing.assert_allclose(fs["chromatic_shift"], parax,
                               rtol=0.05, atol=5e-4)


def test_seidel_per_surface_sums_and_shapes():
    specs, lens = zoo.build("cooke")
    sd = analysis.seidel_coefficients(specs, lens)
    S = lens.c.shape[1]
    for k in ("S1", "S2", "S3", "S4", "S5", "C1", "C2"):
        assert sd["per_surface"][k].shape == (1, S)
        np.testing.assert_allclose(np.asarray(sd[k]),
                                   np.asarray(sd["per_surface"][k]).sum(1),
                                   rtol=1e-6)
    # Petzval is a lens-only quantity: S4/H² = -Σ c·Δ(1/n) must be
    # invariant under a rescaled field (the chief ray changes, c·Δ(1/n)
    # does not)
    import dataclasses
    sd2 = analysis.seidel_coefficients(
        dataclasses.replace(specs, hfov=specs.hfov * 0.5), lens)
    np.testing.assert_allclose(
        np.asarray(sd["S4"]) / np.asarray(sd["H"]) ** 2,
        np.asarray(sd2["S4"]) / np.asarray(sd2["H"]) ** 2, rtol=1e-5)


def test_seidel_asphere_increments_close_on_real_rays():
    # aspherize one cooke surface; the third-order deltas must track the
    # real-ray (Newton-intersection) deltas
    specs, lens = zoo.build("cooke")
    asph = jnp.zeros(lens.c.shape + (1,), lens.dtype).at[0, 0, 0].set(2e-5)
    lens_a = lens.replace(asph=asph)

    def seid(l):
        fs = analysis.seidel_focal_shifts(
            analysis.seidel_coefficients(specs, l))
        return np.array([float(np.asarray(fs[k])[0])
                         for k in ("dz_t", "dz_s", "lsa_marginal")])

    def real(l):
        r = _real_ray_numbers(specs, l)
        return np.array([r["dz_t"], r["dz_s"], r["lsa"]])

    d_seid = seid(lens_a) - seid(lens)
    d_real = real(lens_a) - real(lens)
    np.testing.assert_allclose(d_seid, d_real, rtol=0.06)
    # a pure conic with the same a4 = kappa*c^3/8 must give the same sums
    kap = 8.0 * 2e-5 / float(np.asarray(lens.c)[0, 0]) ** 3
    lens_k = lens.replace(kappa=jnp.zeros_like(lens.c).at[0, 0].set(kap))
    np.testing.assert_allclose(seid(lens_k), seid(lens_a), rtol=1e-5)


def test_seidel_jit_grad():
    specs, lens = zoo.build("cooke")

    @jax.jit
    def spherical_sum(c):
        return analysis.seidel_coefficients(
            specs, lens.replace(c=c))["S1"][0]

    g = jax.grad(spherical_sum)(lens.c)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0
