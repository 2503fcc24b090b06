"""Ray fans, astigmatic field curves, longitudinal aberration (analysis).

Physics cross-checks on shipped designs: rotational symmetry on axis, the
closed-form best-focus optimality, and the paraxial (ABCD) axial-color
limit of the real-ray spherochromatism.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import analysis, metrics, trace, zoo


def _cfg(**kw):
    base = dict(mode="meridional_uniform", n_rays=(9,),
                rel_fields=(0.0, 1.0), wavelengths=("d",),
                n_ray_aiming_iter=0)
    base.update(kw)
    return trace.TraceConfig(**base)


def test_ray_fans_chief_zero_and_onaxis_symmetry():
    specs, lens = zoo.build("cooke")
    n = 9
    fans = analysis.ray_fans(specs, lens, _cfg(), n=n)
    eps_y = np.asarray(fans["eps_y"])        # (1, F, n, W)
    eps_x = np.asarray(fans["eps_x"])
    assert np.asarray(fans["ok_t"]).all() and np.asarray(fans["ok_s"]).all()
    chief = n // 2
    np.testing.assert_allclose(eps_y[:, :, chief], 0.0, atol=1e-9)
    np.testing.assert_allclose(eps_x[:, :, chief], 0.0, atol=1e-9)
    # on-axis: tangential fan is odd in py, and sagittal εx(p) == tangential
    # εy(p) by rotational symmetry
    on_t = eps_y[0, 0, :, 0]
    on_s = eps_x[0, 0, :, 0]
    np.testing.assert_allclose(on_t, -on_t[::-1], atol=2e-6)
    np.testing.assert_allclose(on_s, on_t, atol=2e-6)
    # off-axis the tangential fan must NOT be a pure odd function (coma)
    off = eps_y[0, 1, :, 0]
    assert np.abs(off + off[::-1]).max() > 1e-4


def test_ray_fans_rejects_even_n():
    specs, lens = zoo.build("cooke")
    with pytest.raises(ValueError):
        analysis.ray_fans(specs, lens, _cfg(), n=8)


def _tangential_spread(specs, lens, cfg, field_idx, dz, n=11, frac=0.25):
    """Weighted variance of a narrow tangential fan after shifting the image
    plane by dz (brute-force check of the closed-form best focus)."""
    rows = np.arange(len(lens))
    last = lens.structure.n_surfaces - 1
    shifted = lens.replace(t=lens.t.at[rows, last].add(dz))
    p = np.linspace(-1.0, 1.0, n, dtype=np.float32) * frac
    res = analysis._fan_trace(specs, shifted, cfg, np.zeros_like(p), p)
    y = np.asarray(res.y)[0, field_idx, :, 0]
    w = np.asarray(res.ray_ok)[0, field_idx, :, 0].astype(np.float64)
    m = (y * w).sum() / w.sum()
    return float((w * (y - m) ** 2).sum() / w.sum())


def test_field_curvature_optimality_and_onaxis_symmetry():
    specs, lens = zoo.build("cooke")
    cfg = _cfg(rel_fields=(0.0, 0.707, 1.0))
    fc = analysis.field_curvature(specs, lens, cfg, n=11, pupil_fraction=0.25)
    dz_t = np.asarray(fc["dz_t"])[0]          # (F, W)
    dz_s = np.asarray(fc["dz_s"])[0]
    assert np.isfinite(dz_t).all() and np.isfinite(dz_s).all()
    # rotational symmetry on axis: tangential == sagittal focus
    np.testing.assert_allclose(dz_t[0, 0], dz_s[0, 0], atol=1e-3)
    # a triplet has real astigmatism at the field edge
    assert abs(dz_t[2, 0] - dz_s[2, 0]) > 1e-3
    # the reported shift is the brute-force best focus of the same fan
    for f in (0, 2):
        best = _tangential_spread(specs, lens, cfg, f, dz_t[f, 0])
        for delta in (-0.2, 0.2):
            worse = _tangential_spread(specs, lens, cfg, f,
                                       dz_t[f, 0] + delta)
            assert best <= worse + 1e-12


def test_longitudinal_aberration_paraxial_limit_is_axial_color():
    specs, lens = zoo.build("cooke")
    cfg = _cfg(wavelengths=("F", "C"))
    # tiny aperture: real-ray dz(p->0) difference across λ must close on the
    # paraxial ABCD axial color
    la = analysis.longitudinal_aberration(specs, lens, cfg, n=2,
                                          pupil_fraction=0.02)
    dz = np.asarray(la["dz"])[0]              # (n, W)
    real_ax = dz[0, 0] - dz[0, 1]
    parax = float(np.asarray(metrics.compute_axial_color(lens, ("F", "C")))[0])
    np.testing.assert_allclose(real_ax, parax, rtol=0.05, atol=5e-4)


def test_longitudinal_aberration_marginal_exceeds_paraxial():
    specs, lens = zoo.build("cooke")
    la = analysis.longitudinal_aberration(specs, lens, _cfg(), n=8)
    dz = np.asarray(la["dz"])[0, :, 0]        # (n,)
    assert np.isfinite(dz).all()
    # spherical aberration: the marginal focus departs further than the
    # near-paraxial focus for a spherical-surface triplet
    assert abs(dz[-1] - dz[0]) > 1e-3


def test_lens_layout_draws_ray_paths():
    import matplotlib
    matplotlib.use("Agg", force=True)
    from torchoptics_tpu.utils.plotting import plot_lens_layout
    specs, lens = zoo.build("cooke")
    fig = plot_lens_layout(specs, lens, n_rays=5, show=False)
    ax = fig.axes[0]
    n_surf = int(lens.structure.n_surfaces[0])
    # surfaces + 2 fields x 5 rays of path overlays
    assert len(ax.lines) >= n_surf + 10
    # every ray path ends on the image plane
    z_img = float(np.asarray(lens.t)[0, :n_surf].sum())
    ray_lines = ax.lines[n_surf:]
    for ln in ray_lines[-10:]:
        np.testing.assert_allclose(ln.get_xdata()[-1], z_img, atol=1e-6)


def test_fans_jittable_and_differentiable():
    specs, lens = zoo.build("cooke")
    cfg = _cfg(rel_fields=(1.0,))

    @jax.jit
    def edge_astig(c):
        fc = analysis.field_curvature(specs, lens.replace(c=c), cfg,
                                      n=5, pupil_fraction=0.2)
        return fc["astigmatism"][0, 0, 0]

    g = jax.grad(edge_astig)(lens.c)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0
