"""Vignetting solver (VERDICT r3 #8 stretch): recover hand-set factors on
the Tessar, and the solved factors must be self-consistent (re-tracing with
them keeps every beam inside the apertures, tangent at the binding field)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import trace, zoo
from torchoptics_tpu.ops import vignetting as vig_mod


REL_FIELDS = (0.0, 0.5, 1.0)


def _apertures_with_vig(specs, lens, vig_fn, n_scan=201, aim=0):
    """Effective per-surface semi-apertures of the vignetted trace: max hit
    radius over meridional+sagittal fans across the field.

    aim=0 for the round-trip test: with ray aiming ON, the aiming linear
    map is built from *vignetted* probe rays when vig_fn is set, so the
    hand-set generator and the (unvignetted) solver trace would use
    slightly different pupil->ray maps (~3% on the Tessar) — a property of
    the trace's vig-then-aim composition, not of the solver."""
    cfg = trace.TraceConfig(mode="tee", rel_fields=REL_FIELDS,
                            wavelengths=("d",), n_ray_aiming_iter=aim,
                            vig_fn=vig_fn)
    p = jnp.linspace(-1.0, 1.0, n_scan).reshape(1, 1, -1, 1)
    z = jnp.zeros_like(p)
    xp = jnp.concatenate((z, p), axis=2)
    yp = jnp.concatenate((p, z), axis=2)
    res = trace.trace_rays(specs, lens, cfg, xy=(xp, yp),
                           aggregate=("x", "y"))
    r = np.sqrt(np.asarray(res.stacks["x"]) ** 2
                + np.asarray(res.stacks["y"]) ** 2)     # (S, B, F, P, W)
    return np.max(np.moveaxis(r, 0, 1)[..., 0], axis=(2, 3))  # (B, S)


def test_solver_recovers_hand_set_factors_tessar():
    """Hand-set quadratic vignetting defines the effective apertures; the
    solver must recover the hand-set factors at the binding (edge) field."""
    import dataclasses
    specs, lens = zoo.build("tessar")
    q_up, q_down, q_x = 0.30, 0.15, 0.10
    specs_v = dataclasses.replace(specs, vig_up=jnp.asarray([q_up]),
                                  vig_down=jnp.asarray([q_down]),
                                  vig_x=jnp.asarray([q_x]))
    sa = _apertures_with_vig(specs_v, lens, vig_mod.quadratic_vig_fn)

    out = vig_mod.solve_vignetting(specs, lens, REL_FIELDS,
                                   semi_apertures=jnp.asarray(sa),
                                   n_scan=257, n_ray_aiming_iter=0)
    # Edge field: the hand-set vignetted beam is tangent to the apertures it
    # generated, so the solver must land on the hand-set values.
    np.testing.assert_allclose(out["vig_up"][0, -1], q_up, atol=0.02)
    np.testing.assert_allclose(out["vig_down"][0, -1], q_down, atol=0.02)
    # The sagittal edge is NOT tangent to any aperture here (the apertures
    # are set by the meridional beam), so the solver legitimately finds a
    # more open x-pupil; it must never be more closed than hand-set.
    assert out["vig_x"][0, -1] <= q_x + 0.01
    # On axis the full pupil passes (apertures were sized by the axial beam).
    np.testing.assert_allclose(out["vig_up"][0, 0], 0.0, atol=0.01)
    np.testing.assert_allclose(out["vig_down"][0, 0], 0.0, atol=0.01)
    # Solved factors never exceed hand-set (apertures are the max envelope
    # over fields, so intermediate fields may see a more open pupil).
    assert (out["vig_up"][0] <= q_up + 0.02).all()
    assert (out["vig_down"][0] <= q_down + 0.02).all()
    # Quadratic fit of the table lands near the hand-set coefficients.
    assert abs(out["q_up"][0] - q_up) < 0.05


def test_default_apertures_give_zero_axial_vignetting():
    """With apertures sized from the axial beam, the axis sees the full
    pupil and off-axis fields are clipped toward it."""
    specs, lens = zoo.build("tessar")
    out = vig_mod.solve_vignetting(specs, lens, REL_FIELDS, n_scan=129)
    np.testing.assert_allclose(out["vig_up"][0, 0], 0.0, atol=0.02)
    np.testing.assert_allclose(out["vig_down"][0, 0], 0.0, atol=0.02)
    np.testing.assert_allclose(out["vig_x"][0, 0], 0.0, atol=0.02)
    # monotone in field for this lens
    assert out["vig_up"][0, 2] >= out["vig_up"][0, 1] - 1e-6


def test_table_vig_fn_roundtrip_and_trace_integration():
    """table_vig_fn feeds the solved factors back into the default trace;
    the auto-vignetted trace's beams stay within the apertures."""
    specs, lens = zoo.build("tessar")
    out = vig_mod.solve_vignetting(specs, lens, REL_FIELDS, n_scan=129)
    vf = vig_mod.table_vig_fn(REL_FIELDS, out["vig_up"])
    fields = jnp.asarray(REL_FIELDS).reshape(1, -1)
    got = np.asarray(vf(fields, None))
    np.testing.assert_allclose(got, out["vig_up"], rtol=1e-6)
    # interpolation between solved fields
    mid = float(np.asarray(vf(jnp.asarray([[0.75]]), None))[0, 0])
    lo, hi = sorted((out["vig_up"][0, 1], out["vig_up"][0, 2]))
    assert lo - 1e-6 <= mid <= hi + 1e-6

    # Re-trace with the solved tables: hit radii within apertures (+tol).
    cfg = trace.TraceConfig(
        mode="tee", rel_fields=REL_FIELDS, wavelengths=("d",),
        n_ray_aiming_iter=1)
    p = jnp.linspace(-1.0, 1.0, 65).reshape(1, 1, -1, 1)
    from torchoptics_tpu.ops import pupil as pupil_mod
    yp = pupil_mod.apply_vignetting(
        p, jnp.asarray(out["vig_up"]), jnp.asarray(out["vig_down"]))
    res = trace.trace_rays(specs, lens, cfg,
                           xy=(jnp.zeros_like(yp), yp),
                           aggregate=("x", "y"))
    r = np.sqrt(np.asarray(res.stacks["x"]) ** 2
                + np.asarray(res.stacks["y"]) ** 2)
    r = np.moveaxis(r, 0, 1)[..., 0]                     # (B, S, F, P)
    sa = np.asarray(out["semi_apertures"])               # (B, S)
    mask = np.asarray(lens.structure.mask)
    excess = (r - sa[:, :, None, None] * 1.005)[mask]
    assert (excess <= 0.0).all(), excess.max()


def test_solver_is_jittable():
    """Round-5 (VERDICT r4 #6): the whole solver — fan traces, aperture
    margins, first-blocked-crossing edge search — is one XLA program and
    matches the eager call."""
    import jax
    specs, lens = zoo.build("tessar")
    eager = vig_mod.solve_vignetting(specs, lens, REL_FIELDS, n_scan=65,
                                     n_ray_aiming_iter=0)
    jitted = jax.jit(lambda l: vig_mod.solve_vignetting(
        specs, l, REL_FIELDS, n_scan=65, n_ray_aiming_iter=0))(lens)
    for k in ("vig_up", "vig_down", "vig_x", "q_up", "q_down", "q_x",
              "semi_apertures"):
        # jit vs eager differ by fp fusion order only (observed 2.4e-7)
        np.testing.assert_allclose(np.asarray(jitted[k]),
                                   np.asarray(eager[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_solved_tables_vig_fn_distinct_components_roundtrip():
    """Round-5 (VERDICT r4 #5): solved_tables_vig_fn carries DISTINCT
    up/down/x tables through one TraceConfig (specs.vig_* hold the solved
    tables); the fully vignetted re-trace keeps every beam inside the
    solved apertures."""
    import dataclasses
    specs, lens = zoo.build("tessar")
    out = vig_mod.solve_vignetting(specs, lens, REL_FIELDS, n_scan=129,
                                   n_ray_aiming_iter=0)
    vf = vig_mod.solved_tables_vig_fn(REL_FIELDS)
    specs_v = dataclasses.replace(specs,
                                  vig_up=jnp.asarray(out["vig_up"]),
                                  vig_down=jnp.asarray(out["vig_down"]),
                                  vig_x=jnp.asarray(out["vig_x"]))
    # the vig_fn reproduces each component's own table at the solved fields
    fields = jnp.asarray(REL_FIELDS).reshape(1, -1)
    np.testing.assert_allclose(np.asarray(vf(fields, specs_v.vig_up)),
                               np.asarray(out["vig_up"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vf(fields, specs_v.vig_x)),
                               np.asarray(out["vig_x"]), rtol=1e-6)

    cfg = trace.TraceConfig(mode="tee", rel_fields=REL_FIELDS,
                            wavelengths=("d",), n_ray_aiming_iter=0,
                            vig_fn=vf)
    p = jnp.linspace(-1.0, 1.0, 65).reshape(1, 1, -1, 1)
    z = jnp.zeros_like(p)
    res = trace.trace_rays(specs_v, lens, cfg,
                           xy=(jnp.concatenate((z, p), axis=2),
                               jnp.concatenate((p, z), axis=2)),
                           aggregate=("x", "y"))
    r = np.sqrt(np.asarray(res.stacks["x"]) ** 2
                + np.asarray(res.stacks["y"]) ** 2)
    r = np.moveaxis(r, 0, 1)[..., 0]                     # (B, S, F, P)
    sa = np.asarray(out["semi_apertures"])
    mask = np.asarray(lens.structure.mask)
    excess = (r - sa[:, :, None, None] * 1.005)[mask]
    assert (excess <= 0.0).all(), excess.max()


def test_solver_gradient_is_nan_free():
    """Round-5 polish: jax.grad through the solver is finite — the chief
    ray's hit radius is exactly 0 on every surface at field 0, so a bare
    sqrt would poison the whole gradient (the CLAUDE.md sqrt rule;
    `_safe_sqrt` guards it)."""
    import dataclasses
    import jax
    specs, lens = zoo.build("tessar")

    def objective(c):
        out = vig_mod.solve_vignetting(
            specs, dataclasses.replace(lens, c=c), REL_FIELDS, n_scan=25,
            n_ray_aiming_iter=0)
        return jnp.sum(out["vig_up"]) + jnp.sum(out["vig_x"])

    g = jax.grad(objective)(lens.c)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0.0
