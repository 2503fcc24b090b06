"""Lens optimization: normalized variables, quantized glass, Adam loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import optimize as opt
from torchoptics_tpu import simulator as sim
from torchoptics_tpu import zoo
from torchoptics_tpu.models import glass


CFG = sim.SimulatorConfig(n_sampled_fields=3, n_pupil_rings=4,
                          pupil_sampling="circular", n_ray_aiming_iter=1)


def test_normalized_roundtrip():
    specs, lens = zoo.build("cooke")
    params = opt.get_normalized_lens_variables(lens, add_bfl=False)
    rebuilt = opt.lens_from_normalized(lens.structure, params,
                                       qc_variables=False)
    # rebuilt is at EFL == 1; scale back and compare
    rebuilt = rebuilt.scale(lens.efl)
    np.testing.assert_allclose(np.asarray(rebuilt.flat_c),
                               np.asarray(lens.flat_c), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rebuilt.flat_t),
                               np.asarray(lens.flat_t), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rebuilt.flat_nd),
                               np.asarray(lens.flat_nd), rtol=1e-4)


def test_normalized_roundtrip_with_bfl():
    specs, lens = zoo.build("cooke")
    params = opt.get_normalized_lens_variables(lens, add_bfl=True)
    rebuilt = opt.lens_from_normalized(lens.structure, params, add_bfl=True,
                                       qc_variables=False).scale(lens.efl)
    np.testing.assert_allclose(np.asarray(rebuilt.flat_t),
                               np.asarray(lens.flat_t), rtol=1e-2, atol=1e-3)


def test_quantize_glass_straight_through():
    catalog = glass.default_catalog_g()
    g = catalog[3] + 0.01

    def f(g):
        return jnp.sum(glass.quantize_glass_st(g[None], catalog) ** 2)

    # forward snaps to the catalog entry
    snapped = glass.quantize_glass_st(g[None], catalog)
    np.testing.assert_allclose(np.asarray(snapped), np.asarray(catalog[3:4]),
                               atol=1e-6)
    # straight-through: gradient is d/dg of g^2 at the snapped value = 2*snap
    grad = jax.grad(f)(g)
    np.testing.assert_allclose(np.asarray(grad),
                               2 * np.asarray(catalog[3]), rtol=1e-5)


def test_optimizer_reduces_loss():
    specs, lens = zoo.build("cooke")
    # Perturb the design away from its optimum.
    lens_bad = lens.replace(c=lens.c * 1.08)
    optimizer = opt.LensOptimizer(specs=specs, config=CFG,
                                  learning_rate=3e-4, qc_variables=False,
                                  add_bfl=False,
                                  efl_target=float(lens.efl[0]))
    state = optimizer.init(lens_bad)
    loss0 = float(optimizer.loss(state.params)[0])
    for _ in range(25):
        state, total, _ = optimizer.step(state)
    loss1 = float(total)
    assert np.isfinite(loss1)
    assert loss1 < loss0, (loss0, loss1)


def test_optimizer_respects_trainable_mask():
    specs, lens = zoo.build("cooke")
    optimizer = opt.LensOptimizer(specs=specs, config=CFG,
                                  qc_variables=False, add_bfl=False,
                                  trainable=("c",),
                                  efl_target=float(lens.efl[0]))
    state = optimizer.init(lens)
    t0 = np.asarray(state.params["t"])
    g0 = np.asarray(state.params["g"])
    for _ in range(3):
        state, *_ = optimizer.step(state)
    np.testing.assert_array_equal(np.asarray(state.params["t"]), t0)
    np.testing.assert_array_equal(np.asarray(state.params["g"]), g0)
    assert not np.allclose(np.asarray(state.params["c"]),
                           np.asarray(optimizer.init(lens).params["c"]))


def test_step_rejects_nonfinite():
    """A diverging iterate (NaN loss/grads) must not modify parameters."""
    import jax.numpy as jnp
    specs, lens = zoo.build("singlet")
    optimizer = opt.LensOptimizer(specs=specs, config=CFG,
                                  qc_variables=False, add_bfl=False,
                                  efl_target=float(lens.efl[0]))
    state = optimizer.init(lens)
    # Poison one thickness with NaN: loss and grads become non-finite and
    # the step must leave every parameter untouched.
    bad_params = dict(state.params)
    bad_params["t"] = state.params["t"].at[0].set(jnp.nan)
    bad_state = opt.OptState(bad_params, state.opt_state, state.step)
    # The loss VALUE may be masked to 0 (the reference's NaN->0 in Q), but
    # the gradients are non-finite — the guard must trip on those.
    grads = jax.grad(lambda p: optimizer.loss(p)[0])(bad_params)
    assert not all(bool(jnp.isfinite(g).all()) for g in grads.values())
    new_state, total, _ = optimizer.step(bad_state)
    np.testing.assert_array_equal(np.asarray(new_state.params["c"]),
                                  np.asarray(bad_params["c"]))
    np.testing.assert_array_equal(np.asarray(new_state.params["g"]),
                                  np.asarray(bad_params["g"]))
