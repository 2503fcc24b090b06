"""Checkpoint save/restore of optimization state."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu import zoo
from torchoptics_tpu.utils import checkpoint as ckpt


def test_roundtrip_params(tmp_path):
    params = {"c": jnp.arange(5.0), "t": jnp.ones((2, 3)),
              "nested": {"g": jnp.asarray([[1.0, 2.0]])}}
    path = str(tmp_path / "state.npz")
    ckpt.save(path, params, metadata={"step": 7})
    restored = ckpt.restore(path, params)
    np.testing.assert_array_equal(np.asarray(restored["c"]),
                                  np.asarray(params["c"]))
    np.testing.assert_array_equal(np.asarray(restored["nested"]["g"]),
                                  np.asarray(params["nested"]["g"]))
    assert ckpt.load_metadata(path)["step"] == 7


def test_roundtrip_lens(tmp_path):
    specs, lens = zoo.build("cooke")
    path = str(tmp_path / "lens.npz")
    ckpt.save(path, lens)
    restored = ckpt.restore(path, lens)
    np.testing.assert_array_equal(np.asarray(restored.c), np.asarray(lens.c))
    assert restored.structure == lens.structure


def test_optimizer_state_resume(tmp_path):
    """Save mid-optimization, restore, and confirm identical continuation."""
    from torchoptics_tpu import optimize as opt
    from torchoptics_tpu import simulator as sim
    specs, lens = zoo.build("singlet")
    cfg = sim.SimulatorConfig(n_sampled_fields=2, n_pupil_rings=3,
                              pupil_sampling="circular", n_ray_aiming_iter=0)
    o = opt.LensOptimizer(specs=specs, config=cfg, qc_variables=False,
                          add_bfl=False, efl_target=float(lens.efl[0]))
    state = o.init(lens)
    for _ in range(2):
        state, *_ = o.step(state)

    path = str(tmp_path / "opt.npz")
    ckpt.save(path, state)
    restored = ckpt.restore(path, state)

    next_a, loss_a, _ = o.step(state)
    next_b, loss_b, _ = o.step(restored)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(next_a.params["c"]),
                                  np.asarray(next_b.params["c"]))
