"""Neural-generator loss bridge (OpticalLoss)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchoptics_tpu.loss import (OpticalLoss, sequence_decoder,
                                  sequence_encoder, t_converter)
from torchoptics_tpu.models import glass


def test_sequence_codec():
    assert sequence_encoder("GA") == 10
    assert sequence_encoder("GAGA") == 1010
    assert sequence_encoder("GGA") == 110
    assert sequence_decoder(1010) == "GAGA"
    assert sequence_decoder(10) == "GA"
    with pytest.raises(ValueError):
        sequence_encoder("AGA")  # leading A not representable


def test_counts():
    ol = OpticalLoss("GAGA")
    assert ol.numsurf == 4
    assert ol.numglass == 2
    assert ol.numin == 2 + 2 * 4
    assert ol.numout == 2 * 2 + 2 * 4 - 1


def test_t_converter():
    t = jnp.asarray([1.0, 2.0, 3.0])
    # stop on a 'G' gap -> unchanged
    out = t_converter(1, "GA", t, jnp.asarray(9.0))
    np.testing.assert_array_equal(np.asarray(out), [1, 2, 3])
    # stop on an 'A' gap -> splice before it
    out = t_converter(2, "GAGA", t, jnp.asarray(9.0))
    np.testing.assert_array_equal(np.asarray(out), [1, 9, 2, 3])


def _make_ga_sample():
    """A GA singlet design vector in the reference's slot layout
    (`optical_loss.py:21-37`)."""
    g = np.asarray(glass.g_from_n_v(jnp.asarray([1.5168]),
                                    jnp.asarray([64.17])))[0]
    # output: g11, g12, c1, t1, t2   (c2 is solved for EFL=1)
    outputs = jnp.asarray([g[0], g[1], 0.35, 0.15, 0.75], jnp.float32)
    # input: epd, hfov, t-bounds..., sequence_encoded, stop_idx, as_c, as_t
    inputs = jnp.asarray([0.3, 0.35, 0, 1, 0, 1, 10, 1, -1, -1], jnp.float32)
    return inputs, outputs


def test_unsupervised_single_ga():
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    inputs, outputs = _make_ga_sample()
    loss, rms, penalty = ol.unsupervised_single(inputs, outputs, stop_idx=1)
    assert np.isfinite(float(loss))
    assert float(rms) >= 0
    np.testing.assert_allclose(float(loss),
                               float(rms) + 0.2 * float(penalty), rtol=1e-5)


def test_spot_metric_xy_through_optical_loss():
    """VERDICT r4 #4: the generator bridge exposes spot_metric — the rms
    term of the loss switches to the radial 2-D metric on both engines and
    matches a manual compute_spot_rms_xy of the same trace."""
    from jax.experimental.pallas import tpu as pltpu
    from torchoptics_tpu.ops import metrics as metrics_mod
    from torchoptics_tpu.ops import trace as trace_mod

    inputs, outputs = _make_ga_sample()
    ol_y = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    ol_xy = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4,
                        spot_metric="xy")
    _, rms_y, pen_y = ol_y.unsupervised_single(inputs, outputs, stop_idx=1)
    _, rms_xy, pen_xy = ol_xy.unsupervised_single(inputs, outputs,
                                                  stop_idx=1)
    # penalties are metric-independent; the rms term changes
    np.testing.assert_allclose(float(pen_xy), float(pen_y), rtol=1e-6)
    assert abs(float(rms_xy) - float(rms_y)) > 1e-7

    # manual radial metric of the same trace
    specs_b, lens_b = ol_xy.build_batch(inputs[None], outputs[None],
                                        stop_idx=1)
    res = trace_mod.trace_rays(specs_b, lens_b,
                               ol_xy._sim_config().trace_config())
    manual = float(jnp.mean(metrics_mod.compute_spot_rms_xy(
        res.x, res.y, res.ray_ok)))
    np.testing.assert_allclose(float(rms_xy), manual, rtol=1e-5)

    # fused batch engine carries the same metric
    inputs_b = jnp.stack([inputs, inputs])
    outputs_b = jnp.stack([outputs, outputs])
    with pltpu.force_tpu_interpret_mode():
        _, rms_p, _ = ol_xy.unsupervised(inputs_b, outputs_b, stop_idx=1,
                                         engine="pallas")
    np.testing.assert_allclose(float(rms_p), manual, rtol=1e-4)


def test_unsupervised_batch_vmapped():
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    inputs, outputs = _make_ga_sample()
    inputs_b = jnp.stack([inputs, inputs.at[0].set(0.25)])
    outputs_b = jnp.stack([outputs, outputs.at[2].set(0.3)])
    loss, rms, penalty = ol.unsupervised(inputs_b, outputs_b)
    assert np.isfinite(float(loss))
    # mean over two distinct samples differs from either one alone
    l0, *_ = ol.unsupervised_single(inputs, outputs, stop_idx=1)
    assert not np.isclose(float(loss), float(l0))


def test_unsupervised_jitted_caller():
    """jit(loss) with an explicit static stop_idx works; omitting stop_idx
    under trace raises a clear error instead of a TracerArrayConversionError
    (the r2 footgun, `loss.py:211`)."""
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    inputs, outputs = _make_ga_sample()
    inputs_b = jnp.stack([inputs, inputs])
    outputs_b = jnp.stack([outputs, outputs.at[2].set(0.3)])

    jitted = jax.jit(lambda i, o: ol.unsupervised(i, o, stop_idx=1))
    loss, rms, penalty = jitted(inputs_b, outputs_b)
    assert np.isfinite(float(loss))
    eager_loss, *_ = ol.unsupervised(inputs_b, outputs_b)
    np.testing.assert_allclose(float(loss), float(eager_loss), rtol=1e-6)

    with pytest.raises(ValueError, match="stop_idx"):
        jax.jit(lambda i, o: ol.unsupervised(i, o))(inputs_b, outputs_b)


def test_unsupervised_gradients_flow_to_generator_outputs():
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    inputs, outputs = _make_ga_sample()

    def f(out):
        loss, *_ = ol.unsupervised_single(inputs, out, stop_idx=1)
        return loss

    g = jax.grad(f)(outputs)
    assert np.isfinite(np.asarray(g)).all()
    # curvature and thickness slots must receive gradient
    assert abs(float(g[2])) > 0
    assert abs(float(g[3])) + abs(float(g[4])) > 0


def test_supervised_mse():
    ol = OpticalLoss("GA")
    x = jnp.zeros((4, ol.numout))
    y = jnp.ones((4, ol.numout))
    # all deviations 1 -> per-block sums = numout -> mse = numout/(2G+2S-1)=1
    np.testing.assert_allclose(float(ol.supervised(x, y)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(ol.supervised(y, y)), 0.0, atol=1e-8)


def test_unsupervised_pallas_engine_matches_xla():
    """engine='pallas' (fused population kernel) must reproduce the vmapped
    XLA loss."""
    from jax.experimental.pallas import tpu as pltpu
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    inputs, outputs = _make_ga_sample()
    inputs_b = jnp.stack([inputs, inputs.at[0].set(0.25)])
    outputs_b = jnp.stack([outputs, outputs.at[2].set(0.32)])
    ref = ol.unsupervised(inputs_b, outputs_b)
    with pltpu.force_tpu_interpret_mode():
        pal = ol.unsupervised(inputs_b, outputs_b, engine="pallas")
    for a, b, name in zip(ref, pal, ("loss", "rms", "penalty")):
        np.testing.assert_allclose(float(b), float(a), rtol=2e-4,
                                   err_msg=name)


def test_unsupervised_pallas_mesh_matches_unsharded():
    """engine='pallas' with a ('lens','rays') mesh shards the fused
    generator loss (kernel per device + psum) and must match the unsharded
    fused launch, value and generator-output gradients."""
    from jax.experimental.pallas import tpu as pltpu
    from torchoptics_tpu.parallel import mesh as mesh_mod
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    inputs, outputs = _make_ga_sample()
    inputs_b = jnp.stack([inputs, inputs.at[0].set(0.25),
                          inputs.at[0].set(0.28), inputs.at[1].set(0.3)])
    outputs_b = jnp.stack([outputs, outputs.at[2].set(0.32),
                           outputs.at[3].set(0.18), outputs.at[2].set(0.38)])
    mesh = mesh_mod.make_mesh(lens_parallel=2)

    with pltpu.force_tpu_interpret_mode():
        ref = ol.unsupervised(inputs_b, outputs_b, engine="pallas")
        sh = ol.unsupervised(inputs_b, outputs_b, engine="pallas", mesh=mesh)
        g_ref = jax.grad(lambda o: ol.unsupervised(
            inputs_b, o, engine="pallas")[0])(outputs_b)
        g_sh = jax.grad(lambda o: ol.unsupervised(
            inputs_b, o, engine="pallas", mesh=mesh)[0])(outputs_b)
    for a, b, name in zip(ref, sh, ("loss", "rms", "penalty")):
        np.testing.assert_allclose(float(b), float(a), rtol=2e-5,
                                   err_msg=name)
    a, b = np.asarray(g_ref), np.asarray(g_sh)
    scale = np.abs(a).max() + 1e-12
    np.testing.assert_allclose(b / scale, a / scale, atol=1e-4)


def test_unsupervised_pallas_engine_grads():
    from jax.experimental.pallas import tpu as pltpu
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    inputs, outputs = _make_ga_sample()
    inputs_b = jnp.stack([inputs, inputs.at[0].set(0.25)])
    outputs_b = jnp.stack([outputs, outputs.at[2].set(0.32)])

    g_ref = jax.grad(lambda o: ol.unsupervised(inputs_b, o)[0])(outputs_b)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(lambda o: ol.unsupervised(
            inputs_b, o, engine="pallas")[0])(outputs_b)
    a, b = np.asarray(g_ref), np.asarray(g_pal)
    scale = np.abs(a).max() + 1e-12
    np.testing.assert_allclose(b / scale, a / scale, atol=1e-2)
