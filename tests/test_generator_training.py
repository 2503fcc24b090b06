"""End-to-end neural lens-design generator training (the reference's
purpose, arXiv:2212.04441): gradients must flow from the optical loss
through the trace into network weights, and training must make progress."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchoptics_tpu.loss import OpticalLoss


def _mlp_init(key, sizes):
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        key, k = jax.random.split(key)
        params.append({"w": jax.random.normal(k, (din, dout)) * (2 / din) ** 0.5,
                       "b": jnp.zeros(dout)})
    return params


def _mlp(params, x):
    for layer in params[:-1]:
        x = jax.nn.gelu(x @ layer["w"] + layer["b"])
    return x @ params[-1]["w"] + params[-1]["b"]


def test_generator_training_reduces_fixed_batch_loss():
    ol = OpticalLoss("GA", n_sampled_fields=3, n_pupil_rings=4)
    G, S = ol.numglass, ol.numsurf
    base = np.zeros(ol.numout, np.float32)
    base[2 * G: 2 * G + S - 1] = 0.3
    base[2 * G + S - 1:] = 0.2
    base = jnp.asarray(base)

    key = jax.random.PRNGKey(0)
    net = _mlp_init(key, (2, 16, ol.numout))
    # fixed specs batch so the loss decrease is attributable to learning
    inputs = jnp.asarray([[0.2, 0.3], [0.3, 0.35], [0.25, 0.4]], jnp.float32)

    def loss_fn(net_params):
        outputs = _mlp(net_params, inputs) * 0.1 + base
        single = lambda inp, out: ol.unsupervised_single(inp, out,
                                                         stop_idx=1)[0]
        return jnp.mean(jax.vmap(single)(inputs, outputs))

    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(net)

    @jax.jit
    def step(net_params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(net_params)
        updates, opt_state = optimizer.update(grads, opt_state, net_params)
        return optax.apply_updates(net_params, updates), opt_state, loss

    loss0 = float(loss_fn(net))
    for _ in range(40):
        net, opt_state, loss = step(net, opt_state)
    loss1 = float(loss)
    assert np.isfinite(loss1)
    assert loss1 < loss0, (loss0, loss1)
    # network weights actually received optical-loss gradient
    g = jax.grad(loss_fn)(net)
    gmax = max(float(jnp.abs(l["w"]).max()) for l in g)
    assert gmax > 0
