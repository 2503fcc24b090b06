#!/usr/bin/env python
"""Train a neural lens-design generator against the unsupervised optical loss.

This is the end-to-end purpose of the reference framework (a port of the
joint-lens-design pipeline, arXiv:2212.04441): a small MLP maps lens
specifications (EPD, HFOV) to design vectors (glass g-pairs, curvatures,
thicknesses); the differentiable ray tracer scores each design by spot RMS +
physical penalties; gradients flow through the trace back into the network.
The reference's own training stack is non-functional (missing external
packages, serial per-sample loss loop); here the whole batch trains in one
jitted step.

Usage:
  python examples/train_generator.py --steps 300 --batch 32
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def init_mlp(key, sizes):
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        params.append({
            "w": jax.random.normal(k1, (din, dout)) * (2.0 / din) ** 0.5,
            "b": jnp.zeros(dout),
        })
    return params


def mlp(params, x):
    for layer in params[:-1]:
        x = jax.nn.gelu(x @ layer["w"] + layer["b"])
    last = params[-1]
    return x @ last["w"] + last["b"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lens-type", default="GA")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()
    from torchoptics_tpu.loss import OpticalLoss

    ol = OpticalLoss(args.lens_type, n_sampled_fields=4, n_pupil_rings=6)
    G, S = ol.numglass, ol.numsurf
    n_out = ol.numout

    key = jax.random.PRNGKey(args.seed)
    key, knet = jax.random.split(key)
    net = init_mlp(knet, (2, args.hidden, args.hidden, n_out))

    # Output heads start near a sane design: glass near the catalog center,
    # curvature near 0.3 (EFL-1 scale), thicknesses ~0.2.
    base = np.zeros(n_out, np.float32)
    base[2 * G: 2 * G + S - 1] = 0.3
    base[2 * G + S - 1:] = 0.2
    base = jnp.asarray(base)

    def sample_specs(key, n):
        kepd, khfov = jax.random.split(key)
        epd = jax.random.uniform(kepd, (n,), minval=0.15, maxval=0.35)
        hfov = jax.random.uniform(khfov, (n,), minval=0.2, maxval=0.45)
        return epd, hfov

    def batch_loss(net_params, key):
        epd, hfov = sample_specs(key, args.batch)
        inputs = jnp.stack([epd, hfov], axis=1)
        outputs = mlp(net_params, inputs) * 0.1 + base

        def single(inp, out):
            # unsupervised_single reads epd = inputs[0:1], hfov = inputs[1]
            return ol.unsupervised_single(inp, out, stop_idx=1)[0]

        losses = jax.vmap(single)(inputs, outputs)
        return jnp.mean(losses)

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(net)

    @jax.jit
    def train_step(net_params, opt_state, key):
        loss, grads = jax.value_and_grad(batch_loss)(net_params, key)
        # generator training can hit non-finite designs early on
        finite = jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(g))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, net_params)
        net_params = optax.apply_updates(net_params, updates)
        return net_params, opt_state, loss

    print(f"training {args.lens_type} generator: batch={args.batch}, "
          f"device={jax.devices()[0]}")
    first = loss = float("nan")
    for i in range(args.steps):
        key, k = jax.random.split(key)
        net, opt_state, loss = train_step(net, opt_state, k)
        if i == 0:
            first = float(loss)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i:5d}: loss={float(loss):.5f}", flush=True)
    print(f"final loss {float(loss):.5f} (from {first:.5f})")


if __name__ == "__main__":
    main()
