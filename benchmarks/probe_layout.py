#!/usr/bin/env python
"""Probe: cost of materializing the fused-kernel ray block in different
wavelength orders (W innermost — current — vs outermost vs none).
In-jit chain protocol; see profile_frontend.py."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.utils.backend import ensure_backend


def chain_time(fn, args, K=10, reps=5):
    def chained(*a):
        def body(carry, _):
            a0, acc = carry
            fb = fn(a0, *a[1:])
            return (a0 + 1e-30 * fb, acc + fb), None
        (_, acc), _ = jax.lax.scan(body, (a[0], 0.0), None, length=K)
        return acc

    f = jax.jit(chained)
    _ = np.asarray(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.median(ts))


def main():
    ensure_backend()
    F, P, W = 32, 160 * 160, 3
    LANES = 128
    xp = jnp.ones((F, P), jnp.float32)
    cy = jnp.linspace(0, 0.3, F)
    print(f"device={jax.devices()[0]}  F={F} P={P} W={W} "
          f"rays={F*P*W/1e6:.2f}M")

    def consume(flat):
        """Feed like _run_fwd: reshape to (n_rows, 128) and reduce."""
        a = flat.reshape(-1, LANES)
        return jnp.sum(a[:2])

    def w_inner(x, cy):
        xb = jnp.broadcast_to(x[None, :, :, None],
                              (1, F, P, W))[0].reshape(-1)
        cyb = jnp.broadcast_to(cy[:, None, None], (F, P, W)).reshape(-1)
        return consume(xb) + consume(cyb)

    def w_outer(x, cy):
        xb = jnp.broadcast_to(x[None], (W, F, P)).reshape(-1)
        cyb = jnp.broadcast_to(cy[None, :, None], (W, F, P)).reshape(-1)
        return consume(xb) + consume(cyb)

    def none_(x, cy):
        xb = x.reshape(-1)
        cyb = jnp.broadcast_to(cy[:, None], (F, P)).reshape(-1)
        return consume(xb) + consume(cyb)

    for name, fn in (("w_inner", w_inner), ("w_outer", w_outer),
                     ("no_replication", none_)):
        t = chain_time(fn, (xp, cy))
        print(f"{name:16s} {t*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
