#!/usr/bin/env python
"""Probe the chain protocol itself: is there a fixed per-iteration cost?"""

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


def timed(f, args, reps=5):
    _ = np.asarray(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ensure_backend()
    F, P, W = 32, 25600, 3
    xp = jnp.ones((F, P), jnp.float32)

    def trivial(a0):
        return jnp.sum(a0[:1, :8])

    def bcast(a0):
        xb = jnp.broadcast_to(a0[None, :, :, None], (1, F, P, W))
        return jnp.sum(xb[0].reshape(-1).reshape(-1, 128)[:2])

    for name, body in (("trivial", trivial), ("bcast_w_inner", bcast)):
        for K in (5, 20):
            def scan_chain(a):
                def b(c, _):
                    a0, acc = c
                    fb = body(a0)
                    return (a0 + 1e-30 * fb, acc + fb), None
                (_, acc), _ = jax.lax.scan(b, (a, 0.0), None, length=K)
                return acc

            def unrolled(a):
                acc = 0.0
                for _ in range(K):
                    fb = body(a)
                    a = a + 1e-30 * fb
                    acc = acc + fb
                return acc

            t_s = timed(jax.jit(scan_chain), (xp,))
            t_u = timed(jax.jit(unrolled), (xp,))
            print(f"{name:14s} K={K:3d}  scan {t_s*1e3:8.3f} ms total "
                  f"({t_s/K*1e3:7.3f}/step)   unrolled {t_u*1e3:8.3f} ms "
                  f"({t_u/K*1e3:7.3f}/step)")


if __name__ == "__main__":
    main()
