#!/usr/bin/env python
"""Probe: does padding SVOLA patch FFTs up to TPU-friendly sizes help?

The SVOLA patch FFT size is `H/grid + 2*overlap + 2*(k//2)` — e.g. 99 for
the 256 px config-5 pipeline — which is not a small-prime-factor size. This
probe times `ops.image.svola_convolution` as-is against a variant whose
rfftn/irfftn run at the next 2^a·3^b·5^c size, at 256/512/1024 px, fwd only
(the imaging pipeline's dominant FFT traffic), fetch-synced.

Result (TPU v5e via relay, 2026-08-18): 512 px 0.99x, 1024 px 0.94x —
padding to smooth sizes does NOT help XLA:TPU's FFT here, so
`fft_fast_sizes` stays opt-in/off (see RESULTS.md round-4 imaging
paragraph). Caveat: the 256 px row's ~0.02 ms is below the relay's
early-ack floor (sub-ms programs "complete" before the device finishes —
CLAUDE.md) and is not trustworthy; the ms-scale 512/1024 rows are.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from torchoptics_tpu.utils.backend import ensure_backend

ensure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from torchoptics_tpu.ops import image as image_mod
from torchoptics_tpu.utils.timing import time_step_stats


def main():
    rng = np.random.default_rng(0)
    gh = gw = 5
    k = 33
    ov = 16
    for px in (256, 512, 1024):
        img = jnp.asarray(rng.random((1, px, px, 3)).astype(np.float32))
        psfs = jnp.asarray(
            rng.random((1, gh * gw, k, k, 3)).astype(np.float32))
        ph = px // gh + 2 * ov + 2 * (k // 2)
        fast = image_mod.next_fast_fft_len(ph)
        fn = jax.jit(lambda im, ps: image_mod.svola_convolution(
            im, ov, ps, (gh, gw)))
        fn_fast = jax.jit(lambda im, ps: image_mod.svola_convolution(
            im, ov, ps, (gh, gw), fft_fast_sizes=True))
        s = time_step_stats(fn, (img, psfs), n_iter=5, reps=3)
        sf = time_step_stats(fn_fast, (img, psfs), n_iter=5, reps=3)
        err = float(jnp.max(jnp.abs(fn(img, psfs) - fn_fast(img, psfs))))
        print(f"px={px} patch_fft={ph}->{fast} "
              f"asis min={s['min']*1e3:.3f} ms "
              f"fast min={sf['min']*1e3:.3f} ms "
              f"speedup={s['min']/sf['min']:.2f}x maxerr={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
