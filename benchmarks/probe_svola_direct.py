"""Probe: direct K²-tap convolution alternatives vs XLA FFT for SVOLA.

The SVOLA patch convolution at 1024 px (BASELINE config 5) runs 25 patches
x 3 channels of 316² pixels against an 11² resized PSF.  Stage attribution
(`benchmarks/profile_imaging.py`) pegs the FFT path at ~9.5 ms of the
13.6 ms apply; naive FLOP math says K² fused multiply-adds (9e8 MACs)
should take ~0.6 ms at the measured 1.6e12 lane-FMA/s VPU ceiling.  This
probe measures three implementations of the identical valid convolution
on the real chip:

- ``fft``: rfft2 product, exactly how `ops.image.svola_convolution` does it.
- ``dft-matmul``: the transforms as dense complex DFT matmuls on the MXU.
- ``acc-grid``: a Pallas kernel — the K row-shifted copies of each patch
  are materialized by XLA (`jnp.stack` of static slices), the row offset
  is a grid dimension accumulated with the `@pl.when(a == 0)` init
  pattern, and the K lane offsets are static in-kernel slices.  (Two
  in-kernel variants that avoid the k× row materialization were tried
  and rejected: a fully unrolled K² kernel stack-allocates one VMEM temp
  per slice and blows the 16 MB scoped limit, and a carried-buffer
  `pltpu.roll` formulation lowers to 0.01 Tmac/s.  Mosaic cannot do a
  dynamic sublane-offset vector load at this size, which rules out the
  direct `pl.ds(a, hp)` read.)

Measured (2026-08-20, fetch-synced via a scalar in-jit reduction — a full
30 MB output fetch adds a ~150 ms relay floor that swamps the kernels):

    acc-grid (75,316,11):  5.66 ms  0.16 Tmac/s   fft: 6.63   dft: 6.78
    acc-grid (75,316, 3):  3.03 ms               fft: 6.44   dft: 6.42
    acc-grid (75,625,23):  Mosaic compile error  fft: 36.8   dft: 34.1
    acc-grid (75,156, 5):  2.69 ms               fft: 4.10   dft: 3.34

Verdict: the production config (K=11) gains only ~15% from the best
alternative — the acc-grid kernel is HBM-bound on the k× row-shifted
materialization (11 × 30 MB ≈ 330 MB ⇒ 58 GB/s effective), not
VPU-bound, and it fails to compile at the 2048 px config.  All three are
within ~2× of the ~5 ms relay floor for this program size at K≤11.  The
FFT path stays; its cost at the production config is a measured property
of the program size, not an unexploited 10× (the round-4 "643² patch"
estimate that suggested one was wrong — PSFs resize to 11²).

Run: python benchmarks/probe_svola_direct.py
"""
import sys
sys.path.insert(0, "/root/repo")

from torchoptics_tpu.utils.backend import ensure_backend  # noqa: E402

ensure_backend()

import time  # noqa: E402
from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _k_acc(k, rows_ref, psf_ref, out_ref):
    """One (patch, row-offset) grid cell: K lane-shifted FMAs, accumulated
    across the sequential row-offset grid axis."""
    hp, wp = out_ref.shape[1:]
    a = pl.program_id(1)
    acc = psf_ref[0, a, 0] * rows_ref[0, 0, :, 0:wp]
    for b in range(1, k):
        acc = acc + psf_ref[0, a, b] * rows_ref[0, 0, :, b:b + wp]

    @pl.when(a == 0)
    def _():
        out_ref[0] = acc

    @pl.when(a > 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def acc_grid_conv(patches, psfs):
    """(N, Hp+K-1, Wp+K-1), (N, K, K) -> (N, Hp, Wp) valid convolution."""
    n, hpad, wpad = patches.shape
    k = psfs.shape[-1]
    hp, wp = hpad - k + 1, wpad - k + 1
    rows = jnp.stack([patches[:, a:a + hp, :] for a in range(k)], axis=1)
    return pl.pallas_call(
        partial(_k_acc, k), grid=(n, k),
        in_specs=[pl.BlockSpec((1, 1, hp, wpad), lambda i, a: (i, a, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, k, k), lambda i, a: (i, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i, a: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.float32))(
            rows, psfs)


def fft_conv(patches, psfs, hp, wp):
    """Same conv via rfft2 the way svola_convolution does it."""
    k = psfs.shape[-1]
    fh, fw = patches.shape[1], patches.shape[2]
    f_img = jnp.fft.rfftn(patches, s=(fh, fw), axes=(1, 2))
    f_psf = jnp.fft.rfftn(psfs, s=(fh, fw), axes=(1, 2))
    conv = jnp.fft.irfftn(f_img * f_psf, s=(fh, fw), axes=(1, 2))
    return conv[:, k - 1:k - 1 + hp, k - 1:k - 1 + wp]


def dft_conv(patches, psfs, hp, wp):
    """Same conv, transforms as dense complex DFT matmuls on the MXU."""
    k = psfs.shape[-1]
    fh, fw = patches.shape[1], patches.shape[2]
    wh = np.exp(-2j * np.pi * np.outer(np.arange(fh), np.arange(fh)) / fh)
    ww = np.exp(-2j * np.pi * np.outer(np.arange(fw), np.arange(fw)) / fw)
    whi, wwi = np.conj(wh) / fh, np.conj(ww) / fw
    wh, ww, whi, wwi = (jnp.asarray(m, jnp.complex64)
                        for m in (wh, ww, whi, wwi))
    hi = jax.lax.Precision.HIGHEST
    kpad = jnp.pad(psfs, ((0, 0), (0, fh - k), (0, fw - k)))
    fi = jnp.einsum("ab,nbc,cd->nad", wh, patches.astype(jnp.complex64),
                    ww.T, precision=hi)
    fk = jnp.einsum("ab,nbc,cd->nad", wh, kpad.astype(jnp.complex64),
                    ww.T, precision=hi)
    out = jnp.einsum("ab,nbc,cd->nad", whi, fi * fk, wwi.T,
                     precision=hi).real
    return out[:, k - 1:k - 1 + hp, k - 1:k - 1 + wp]


def bench(make, p, q, macs, tag, reps=5, iters=10):
    # Scalar in-jit reduction: syncing on a full (75, 316, 316) fetch
    # costs ~150 ms through the relay and swamps the kernel time.
    f = jax.jit(lambda p, q: jnp.sum(make(p, q)))
    try:
        s0 = float(np.asarray(f(p, q)))
    except Exception as e:  # noqa: BLE001
        print(f"{tag} ERR: {str(e)[:120]}".replace("\n", " "), flush=True)
        return None
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(p, q)
        np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best*1e3:7.2f} ms  {macs/best/1e12:.2f} Tmac/s"
          f"  (sum {s0:.3e})", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(1)
    for (n, hp, k) in ((75, 316, 11), (75, 316, 3), (75, 625, 23),
                       (75, 156, 5)):
        p = jax.random.uniform(key, (n, hp + k - 1, hp + k - 1),
                               jnp.float32) * 255.0
        q = jax.random.uniform(key, (n, k, k), jnp.float32)
        q = q / jnp.sum(q, axis=(1, 2), keepdims=True)
        macs = n * hp * hp * k * k
        bench(acc_grid_conv, p, q, macs, f"acc-grid ({n},{hp},{k})")
        bench(lambda p, q: fft_conv(p, q, hp, hp), p, q, macs,
              f"fft      ({n},{hp},{k})")
        bench(lambda p, q: dft_conv(p, q, hp, hp), p, q, macs,
              f"dft      ({n},{hp},{k})")


if __name__ == "__main__":
    main()
