"""Shared benchmark timing protocol (used by bench.py and benchmarks/)."""

from __future__ import annotations

import time

import jax


def time_step(step, args, n_iter: int = 10, reps: int = 3) -> float:
    """Best-of-``reps`` average seconds per call of ``step(*args)``.

    Compiles/warms once, then takes the minimum over ``reps`` timed batches
    of ``n_iter`` calls each (each batch synchronized with
    ``block_until_ready``)."""
    out = step(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = step(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best
