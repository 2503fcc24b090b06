"""Shared benchmark timing protocol (used by bench.py and benchmarks/)."""

from __future__ import annotations

import time

import jax


def time_step_stats(step, args, n_iter: int = 10, reps: int = 5) -> dict:
    """Timing statistics for ``step(*args)``: seconds per call.

    Compiles/warms once, then times ``reps`` batches of ``n_iter`` calls
    each (each batch synchronized with ``block_until_ready``). Returns
    ``{"min", "median", "max", "spread"}`` where spread = (max-min)/median —
    the session-to-session chip/relay variance indicator the bench JSON
    carries so round-over-round regressions are detectable through noise."""
    import statistics

    out = step(*args)
    jax.block_until_ready(out)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = step(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / n_iter)
    med = statistics.median(samples)
    return {"min": min(samples), "median": med, "max": max(samples),
            "spread": (max(samples) - min(samples)) / med,
            "reps": reps, "n_iter": n_iter}


def time_step(step, args, n_iter: int = 10, reps: int = 3) -> float:
    """Best-of-``reps`` average seconds per call of ``step(*args)``."""
    return time_step_stats(step, args, n_iter=n_iter, reps=reps)["min"]
