#!/usr/bin/env python
"""Measured VPU speed-of-light for the roofline (VERDICT r2 #3).

Rather than quoting spec-sheet numbers (public sources give the v5e MXU
peak — 197 bf16 TFLOP/s — but not a VPU figure), this measures the chip's
own vector-unit ceiling with Pallas chain kernels that are pure VMEM-resident
arithmetic:

* ``fma`` — ``a = a*k1 + k2``: one fused multiply-add issue per element per
  iteration. A (rows, 128) f32 tile is rows/8 independent (8, 128) vreg
  chains, so the loop pipelines fully: this measures the sustained VECTOR
  ISSUE rate for simple ops (1.61e12 lane-issues/s on this chip ≈ 1 vreg
  per cycle at the v5e clock). Tile size matters: a 512-row tile measured
  2× slower (vreg pressure/spills) — 256 rows is the sweet spot found by
  sweep.
* ``sqrt`` / ``div`` — the same chain shape around the transcendental,
  calibrating the MEASURED cost of sqrt/div relative to one simple-op issue
  (the trace kernels' op mix is ~96% simple ops + sqrt/div,
  `ops/pallas_trace.py:56-104`).

Roofline interpretation: the kernel op census (`bench.py:OPS_FWD/OPS_BWD`)
counts every arithmetic lane-op (mul, add, select, cmp), plus how many of
those form mul+add pairs Mosaic fuses into single FMA issues. Assuming
every pair fuses gives the MINIMUM issue rate consistent with a measured
intersection rate, so bench.py's ``roofline_fraction`` is a provable lower
bound on the fraction of this ceiling sustained; the unfused census
reading may exceed 1, which proves fusion is happening (not headroom).

Protocol — slope over trip counts, forced fetch. Two relay traps shape it:

1. On the ``axon`` relay, ``jax.block_until_ready`` acks sub-millisecond
   programs BEFORE device completion (a 280 ms workload "completed" in
   30 µs); only a host data fetch (``np.asarray``) is a true sync — and the
   fetch itself costs ~25 ms on this relay, so single-point sub-ms timings
   are meaningless here.
2. Any fixed per-call cost (relay round trip, kernel launch, fetch) biases
   a single-point measurement, so the per-iteration cost is the SLOPE of
   time vs fori_loop trip count between two widely spaced counts — fixed
   overheads cancel exactly.

Measured on TPU v5 lite (2026-08-17, idle host): fma 1.80e12
lane-issues/s, sqrt weight ≈ 4.1, div ≈ 4.5. CAUTION: the measurement is
host-sensitive — with the single host core contended (e.g. a test suite
running) the same protocol read 1.24e12, 31% low.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS = 256             # (256, 128) f32 tile = 32 vreg chains of ILP
ITERS_LO = 2048
ITERS_HI = 16384


def _chain_kernel(x_ref, o_ref, *, iters, op):
    a = x_ref[...]
    k1 = jnp.float32(1.0000001)
    k2 = jnp.float32(1e-7)

    def body(_, a):
        if op == "fma":
            return a * k1 + k2
        if op == "sqrt":
            # fixed point of sqrt(a)+k2 is ~1: numerically stable chain
            return jnp.sqrt(a) + k2
        if op == "div":
            # fixed point of k1/a + k2 near 1
            return k1 / a + k2
        raise ValueError(op)

    o_ref[...] = jax.lax.fori_loop(0, iters, body, a)


def _chain(op, rows, iters):
    kernel = functools.partial(_chain_kernel, iters=iters, op=op)
    x = jnp.ones((rows, 128), jnp.float32)
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32))
    return jax.jit(call), x


def _timed(op, rows, iters, n_iter=20, reps=5):
    """Min seconds/call: calls chained output->input (forces sequential
    execution) and synced by a real host fetch (see module docstring).

    Min, not median: relay interference is strictly additive noise, and a
    ceiling is by definition the fastest the hardware goes — a median let a
    slow relay window under-measure the ceiling by ~35% in one session,
    which made the kernel roofline fraction read as an impossible 1.76."""
    step, x = _chain(op, rows, iters)
    _ = np.asarray(step(x))         # warm/compile + true sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = x
        for _ in range(n_iter):
            out = step(out)
        _ = np.asarray(out)
        ts.append((time.perf_counter() - t0) / n_iter)
    return float(np.min(ts))


def measure_vpu(rows=ROWS, n_iter=20, reps=5):
    """Measure sustained element-ops/s per op class; returns roofline inputs.

    ``vpu_lane_ops_per_s`` counts one lane-issue per element — the unit the
    trace kernels' "simple op" census is in (conservative: the census counts
    mul+add pairs the hardware fuses into one FMA as two). ``*_weight`` is
    the measured cost of one sqrt/div chain step in fma-chain-step units
    (each chain step carries one transcendental + one cheap companion op,
    so the ratio slightly over-counts the weight — conservative)."""
    numel = rows * 128
    out = {"rows": rows, "iters_lo": ITERS_LO, "iters_hi": ITERS_HI,
           "protocol": "slope over trip counts, np.asarray-synced"}
    slope = {}
    for op in ("fma", "sqrt", "div"):
        t_lo = _timed(op, rows, ITERS_LO, n_iter, reps)
        t_hi = _timed(op, rows, ITERS_HI, n_iter, reps)
        slope[op] = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)  # s per loop iter
        out[f"{op}_ops_per_s"] = numel / slope[op]
        out[f"{op}_ns_per_vreg_op"] = slope[op] / (rows / 8) * 1e9
    for op in ("sqrt", "div"):
        out[f"{op}_weight"] = max(float(slope[op] / slope["fma"]), 1.0)
    out["vpu_lane_ops_per_s"] = out["fma_ops_per_s"]
    return out


if __name__ == "__main__":
    import json
    import os
    import sys

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from torchoptics_tpu.utils.backend import ensure_backend

    ensure_backend()
    print(json.dumps(measure_vpu(), indent=2))
