#!/usr/bin/env python
"""Measured VPU speed-of-light for the roofline (VERDICT r2 #3).

Rather than quoting spec-sheet numbers (public sources give the v5e MXU
peak — 197 bf16 TFLOP/s — but not a VPU figure), this measures the chip's
own vector-unit ceiling with Pallas chain kernels that are pure VMEM-resident
arithmetic:

* ``fma`` — ``a = a*k1 + k2``: one fused multiply-add issue per element
  per iteration, over ``NACC`` independent accumulator streams on a
  (ROWS, 128) f32 tile = ROWS/8 x NACC independent vreg chains, so the
  loop pipelines fully: this measures the sustained VECTOR ISSUE rate for
  simple ops (~1.6e12 lane-issues/s on this chip ≈ 1 vreg per cycle at
  the v5e clock). The (ROWS, NACC) point is from an on-chip sweep — see
  the constant's comment; bigger tiles spill vregs and read up to 2x low.
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

Protocol — min rate over ~1 s single long runs, forced fetch. Relay traps
that shape it:

1. On the ``axon`` relay, ``jax.block_until_ready`` acks sub-millisecond
   programs BEFORE device completion (a 280 ms workload "completed" in
   30 µs); only a host data fetch (``np.asarray``) is a true sync — and the
   fetch itself costs ~25 ms, so n_iter calls are chained output->input
   and share one fetch (and the residual bias only UNDER-estimates).
2. The service rate still drifts between sessions; every interference
   mechanism only LOWERS a measured rate, so callers wanting the true
   ceiling take the MAX over repeated samples (`bench.add_roofline`).
3. A slope-over-trip-counts protocol (difference two sub-ms counts to
   cancel the fetch) was used through round 3 and removed: the
   subtraction amplified service-rate drift into ±2x — sometimes
   negative — ceilings. Long single programs don't difference anything.

Measured on TPU v5 lite (2026-08-18): fma ~1.6-1.8e12 lane-issues/s
sustained, sqrt weight ≈ 4, div ≈ 4.5.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# (32, 128) f32 tile x 8 independent accumulator streams = 32 live vregs
# of ILP without spills — the best (rows, nacc) found by on-chip sweep
# (2026-08-18): 1.63e12 lane-FMA/s sustained; (256, 1) reads 1.24e12,
# (256, 4) spills to 0.64e12, (512, 1) 0.84e12.
ROWS = 32
NACC = 8


def _chain_kernel(x_ref, o_ref, *, iters, op, nacc):
    accs = [x_ref[...] * jnp.float32(1.0 + 1e-7 * i) for i in range(nacc)]
    k1 = jnp.float32(1.0000001)
    k2 = jnp.float32(1e-7)

    def one(a):
        if op == "fma":
            return a * k1 + k2
        if op == "sqrt":
            # fixed point of sqrt(a)+k2 is ~1: numerically stable chain
            return jnp.sqrt(a) + k2
        if op == "div":
            # fixed point of k1/a + k2 near 1
            return k1 / a + k2
        raise ValueError(op)

    def body(_, accs):
        return tuple(one(a) for a in accs)

    accs = jax.lax.fori_loop(0, iters, body, tuple(accs))
    o = accs[0]
    for a in accs[1:]:
        o = o + a
    o_ref[...] = o


def _chain(op, rows, iters, nacc=NACC):
    kernel = functools.partial(_chain_kernel, iters=iters, op=op, nacc=nacc)
    x = jnp.ones((rows, 128), jnp.float32)
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32))
    return jax.jit(call), x


def _timed(op, rows, iters, n_iter=3, reps=3):
    """Min seconds/call over reps: calls chained output->input (forces
    sequential execution), synced by a real host fetch per rep (see module
    docstring).

    Min, not median: a ceiling is by definition the fastest the hardware
    goes, and every interference mechanism (relay round trips, the ~25 ms
    fetch, chip time-sharing) makes a run SLOWER, never faster — so min is
    the sound estimator and the residual bias is a bounded UNDER-estimate
    (per-call overhead / per-call runtime, ~1-2% at these trip counts).

    History: a slope-over-trip-counts protocol was used through r3 and
    REMOVED — the t_hi - t_lo subtraction amplified relay noise into ±2x
    (even negative) ceilings, while single long-run rates are stable."""
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


# Trip counts sized so ONE pallas_call runs ~150-200 ms per op class
# (fma: 2^23 iters x 32768 lanes ≈ 0.27 Tops ≈ 170 ms at the ~1.6e12/s
# ceiling): long enough that the ~25 ms fetch plus per-call round trips
# bound the rate UNDER-estimate at a few percent over an n_iter chain.
OP_ITERS = {"fma": 1 << 23, "sqrt": 1 << 21, "div": 1 << 21}


def measure_vpu(rows=ROWS, n_iter=3, reps=3):
    """Measure sustained element-ops/s per op class; returns roofline inputs.

    ``vpu_lane_ops_per_s`` counts one lane-issue per element — the unit the
    trace kernels' "simple op" census is in (conservative: the census counts
    mul+add pairs the hardware fuses into one FMA as two). ``*_weight`` is
    the measured cost of one sqrt/div chain step in fma-chain-step units
    (each chain step carries one transcendental + one cheap companion op,
    so the ratio slightly over-counts the weight — conservative)."""
    numel = rows * 128
    out = {"rows": rows, "nacc": NACC, "op_iters": dict(OP_ITERS),
           "protocol": "min single-long-run rate, np.asarray-synced"}
    per_iter = {}
    for op in ("fma", "sqrt", "div"):
        iters = OP_ITERS[op]
        t = _timed(op, rows, iters, n_iter, reps)
        per_iter[op] = t / iters            # NACC lane-ops/elem/iteration
        out[f"{op}_ops_per_s"] = numel * NACC / per_iter[op]
        out[f"{op}_ns_per_vreg_op"] = per_iter[op] / (rows / 8 * NACC) * 1e9
    for op in ("sqrt", "div"):
        out[f"{op}_weight"] = max(float(per_iter[op] / per_iter["fma"]), 1.0)
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
