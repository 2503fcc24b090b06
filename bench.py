"""Benchmark: differentiable ray-surface intersections/sec through the
6-element double-Gauss (fwd+bwd), per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Protocol (hardened r2): every timing is min/median/max/spread over 5 reps of
10 iterations; two ray scales (442k and 2.46M) so regressions are detectable
through the ±50% session-to-session relay variance (RESULTS.md); a measured
forward-only ceiling and estimated-FLOP effective throughput give a
roofline-style fraction; the imaging pipeline (BASELINE config 5) gets its
own row. The baseline target (BASELINE.json north star) is 100e6
differentiable ray-surface intersections/s/chip; the reference publishes no
numbers (BASELINE.md), so vs_baseline is measured/target.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

TARGET_INTERSECTIONS_PER_SEC = 100e6

# Hand-counted FLOPs per ray-surface intersection in the fused kernels
# (ops/pallas_trace.py): ~60 for one _fwd_surface evaluation; the backward
# kernel re-runs the forward and applies the adjoint chain (~110), so a
# fwd+bwd step costs ~230 per intersection. Estimates (documented, stable
# across rounds) — used only to express measured time as effective GFLOP/s.
FLOPS_FWD = 60.0
FLOPS_FWDBWD = 230.0

# Per-intersection op census of the fused kernels, split by VPU cost class
# (line-by-line count of `ops/pallas_trace.py` `_fwd_surface`:56-104 and
# `_bwd_surface`:107-209; the bwd kernel re-runs the forward to rebuild its
# locals, so its census includes the fwd ops). "simple" = one lane-op
# (add/mul/select/cmp). "fma_pairs" = how many of those are mul+add pairs
# Mosaic can fuse into a single FMA issue (hand-counted from the same
# source, e.g. `e = -(x*cx + y*cy + z*cz)` carries two). sqrt/div run on
# the slower special-function path and get MEASURED weights from the VPU
# microbench (benchmarks/vpu_peak.py) instead of being miscounted as
# single flops.
#
# Roofline semantics: the measured ceiling (vpu_lane_ops_per_s) is ISSUES
# per second. Assuming every fusible pair fuses gives the MINIMUM issue
# rate consistent with the measured intersection rate, so
# roofline_fraction is a PROVABLE LOWER BOUND on the fraction of the issue
# ceiling the kernel sustains (it cannot exceed 1; the unfused census
# reading is also reported and MAY exceed 1 — that excess proves fusion is
# happening, it is not extra headroom).
OPS_FWD = {"simple": 65, "sqrt": 3, "div": 1, "fma_pairs": 19}
OPS_BWD = {"simple": 175, "sqrt": 3, "div": 5,          # incl. fwd recompute
           "fma_pairs": 46}
OPS_FWDBWD = {k: OPS_FWD[k] + OPS_BWD[k] for k in OPS_FWD}


def _weighted_ops(census, weights, fused=False):
    """Lane-issue-equivalents of one intersection under measured sqrt/div
    weights ({'sqrt_weight', 'div_weight'} from benchmarks.vpu_peak).
    ``fused=True`` retires each fusible mul+add pair as ONE FMA issue."""
    simple = census["simple"] - (census["fma_pairs"] if fused else 0)
    return (simple
            + census["sqrt"] * weights.get("sqrt_weight", 4.0)
            + census["div"] * weights.get("div_weight", 4.0))


def _ensure_backend():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()


def _stats(step, args, n_iter=10, reps=5):
    from torchoptics_tpu.utils.timing import time_step_stats
    return time_step_stats(step, args, n_iter=n_iter, reps=reps)


def _trace_workload(specs, lens, n_fields, rings, rows, on_tpu):
    """Time d(spot RMS)/d(c,t) at one ray scale; returns the extras dict."""
    from torchoptics_tpu.ops import metrics as metrics_mod
    from torchoptics_tpu.ops import pallas_trace as pallas_mod
    from torchoptics_tpu.ops import trace as trace_mod

    n_surfaces = int(lens.structure.n_surfaces[0])
    cfg = trace_mod.TraceConfig(
        mode="circular", n_rays=(rings, rings),
        rel_fields=tuple(float(f) for f in np.linspace(0, 1, n_fields)),
        wavelengths=(459.0, 520.0, 640.0),
        n_ray_aiming_iter=1)
    n_rays = len(cfg.rel_fields) * rings * rings * len(cfg.wavelengths)

    def loss_xla(c, t):
        res = trace_mod.trace_rays(specs, lens.replace(c=c, t=t), cfg)
        return metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)[0]

    def loss_pallas(c, t):
        # The production fast path: W-outer front-end (relayout-free) ->
        # fused kernel -> flat-layout RMS reduction. ~3x the end-to-end
        # rate of the packaged (F, P, W) result path at 2.46M rays.
        return pallas_mod.spot_rms_fused(specs, lens.replace(c=c, t=t), cfg,
                                         rows=rows)

    def loss_pallas_packaged(c, t):
        res = pallas_mod.trace_rays_fused(specs, lens.replace(c=c, t=t), cfg,
                                          rows=rows)
        return metrics_mod.compute_rms2d(res.x, res.y, res.ray_ok)[0]

    out = {"rays": n_rays, "surfaces": n_surfaces}
    s_xla = _stats(jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1))),
                   (lens.c, lens.t))
    out["xla_fwdbwd"] = s_xla
    best = s_xla["min"]
    if on_tpu:
        s_p = _stats(jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1))),
                     (lens.c, lens.t))
        out["pallas_fwdbwd"] = s_p
        out["pallas_fwdbwd_packaged_result"] = _stats(
            jax.jit(jax.value_and_grad(loss_pallas_packaged,
                                       argnums=(0, 1))),
            (lens.c, lens.t))
        # Forward-only = the measured compute ceiling of the same VPU code.
        s_f = _stats(jax.jit(loss_pallas), (lens.c, lens.t))
        out["pallas_fwd_only"] = s_f
        best = min(best, s_p["min"])
        gflops_fwd = n_rays * n_surfaces * FLOPS_FWD / s_f["min"] / 1e9
        gflops_fb = n_rays * n_surfaces * FLOPS_FWDBWD / s_p["min"] / 1e9
        out["effective_gflops_fwd_only"] = gflops_fwd
        out["effective_gflops_fwdbwd"] = gflops_fb
        # Backward-pass overhead vs the forward-only ceiling measured on the
        # same chip in the same session (immune to relay variance): the
        # stash-locals backward does ~(230-60)/60 ≈ 2.8x the forward's
        # arithmetic, so a ratio well under 3.8 means the bwd kernel runs
        # closer to the VPU roofline than the naive FLOP count predicts.
        out["fwdbwd_over_fwd_time_ratio"] = s_p["min"] / s_f["min"]

        # In-jit iterated step: lax.scan chains K fwd+bwd steps inside ONE
        # dispatch, so per-step time excludes the per-call relay/dispatch
        # overhead — this is the honest device-compute time the roofline
        # fraction is computed against. The tiny gradient feedback makes
        # each iteration data-depend on the last (nothing can be CSE'd).
        K = 10
        vag = jax.value_and_grad(loss_pallas, argnums=(0, 1))

        def chain(c, t):
            def body(carry, _):
                c, t, acc = carry
                v, (gc, gt) = vag(c, t)
                return (c + 1e-30 * gc, t + 1e-30 * gt, acc + v), None
            (c, t, acc), _ = jax.lax.scan(body, (c, t, 0.0), None, length=K)
            return acc
        chain_jit = jax.jit(chain)
        s_chain = _stats(chain_jit, (lens.c, lens.t), n_iter=2, reps=5)
        step_dev = s_chain["min"] / K
        out["pallas_fwdbwd_in_jit"] = {**s_chain, "per_step_s": step_dev}
        out["dispatch_overhead_ms"] = (s_p["min"] - step_dev) * 1e3
        out["intersections_per_sec_device"] = n_rays * n_surfaces / step_dev
        out["_chain"] = (chain_jit, (lens.c, lens.t), K)   # for paired roofline

    out["intersections_per_sec"] = n_rays * n_surfaces / best
    if on_tpu:
        out["intersections_per_sec_packaged_result"] = (
            n_rays * n_surfaces
            / out["pallas_fwdbwd_packaged_result"]["min"])
    out["step_ms_best"] = best * 1e3
    return out


def _opl_workload(specs, lens, n_fields, rings, rows, on_tpu):
    """Fused in-kernel OPL accumulator vs the XLA 'dist'-aggregate stack
    (the ops.wavefront engine choice): fwd+bwd of a masked OPL sum wrt
    (c, t). VERDICT r3 #3's bench row."""
    import dataclasses
    from torchoptics_tpu.ops import trace as trace_mod
    from torchoptics_tpu.ops import wavefront as wf

    n_surfaces = int(lens.structure.n_surfaces[0])
    cfg = trace_mod.TraceConfig(
        mode="circular", n_rays=(rings, rings),
        rel_fields=tuple(float(f) for f in np.linspace(0, 1, n_fields)),
        wavelengths=(459.0, 520.0, 640.0), n_ray_aiming_iter=1)
    cfg_p = dataclasses.replace(cfg, engine="pallas")
    n_rays = len(cfg.rel_fields) * rings * rings * len(cfg.wavelengths)

    def opl_sum(c, t, cfg_):
        res, opl = wf.optical_path_lengths(specs, lens.replace(c=c, t=t),
                                           cfg_)
        return jnp.sum(jnp.where(res.ray_ok, opl, 0.0))

    out = {"rays": n_rays, "surfaces": n_surfaces}
    s_x = _stats(jax.jit(jax.value_and_grad(
        lambda c, t: opl_sum(c, t, cfg), argnums=(0, 1))), (lens.c, lens.t))
    out["xla_unroll_dist_stack"] = s_x
    best = s_x["min"]
    if on_tpu:
        s_p = _stats(jax.jit(jax.value_and_grad(
            lambda c, t: opl_sum(c, t, cfg_p), argnums=(0, 1))),
            (lens.c, lens.t))
        out["pallas_fused_accumulator"] = s_p
        out["speedup_vs_xla"] = s_x["min"] / s_p["min"]
        best = min(best, s_p["min"])
    out["intersections_per_sec"] = n_rays * n_surfaces / best
    return out


def add_roofline(out, measure_vpu, vpu_full, n_pairs=3):
    """Fill the roofline fields from least-contended rate estimates.

    The headline fraction assumes every fusible mul+add pair fuses into
    one FMA issue — the minimum issue rate consistent with the
    measurement, i.e. a provable LOWER bound on the fraction of the
    ceiling sustained (see the census comment above). The unfused reading
    may exceed 1; that proves fusion, not headroom.
    """
    if "_chain" not in out:
        return out
    chain_jit, args, K = out.pop("_chain")
    n_int = out["rays"] * out["surfaces"]
    # Least-contended estimates of BOTH rates: wall-clock through the
    # relay slows by up to ~2x for minutes at a time (consistent with a
    # time-shared chip), and interference only ever makes a measured rate
    # LOWER — so the max observed rate is the closest to hardware truth
    # for ceiling and kernel alike. Quick ceiling samples with nonsensical
    # slopes (negative, or above any physical issue rate) are discarded.
    ceilings = [vpu_full["vpu_lane_ops_per_s"]]
    rates = [out["intersections_per_sec_device"]]
    for _ in range(n_pairs):
        v = measure_vpu(n_iter=2, reps=2)
        if 0.0 < v["fma_ops_per_s"] < 5e12:
            ceilings.append(v["fma_ops_per_s"])
        s = _stats(chain_jit, args, n_iter=2, reps=3)
        rates.append(n_int / (s["min"] / K))
    ceiling = max(ceilings)
    rate = max(rates)
    w_fb = _weighted_ops(OPS_FWDBWD, vpu_full, fused=True)
    w_fb_u = _weighted_ops(OPS_FWDBWD, vpu_full)
    out["weighted_issues_per_intersection"] = {
        "fwd_fused": _weighted_ops(OPS_FWD, vpu_full, fused=True),
        "fwdbwd_fused": w_fb, "fwdbwd_unfused": w_fb_u}
    out["roofline_fraction"] = rate * w_fb / ceiling
    out["roofline_fraction_unfused_census"] = rate * w_fb_u / ceiling
    out["roofline_ceiling_samples"] = [float(c) for c in ceilings]
    out["roofline_kernel_rate_samples"] = [float(r) for r in rates]
    return out


def main():
    _ensure_backend()
    from torchoptics_tpu.models import zoo
    from torchoptics_tpu.ops import pallas_trace as pallas_mod
    import torchoptics_tpu.simulator as sim_mod
    from torchoptics_tpu import imaging
    from torchoptics_tpu.utils import images as img_util

    specs, lens = zoo.build("double_gauss")
    n_surfaces = int(lens.structure.n_surfaces[0])
    on_tpu = jax.default_backend() == "tpu"

    # Measured VPU speed-of-light + sqrt/div cost weights (full protocol,
    # recorded in the extras); the roofline FRACTIONS use paired
    # same-window ratios instead (see add_roofline).
    vpu = None
    if on_tpu:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from vpu_peak import measure_vpu
        vpu = measure_vpu()

    # Two ray scales: medium (16 x 96^2 x 3 = 442k) and large
    # (32 x 160^2 x 3 = 2.46M) — fixed across rounds for comparability.
    medium = _trace_workload(specs, lens, 16, 96, 32, on_tpu)
    large = _trace_workload(specs, lens, 32, 160, 64, on_tpu)
    if on_tpu:
        add_roofline(medium, measure_vpu, vpu)
        add_roofline(large, measure_vpu, vpu)

    # Lens-optimization step: full unsupervised objective Lu (fwd+bwd).
    sim_cfg = sim_mod.SimulatorConfig(
        n_sampled_fields=32, n_pupil_rings=160,
        pupil_sampling="circular", n_ray_aiming_iter=1,
        wavelengths=(459.0, 520.0, 640.0))

    def lu_pallas(c, t):
        Lu, _ = pallas_mod.unsupervised_loss_fused(
            specs, lens.replace(c=c, t=t), sim_cfg, rows=64)
        return Lu

    def lu_xla(c, t):
        _, ld = sim_mod.do_ray_tracing(specs, lens.replace(c=c, t=t),
                                       sim_cfg)
        return ld["loss_unsup"]

    lu_stats = _stats(
        jax.jit(jax.value_and_grad(lu_pallas if on_tpu else lu_xla,
                                   argnums=(0, 1))),
        (lens.c, lens.t))

    # Multi-chip fast path on this chip: the shard_map-wrapped fused batch
    # kernel (parallel.shard.sharded_fused_losses) on a 1-device mesh vs the
    # direct fused batch launch — measures the shard_map dispatch overhead of
    # the composition real pods run (the kernels themselves are identical).
    shard_stats = None
    if on_tpu:
        from torchoptics_tpu.models.structure import Lens, Specs, Structure
        from torchoptics_tpu.ops import pallas_batch
        from torchoptics_tpu.parallel import mesh as mesh_mod
        from torchoptics_tpu.parallel import shard as shard_mod

        n_pop = 4
        p = zoo.get_prescription("double_gauss")
        stp = Structure(tuple(p["stop_idx"] * n_pop),
                        tuple(p["sequence"] * n_pop))
        tile = lambda v: jnp.tile(jnp.asarray(v, jnp.float32)[None, 0],
                                  (n_pop, 1))
        lens_p = Lens(stp, tile(lens.c), tile(lens.t), tile(lens.nd),
                      tile(lens.v))
        specs_p = Specs(stp, jnp.tile(specs.epd, n_pop),
                        jnp.tile(specs.hfov, n_pop))
        pop_cfg = sim_mod.SimulatorConfig(
            n_sampled_fields=8, n_pupil_rings=24,
            pupil_sampling="circular", n_ray_aiming_iter=1,
            wavelengths=(459.0, 520.0, 640.0), trace_engine="pallas")
        mesh1 = mesh_mod.make_mesh(jax.devices()[:1])

        def lu_shard(c, t):
            total, _ = shard_mod.sharded_fused_losses(
                specs_p, lens_p.replace(c=c, t=t), pop_cfg, mesh1,
                full=False)
            return total

        def lu_direct(c, t):
            total, _ = pallas_batch.batched_unsupervised_loss(
                specs_p, lens_p.replace(c=c, t=t), pop_cfg)
            return total

        s_shard = _stats(jax.jit(jax.value_and_grad(lu_shard,
                                                    argnums=(0, 1))),
                         (lens_p.c, lens_p.t))
        s_direct = _stats(jax.jit(jax.value_and_grad(lu_direct,
                                                     argnums=(0, 1))),
                          (lens_p.c, lens_p.t))
        shard_stats = {
            "population": n_pop,
            "shard_map_1dev_mesh": s_shard,
            "direct_batch_kernel": s_direct,
            "shard_map_overhead_ms": (s_shard["min"] - s_direct["min"]) * 1e3,
        }

    # Fused OPL accumulator vs the XLA "dist" aggregate stack (wavefront
    # layer fast path, VERDICT r3 #3) at the medium ray scale.
    opl = _opl_workload(specs, lens, 16, 96, 32, on_tpu)

    # Imaging pipeline (BASELINE config 5): PSF render + SVOLA + warp on a
    # real photograph, at 256/512/1024 px (VERDICT r3 #6 scale rows).
    img_cfg = sim_mod.SimulatorConfig(
        n_sampled_fields=9, n_pupil_rings=24, pupil_sampling="circular",
        n_ray_aiming_iter=1, psf_shape=(33, 33), psf_abs_pixel_size=4e-3,
        psf_grid_shape=(5, 5))
    radiance = jnp.asarray(
        img_util.load_test_image((256, 256), prefer_real=True)[None])
    render = jax.jit(
        lambda l, r: imaging.simulate(specs, l, r, img_cfg)[0])
    img_stats = _stats(render, (lens, radiance), n_iter=5, reps=5)

    img_scale_stats = {}
    for px in (512, 1024):
        rad = jnp.asarray(
            img_util.load_test_image((px, px), prefer_real=True)[None])
        render_px = jax.jit(
            lambda l, r: imaging.simulate(specs, l, r, img_cfg)[0])
        s = _stats(render_px, (lens, rad), n_iter=3, reps=3)
        img_scale_stats[f"imaging_{px}px"] = {
            **s, "ms_per_frame": s["min"] * 1e3,
            "megapixels_per_sec": px * px / s["min"] / 1e6,
        }

    # End-to-end-design step: fwd+bwd of the image-quality loss (-PSNR)
    # through trace -> PSF -> SVOLA -> warp wrt (c, t) — the optimization
    # the upstream paper trains (`optics_simulator_lite.py:325-343`).
    def img_loss(c, t):
        total, _ = imaging.image_quality_loss(
            specs, lens.replace(c=c, t=t), radiance, img_cfg)
        return total

    # In-jit scan chain (like pallas_fwdbwd_in_jit): each iteration's params
    # data-depend on the previous gradient, so nothing can be elided, and the
    # multi-step call is ms-scale where the relay's completion ack is
    # trustworthy (a single unchained fwd+bwd here "measured" 28 us — the
    # documented sub-ms early-ack trap).
    K_img = 5

    def img_chain(c, t):
        def body(carry, _):
            c, t, acc = carry
            v, (gc, gt) = jax.value_and_grad(img_loss, argnums=(0, 1))(c, t)
            return (c + 1e-30 * gc, t + 1e-30 * gt, acc + v), None
        (c, t, acc), _ = jax.lax.scan(body, (c, t, 0.0), None, length=K_img)
        return acc

    img_opt_chain = _stats(jax.jit(img_chain), (lens.c, lens.t),
                           n_iter=2, reps=5)
    img_opt_stats = {**img_opt_chain,
                     "per_step_s": img_opt_chain["min"] / K_img,
                     "chain_length": K_img}

    best = large["step_ms_best"] / 1e3
    intersections_per_sec = large["intersections_per_sec"]

    result = {
        "metric": "diff_ray_surface_intersections_per_sec_fwdbwd_double_gauss",
        "value": intersections_per_sec,
        "unit": "intersections/s/chip",
        "vs_baseline": intersections_per_sec / TARGET_INTERSECTIONS_PER_SEC,
        "extra": {
            "protocol": "min/median/max/spread over 5 reps x 10 iters",
            "workload_442k": medium,
            "workload_2.46M": large,
            "lens_opt_step_fwdbwd": lu_stats,
            "opl_wavefront_442k": opl,
            "imaging_256px_config5": {
                **img_stats,
                "ms_per_frame": img_stats["min"] * 1e3,
                "frames_per_sec": 1.0 / img_stats["min"],
            },
            **img_scale_stats,
            "image_loss_fwdbwd_256px": {
                **img_opt_stats,
                "ms_per_step": img_opt_stats["per_step_s"] * 1e3,
            },
            "shard_map_fused_1dev_mesh": shard_stats,
            "vpu_microbench": vpu,
            "ops_per_intersection": {"fwd": OPS_FWD, "fwdbwd": OPS_FWDBWD},
            "roofline_fraction": large.get("roofline_fraction"),
            "flops_per_intersection": {"fwd": FLOPS_FWD,
                                       "fwdbwd": FLOPS_FWDBWD},
            "step_time_ms": best * 1e3,
            "surfaces": n_surfaces,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
