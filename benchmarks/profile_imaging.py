"""Stage-by-stage timing of the imaging pipeline at 1024 px.

Breaks `imaging.apply_optics_model` (the BASELINE config-5 render) into its
constituent device programs and times each one with the repo's fetch-synced
protocol, so the 88 ms/frame (BENCH_r04 `imaging_1024px`) is attributed to a
stage instead of a shrug. Run on the real chip:

    python benchmarks/profile_imaging.py [--px 1024]
"""

import argparse
import json
import math
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=1024)
    args = ap.parse_args()
    px = args.px

    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from torchoptics_tpu import imaging, zoo
    from torchoptics_tpu import simulator as sim_mod
    from torchoptics_tpu.ops import image as image_mod
    from torchoptics_tpu.utils import images as img_util
    from torchoptics_tpu.utils.timing import time_step_stats

    specs, lens = zoo.build("double_gauss")
    img_cfg = sim_mod.SimulatorConfig(
        n_sampled_fields=9, n_pupil_rings=24, pupil_sampling="circular",
        n_ray_aiming_iter=1, psf_shape=(33, 33), psf_abs_pixel_size=4e-3,
        psf_grid_shape=(5, 5))

    radiance = jnp.asarray(
        img_util.load_test_image((px, px), prefer_real=True)[None])

    model = jax.jit(lambda l: imaging.sample_optics_model(specs, l, img_cfg))(
        lens)
    jax.block_until_ready(model)

    field_lim = imaging.sample_field_lim(px, px)
    x0, x1, y0, y1 = (float(v) for v in field_lim)
    diag = math.sqrt(2) * px
    y_map = np.linspace(y0, y1, px, dtype=np.float32)
    x_map = np.linspace(x0, x1, px, dtype=np.float32)
    field_map = jnp.asarray(np.sqrt(x_map[None, :] ** 2 + y_map[:, None] ** 2))

    psf_shape = np.asarray(img_cfg.psf_shape)
    resized = (psf_shape * img_cfg.psf_abs_pixel_size * diag
               / img_cfg.sensor_diagonal)
    resized = np.maximum((np.floor(resized / 2) * 2 + 1).astype(int), 3)
    gh, gw = img_cfg.psf_grid_shape
    print(f"px={px}  resized psf={tuple(resized)}  grid={gh}x{gw}")

    def interp_stage(sampled_psfs):
        p = image_mod.interpolate_psfs(sampled_psfs, field_map, (gh, gw))
        return image_mod.rotate_and_resize_psfs(p, x_map, y_map, (gh, gw),
                                                tuple(resized))

    psfs = jax.jit(interp_stage)(model.sampled_psfs)
    jax.block_until_ready(psfs)
    psfs_b = jnp.broadcast_to(psfs, (1,) + psfs.shape[1:])
    overlap = tuple(int(v) for v in
                    (0.25 * np.asarray((px, px)) / np.asarray((gh, gw))
                     ).astype(int))
    patch = (px // gh + 2 * overlap[0], px // gw + 2 * overlap[1])
    kh = int(resized[0])
    print(f"overlap={overlap}  patch={patch}  fft="
          f"{patch[0] + 2 * (kh // 2)}^2 x {gh * gw} patches x 3ch x 3 ffts")

    def svola_stage(rad, p):
        return image_mod.svola_convolution(rad, overlap, p, (gh, gw), "hann")

    irr = jax.jit(svola_stage)(radiance, psfs_b)
    jax.block_until_ready(irr)

    def metrics_stage(rad, ir):
        return image_mod.psnr(rad, ir), image_mod.ssim(rad, ir)

    def ri_stage(ir, sampled_ri):
        ri_map = image_mod.interpolate_relative_illumination(
            sampled_ri, field_map)
        return ir * ri_map[None, ..., None]

    x_img = jnp.broadcast_to(jnp.linspace(-1., 1., px)[None, :],
                             (px, px)).reshape(-1)
    y_img = jnp.broadcast_to(jnp.linspace(-1., 1., px)[:, None],
                             (px, px)).reshape(-1)

    def _shift_fns(shifts):
        m = model._replace(sampled_distortion_shifts=shifts)

        def shifts_px(iip, jjp):
            import jax.numpy as jnp
            xn = jnp.asarray(jjp) * (2.0 / (px - 1)) - 1.0
            yn = jnp.asarray(iip) * (2.0 / (px - 1)) - 1.0
            xn, yn = jnp.broadcast_arrays(xn, yn)
            dx, dy = imaging.compute_distortion_shift(
                m, xn, yn, (-1, 1), (-1, 1), field_lim)
            return dx * (px - 1) / 2.0, dy * (px - 1) / 2.0
        return shifts_px

    def warp_stage(ir, shifts):
        """The default 'separable' two-pass warp."""
        fns = _shift_fns(shifts)
        return image_mod.warp_bicubic_separable(
            ir, lambda i, j: fns(i, j)[0], lambda i, j: fns(i, j)[1],
            imaging.resolve_max_warp_px(img_cfg, px, px))

    def warp_gather_stage(ir, shifts):
        """The exact one-pass gather warp (reference)."""
        m = model._replace(sampled_distortion_shifts=shifts)
        xs, ys = imaging.compute_distortion_shift(
            m, x_img, y_img, (-1, 1), (-1, 1), field_lim)
        return image_mod.apply_distortion_by_warping(ir, x_img - xs,
                                                     y_img - ys)

    def full_apply(rad):
        return imaging.apply_optics_model(model, rad, field_lim, img_cfg)[0]

    def sample_stage(l):
        return imaging.sample_optics_model(specs, l, img_cfg)

    stages = {
        "full_apply": (full_apply, (radiance,)),
        "sample_optics_model": (sample_stage, (lens,)),
        "interp_rotate_resize_psfs": (interp_stage, (model.sampled_psfs,)),
        "svola": (svola_stage, (radiance, psfs_b)),
        "psnr_ssim": (metrics_stage, (radiance, irr)),
        "relative_illum": (ri_stage, (irr,
                                      model.sampled_relative_illumination)),
        "warp": (warp_stage, (irr, model.sampled_distortion_shifts)),
        "warp_gather": (warp_gather_stage,
                        (irr, model.sampled_distortion_shifts)),
    }

    out = {}
    for name, (fn, fargs) in stages.items():
        s = time_step_stats(jax.jit(fn), fargs, n_iter=5, reps=3)
        out[name] = round(s["min"] * 1e3, 3)
        print(f"{name:28s} {s['min'] * 1e3:8.2f} ms  (spread {s['spread']:.2f})")

    print(json.dumps({"px": px, "ms": out}))


if __name__ == "__main__":
    main()
