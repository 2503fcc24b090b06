#!/usr/bin/env python
"""Optimize a lens through RENDERED image quality (end-to-end design).

Adam on (c, t) against -PSNR + w·(1-SSIM) of the full imaging pipeline
(trace -> PSF -> SVOLA convolution -> distortion warp) — the training loop
the reference's dormant `OpticsSimulator.call` was built for
(`optics_simulator_lite.py:325-343`, the premise of arXiv:2212.04441).

Examples:
  python examples/optimize_through_image.py --lens double_gauss \
      --defocus 0.3 --steps 60
  python examples/optimize_through_image.py --lens cooke --perturb 0.05 \
      --steps 200 --image-size 128
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lens", default="double_gauss")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--defocus", type=float, default=0.3,
                    help="mm added to the image distance before optimizing")
    ap.add_argument("--perturb", type=float, default=0.0,
                    help="multiply curvatures by (1+p) before optimizing")
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--fields", type=int, default=5)
    ap.add_argument("--rings", type=int, default=8)
    ap.add_argument("--psf", type=int, default=25)
    ap.add_argument("--ssim-weight", type=float, default=10.0)
    ap.add_argument("--log-every", type=int, default=5)
    ap.add_argument("--save-yaml", default=None)
    args = ap.parse_args()

    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()
    from torchoptics_tpu import imaging
    from torchoptics_tpu import optimize as opt
    from torchoptics_tpu import simulator as sim
    from torchoptics_tpu import zoo
    from torchoptics_tpu.utils import images as img_util

    specs, lens = zoo.build(args.lens)
    efl = float(lens.efl[0])
    if args.defocus:
        lens = lens.replace(t=lens.t.at[0, -1].add(args.defocus))
    if args.perturb:
        lens = lens.replace(c=lens.c * (1.0 + args.perturb))

    size = (args.image_size, args.image_size)
    radiance = jnp.asarray(
        img_util.load_test_image(size, prefer_real=True)[None])

    config = sim.SimulatorConfig(
        n_sampled_fields=args.fields, n_pupil_rings=args.rings,
        pupil_sampling="circular", n_ray_aiming_iter=1,
        psf_shape=(args.psf, args.psf), psf_abs_pixel_size=4e-3,
        psf_grid_shape=(3, 3))

    _, psnr0, ssim0 = imaging.simulate(specs, lens, radiance, config)
    print(f"start: psnr={float(psnr0[0]):.2f} dB ssim={float(ssim0[0]):.4f}")

    optimizer = opt.LensOptimizer(
        specs=specs, config=config, learning_rate=args.lr,
        trainable=("c", "t"), qc_variables=False, efl_target=efl,
        loss_fn=imaging.make_image_loss_fn(radiance,
                                           ssim_weight=args.ssim_weight))
    state = optimizer.init(lens)
    t0 = time.time()
    for i in range(args.steps):
        state, total, ld = optimizer.step(state)
        if i % args.log_every == 0:
            print(f"step {i:4d}: psnr={float(ld['psnr']):.2f} dB "
                  f"ssim={float(ld['ssim']):.4f}", flush=True)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s ({args.steps / dt:.2f} steps/s)")

    final = optimizer.build_lens(state.params)
    _, psnr1, ssim1 = imaging.simulate(specs, final, radiance, config)
    print(f"final: psnr={float(psnr1[0]):.2f} dB ssim={float(ssim1[0]):.4f} "
          f"(recovered {float(psnr1[0]) - float(psnr0[0]):+.2f} dB)")
    if args.save_yaml:
        from torchoptics_tpu.models import io as tio
        tio.save_lens(args.save_yaml, specs, final)
        print(f"wrote {args.save_yaml}")


if __name__ == "__main__":
    main()
