#!/usr/bin/env python
"""Optimize a lens design by gradient descent on the optical loss.

Examples:
  python examples/optimize_lens.py --lens cooke --steps 500
  python examples/optimize_lens.py --lens-yaml start.yml --steps 2000 \
      --save-yaml optimized.yml --checkpoint opt.npz
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lens", default="cooke")
    ap.add_argument("--lens-yaml", default=None)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--fields", type=int, default=8)
    ap.add_argument("--rings", type=int, default=8)
    ap.add_argument("--perturb", type=float, default=0.0,
                    help="multiply curvatures by (1+p) before optimizing")
    ap.add_argument("--freeze-glass", action="store_true")
    ap.add_argument("--full-loss", action="store_true",
                    help="include ray-path/angle/glass penalties")
    ap.add_argument("--save-yaml", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--log-every", type=int, default=50)
    args = ap.parse_args()

    from torchoptics_tpu.utils.backend import ensure_backend
    ensure_backend()
    from torchoptics_tpu import optimize as opt
    from torchoptics_tpu import simulator as sim
    from torchoptics_tpu import zoo
    from torchoptics_tpu.models import io as tio

    if args.lens_yaml:
        specs, lens = tio.load_lens(args.lens_yaml)
    else:
        specs, lens = zoo.build(args.lens)
    # target the NOMINAL focal length, not the perturbed one, so
    # perturb-and-recover runs converge back to the design scale
    efl_target = float(lens.efl[0])
    if args.perturb:
        lens = lens.replace(c=lens.c * (1.0 + args.perturb))

    config = sim.SimulatorConfig(
        n_sampled_fields=args.fields, n_pupil_rings=args.rings,
        pupil_sampling="circular", n_ray_aiming_iter=1)
    trainable = ("c", "t") if args.freeze_glass else ("c", "t", "g")
    optimizer = opt.LensOptimizer(
        specs=specs, config=config, learning_rate=args.lr,
        trainable=trainable, use_full_loss=args.full_loss,
        qc_variables=not args.freeze_glass,
        efl_target=efl_target)

    state = optimizer.init(lens)
    t0 = time.time()
    for i in range(args.steps):
        state, total, loss_dict = optimizer.step(state)
        if i % args.log_every == 0:
            parts = " ".join(f"{k}={float(v):.5f}"
                             for k, v in sorted(loss_dict.items()))
            print(f"step {i:5d}: total={float(total):.5f} {parts}",
                  flush=True)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps / dt:.1f} steps/s)")

    final = optimizer.build_lens(state.params)
    if args.save_yaml:
        tio.save_lens(args.save_yaml, specs, final)
        print(f"wrote {args.save_yaml}")
    if args.checkpoint:
        from torchoptics_tpu.utils import checkpoint as ckpt
        ckpt.save(args.checkpoint, state,
                  metadata={"steps": args.steps, "lr": args.lr})
        print(f"wrote {args.checkpoint}")


if __name__ == "__main__":
    main()
