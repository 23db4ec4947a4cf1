"""Fit splats to posed target images (the training capability the reference
lacks — BASELINE.json config 5).

Self-contained demo: renders a synthetic "ground-truth" scene from a ring of
cameras, then fits a randomly-initialized splat set to those images with Adam,
checkpointing along the way.

Usage:
    python examples/fit_scene.py [--splats 2000] [--steps 300] [--size 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=2000)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (optional)")
    ap.add_argument("--out", default=None, help="save fitted scene to PLY")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    import gsplat_tpu as gt
    from gsplat_tpu.train.loss import psnr
    from gsplat_tpu.train.params import params_from_splats, splats_from_params
    from gsplat_tpu.train.trainer import default_optimizer, make_train_step

    key = jax.random.PRNGKey(0)
    target_scene = gt.random_splats(key, args.splats, extent=0.7, sh_scale=0.1)
    cams, targets = [], []
    cfg = gt.RenderConfig()
    for v in range(args.views):
        ang = 2 * np.pi * v / args.views
        eye = [2.5 * np.sin(ang), 0.5, 2.5 * np.cos(ang)]
        cam = gt.make_camera(eye, [0, 0, 0], args.size, args.size)
        img = gt.render(target_scene, cam, cfg)
        cams.append(cam)
        targets.append(img[..., :3] + (1.0 - img[..., 3:4]))
    print(f"rendered {args.views} target views")

    init = gt.random_splats(jax.random.PRNGKey(1), args.splats, extent=0.7)
    params = params_from_splats(init)
    opt = default_optimizer(lr_pos=2e-3)
    opt_state = opt.init(params)
    steps = [make_train_step(opt, cam, cfg, lambda_dssim=0.2) for cam in cams]

    for it in range(args.steps):
        v = it % args.views
        params, opt_state, loss = steps[v](params, opt_state, targets[v])
        if it % 50 == 0 or it == args.steps - 1:
            img = gt.render(splats_from_params(params), cams[0], cfg)
            rgb = img[..., :3] + (1.0 - img[..., 3:4])
            print(
                f"step {it:4d}  loss {float(loss):.4f}  "
                f"psnr(view0) {float(psnr(rgb, targets[0])):.2f} dB"
            )
            if args.ckpt:
                from gsplat_tpu.io.checkpoint import save_checkpoint

                save_checkpoint(args.ckpt, it, params, opt_state)

    if args.out:
        gt.save_ply(args.out, splats_from_params(params))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
