"""Worker for the failure-recovery harness (SURVEY §5 "Failure detection /
elastic recovery": JAX has no elastic membership, so the failure model is
checkpoint-restart — this worker is the restartable training process).

Trains a tiny scene with a checkpoint every step.  With ``--crash-at k`` it
hard-kills itself (``os._exit``, no cleanup — simulating a preemption /
machine failure) immediately after saving step k's checkpoint.  On start it
ALWAYS tries to restore the latest checkpoint from the work dir (the
restart path), falling back to fresh initialization.  On reaching
``--steps`` it writes the final parameters to ``final.npz``.

Invoked by tests/test_failure_recovery.py:
    python tests/fr_worker.py <workdir> --steps N [--crash-at K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--crash-at", type=int, default=None)
    args = ap.parse_args()

    import numpy as np

    import gsplat_tpu as gt
    from gsplat_tpu.io.checkpoint import restore_checkpoint, save_checkpoint
    from gsplat_tpu.train.params import params_from_splats
    from gsplat_tpu.train.trainer import default_optimizer, make_train_step

    ckpt_dir = os.path.join(args.workdir, "ckpt")
    cfg = gt.RenderConfig(tile_capacity=256)
    cam = gt.make_camera([0.0, 0.3, 2.5], [0, 0, 0], 64, 64)
    key = jax.random.PRNGKey(3)
    target_splats = gt.random_splats(key, 24, extent=0.6, sh_scale=0.0)
    target_img = gt.render_tiles(target_splats, cam, cfg)
    target = target_img[..., :3] + (1.0 - target_img[..., 3:4])

    perturbed = gt.random_splats(jax.random.PRNGKey(4), 24, extent=0.6, sh_scale=0.0)
    params = params_from_splats(perturbed)
    opt = default_optimizer()
    opt_state = opt.init(params)
    start = 0
    try:
        start, params, opt_state = restore_checkpoint(
            ckpt_dir, params, opt_state
        )
        start += 1
        print(f"restored step {start - 1}, resuming at {start}", flush=True)
    except FileNotFoundError:
        print("fresh start", flush=True)

    step = make_train_step(opt, cam, cfg, backend="tiles", lambda_dssim=0.0)
    for i in range(start, args.steps):
        params, opt_state, loss = step(params, opt_state, target)
        save_checkpoint(ckpt_dir, i, params, opt_state)
        print(f"step {i} loss {float(loss):.6f}", flush=True)
        if args.crash_at is not None and i == args.crash_at:
            # Simulated machine failure: no cleanup, no atexit, no flushing
            # of anything past this point.
            os._exit(17)

    np.savez(
        os.path.join(args.workdir, "final.npz"),
        **{k: np.asarray(v) for k, v in vars(params).items()},
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
