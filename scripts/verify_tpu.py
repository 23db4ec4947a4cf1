"""On-chip correctness gate for the fused Pallas kernels.

The interpreter-mode tests (``tests/test_pallas_composite.py``) prove the
kernel *logic*; this script proves the Mosaic *compilation* on real hardware:
it renders the same scene through the fused Pallas kernels and through the
pure-XLA tiled backend ON THE CURRENT DEFAULT DEVICE and compares the images
and the parameter gradients.  ``bench.py`` calls :func:`verify` and embeds
the verdict in its JSON line, so a Mosaic miscompile can never ship behind a
good-looking fps number.

Runnable standalone:  ``python scripts/verify_tpu.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRAD_FIELDS = ("pos", "orient", "scale", "opacity", "color", "sh")


def verify(n: int = 4000, width: int = 256, height: int = 256,
           sharded: bool = False) -> dict:
    """Render pallas vs tiles on the default device; compare image + grads.

    Returns a dict with ``ok`` plus the measured diffs.  Tolerances follow
    ``tests/test_pallas_composite.py``: image atol 1e-5 (identical math in
    identical order — bit-equal in practice), per-field gradient atol
    2e-4 · max(1, |g|_max) (the MXU-batched per-splat reductions sum in a
    different order than XLA's scan autodiff).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gsplat_tpu as gt
    from gsplat_tpu.render import render_pallas

    # Exact-parity config: no early termination, roomy capacity.
    cfg = gt.RenderConfig(tile_capacity=512, transmittance_eps=0.0)
    splats = gt.random_splats(jax.random.PRNGKey(3), n, extent=0.8, sh_scale=0.2)
    cam = gt.make_camera(
        eye=[0.2, 0.4, 3.0], target=[0, 0, 0], width=width, height=height
    )
    # Real Mosaic kernels on TPU; interpreter when run on CPU (dev machines).
    interpret = jax.default_backend() == "cpu"

    img_t = np.asarray(jax.jit(lambda s: gt.render_tiles(s, cam, cfg))(splats))
    img_p = np.asarray(
        jax.jit(lambda s: render_pallas(s, cam, cfg, interpret=interpret))(splats)
    )
    img_diff = float(np.abs(img_p - img_t).max())

    w = jax.random.normal(jax.random.PRNGKey(5), (height, width, 4))
    g_t = jax.jit(jax.grad(lambda s: jnp.sum(gt.render_tiles(s, cam, cfg) * w)))(splats)
    g_p = jax.jit(
        jax.grad(
            lambda s: jnp.sum(render_pallas(s, cam, cfg, interpret=interpret) * w)
        )
    )(splats)
    grad_diff = 0.0  # max over fields of max|Δ| / max(1, |g_tiles|_max)
    for f in GRAD_FIELDS:
        a = np.asarray(getattr(g_t, f))
        b = np.asarray(getattr(g_p, f))
        grad_diff = max(grad_diff, float(np.abs(b - a).max() / max(1.0, np.abs(a).max())))

    # --- packed-payload production mode: the 8-row payload + 8-row gradient
    # space with bf16-packed colors (RenderConfig.payload_dtype="packed").
    # The image must still match the tiles backend (shared quantization; the
    # pack/unpack round-trip is bit-exact), and the gradients split into the
    # exact rows (tight tolerance) and the color/sh rows, whose per-pair
    # summands round to bf16 in the gradient space (~0.2% envelope; pos
    # inherits a small SH view-direction coupling).
    import dataclasses as _dc

    cfgk = _dc.replace(cfg, payload_dtype="packed")
    img_tk = np.asarray(jax.jit(lambda s: gt.render_tiles(s, cam, cfgk))(splats))
    img_pk = np.asarray(
        jax.jit(lambda s: render_pallas(s, cam, cfgk, interpret=interpret))(splats)
    )
    packed_img_diff = float(np.abs(img_pk - img_tk).max())
    g_tk = jax.jit(jax.grad(lambda s: jnp.sum(gt.render_tiles(s, cam, cfgk) * w)))(splats)
    g_pk = jax.jit(
        jax.grad(
            lambda s: jnp.sum(render_pallas(s, cam, cfgk, interpret=interpret) * w)
        )
    )(splats)
    packed_exact = 0.0   # pos/orient/scale/opacity rows (f32-exact path)
    packed_color = 0.0   # color/sh rows (bf16-packed per-pair summands)
    for f in GRAD_FIELDS:
        a = np.asarray(getattr(g_tk, f))
        b = np.asarray(getattr(g_pk, f))
        d = float(np.abs(b - a).max() / max(1.0, np.abs(a).max()))
        if f in ("color", "sh"):
            packed_color = max(packed_color, d)
        else:
            packed_exact = max(packed_exact, d)

    result = {
        "ok": False,
        "backend": jax.default_backend(),
        "interpret": interpret,
        "img_max_abs_diff": img_diff,
        "grad_max_rel_diff": grad_diff,
        "packed_img_max_abs_diff": packed_img_diff,
        "packed_grad_exact_rows_rel_diff": packed_exact,
        "packed_grad_color_rows_rel_diff": packed_color,
        "n": n,
        "size": [width, height],
    }
    ok = bool(np.isfinite(img_diff) and np.isfinite(grad_diff)
              and img_diff < 1e-5 and grad_diff < 2e-4
              and np.isfinite(packed_img_diff) and packed_img_diff < 1e-5
              and np.isfinite(packed_exact) and packed_exact < 2e-3
              and np.isfinite(packed_color) and packed_color < 2e-2)

    if sharded:
        # Sharded-pallas sanity on the real chip: render_sharded on a
        # 1-device mesh exercises the shard_map + strip-pallas branch
        # (row_offset plumbing, per-strip budget) through the
        # MOSAIC-compiled kernels — one device, so the image must equal the
        # plain pallas render bit-for-bit.  Opt-in: the shard_map graph
        # costs ~10 min of remote compile on the axon tunnel, too slow for
        # every bench run (tests + dryrun cover the same branch in
        # interpreter mode every round).
        from gsplat_tpu.parallel.mesh import splat_mesh
        from gsplat_tpu.parallel.render_sharded import render_sharded, shard_splats

        mesh1 = splat_mesh(1)
        backend_name = "pallas_interpret" if interpret else "pallas"
        img_s = np.asarray(
            render_sharded(
                shard_splats(splats, mesh1), cam, cfg, mesh1, backend=backend_name
            )
        )
        sharded_diff = float(np.abs(img_s - img_p).max())
        result["sharded_pallas_max_abs_diff"] = sharded_diff
        ok = ok and sharded_diff == 0.0

    result["ok"] = ok
    return result


if __name__ == "__main__":
    import json
    import sys as _sys

    print(json.dumps(verify(sharded="--sharded" in _sys.argv)))
