"""Top-level render entry point.

The TPU-native analogue of the reference's per-frame driver — the scene hook
calling ``generateRenderGeometry → render → postRender``
(``gsplat_plugin/src/DM_GSplatHook.C:30-39``) — collapsed into one pure
function ``image = render(splats, camera, config)``: project → global depth
sort → tile binning → fused compositing, differentiable end-to-end.

Backends:
  * ``"pallas"``   — fused Pallas TPU kernels (production path).
  * ``"tiles"``    — pure-XLA tiled compositing (any platform; mid oracle).
  * ``"reference"``— O(N·H·W) per-pixel oracle (ground truth).
  * ``"auto"``     — pallas on TPU, tiles elsewhere.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .models.camera import Camera
from .models.splats import GaussianSplats
from .ops.binning import (
    RenderStats,
    bin_splats,
    count_pairs,
    tile_grid,
    warn_if_dropped,
)
from .ops.pallas.composite import composite_splats_pallas, unpack_image
from .ops.permute import permute_cols
from .ops.projection import N_FIELDS, ProjectedSplats, project_splats
from .ops.rasterize_ref import quantize_payload, render_reference, sanitize_projected
from .ops.rasterize_tiles import render_tiles, sort_by_depth
from .utils.config import RenderConfig


def render_pallas(
    splats: GaussianSplats,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    interpret: bool = False,
    order: jnp.ndarray = None,
    with_stats: bool = False,
    bg_depth: jnp.ndarray = None,
) -> jnp.ndarray:
    """Fused-kernel render.  Returns (H, W, 4) premultiplied RGBA — or
    ``(image, RenderStats)`` with ``with_stats=True`` (overflow counters as
    jit outputs; see :class:`gsplat_tpu.ops.binning.RenderStats`).

    ``order``: optional precomputed depth permutation (amortized sort).
    """
    if config.tile_h != 32 or config.tile_w != 32:
        raise ValueError("pallas backend requires tile_h == tile_w == 32")
    projected = project_splats(
        splats, camera, config.sh_order,
        tight_footprint=not config.soft_cutoff, only_sh=config.only_sh,
    )
    p = quantize_payload(sanitize_projected(projected), config)
    # Fields ARE permuted into depth order here (one 16-row gather), and the
    # binning then works purely in rank space.  The storage-order variant
    # (``bin_splats(..., order=...)`` + storage-index pair_splat, still used
    # by the sharded renderer) avoids the permute but was re-measured SLOWER
    # on-chip (275 vs 256 ms full fwd+bwd at 1M/1080p, scripts/profile_ab.py):
    # TPU gather throughput is locality-bound, and depth-rank payload queries
    # are nearly sorted within each tile segment while storage-order queries
    # are random.
    n_rows = 15 if config.depth_test else 14
    if order is None:
        p = sort_by_depth(p, n_rows=n_rows)
    else:
        # Mirror sort_by_depth's shape: permute the live rows and pad the
        # structural-zero rows — one full + one partial sublane-group
        # gather pass (the measured-winning split) instead of 8+8.
        p = ProjectedSplats(
            fields=jnp.pad(
                permute_cols(p.fields[:n_rows], order, 10),
                ((0, N_FIELDS - n_rows), (0, 0)),
            )
        )
    binned = bin_splats(
        p, camera.width, camera.height, config, with_tiles=False, with_grad_map=True
    )
    warn_if_dropped(binned, config)
    nty, ntx = tile_grid(camera.width, camera.height, config.tile_h, config.tile_w)

    bgd_packed = None
    if config.depth_test:
        from .ops.pallas.composite import pack_depth_packed

        bgd_packed = pack_depth_packed(bg_depth, nty, ntx)
    # Fused rasterization tail: payload gather (tile-sorted order — the
    # binning does no pair re-layout) + compositing kernel, one custom
    # VJP whose backward reads the kernel's gradient address space and
    # segment-reduces per splat (~10× faster than XLA's scatter-add).
    if config.depth_test:
        # payload row 10 = the view-depth row (field row 14)
        pay_rows = jnp.concatenate([p.fields[:10], p.fields[14:15]], axis=0)
    else:
        pay_rows = p.fields[:10]
    packed = composite_splats_pallas(
        pay_rows,
        binned.pair_splat,
        binned.tile_base,
        binned.tile_phi,
        binned.tile_span,
        binned.grad_base,
        binned.dest_of_exp,
        binned.exp_offsets,
        binned.exp_counts,
        binned.exp_rank,
        jnp.zeros((2,), jnp.int32),
        None,
        bgd_packed,
        nty,
        ntx,
        config,
        interpret,
    )
    image = unpack_image(packed, camera.height, camera.width)
    if with_stats:
        return image, RenderStats(dropped_pairs=binned.dropped_pairs)
    return image


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _count_pairs_jit(splats, camera, width, height, config):
    p = sanitize_projected(
        project_splats(
            splats, camera, config.sh_order,
            tight_footprint=not config.soft_cutoff,
        )
    )
    return count_pairs(p, width, height, config)


def measure_pairs(
    splats: GaussianSplats, camera: Camera, config: RenderConfig = RenderConfig()
) -> int:
    """Exact (tile, splat) pair count this frame would bin (host int)."""
    return int(
        _count_pairs_jit(splats, camera, camera.width, camera.height, config)
    )


def tune_pair_budget(
    splats: GaussianSplats,
    cameras,
    config: RenderConfig = RenderConfig(),
    headroom: float = 1.2,
    bucket: int = 1 << 17,
) -> RenderConfig:
    """Measure the scene's real (tile, splat) pair count and return a config
    whose static pair budget fits it, instead of the worst-case
    ``pairs_per_splat·N`` default.

    Every pair-proportional array (pair ids, pair payload, gradient address
    space, expansion map — ~100 B/pair fwd+bwd) is sized by the *static*
    budget, so fitting it cuts peak HBM proportionally — the difference
    between fitting and OOM at the 2^23 envelope — AND frame time (~6% at
    1M/1080p, bench.py: the pair gathers/sorts are per-query bound, so fewer
    budgeted queries = less time; re-measured after the round-3 gather
    rework — an earlier "time-neutral" reading was an artifact of the old
    9-row gather's pathological shape sensitivity).  One cheap counting pass
    per camera (projection + bbox arithmetic + a scalar reduce; no pair
    arrays), take the max, apply ``headroom``, round up to ``bucket`` so
    nearby cameras / training steps reuse the same jit cache entry.  The
    overflow contract is unchanged: if a later frame exceeds the tuned
    budget, the farthest pairs drop and the cull warning fires
    (``src/GSplatRenderer.C:366-376`` analogue) — raise ``headroom`` then.

    ``cameras``: one Camera or an iterable (e.g. the training set's extremes).
    """
    if isinstance(cameras, Camera):
        cameras = [cameras]
    worst = 0
    for cam in cameras:
        worst = max(worst, measure_pairs(splats, cam, config))
    budget = -(-int(round(worst * headroom)) // bucket) * bucket
    # The measured need wins in BOTH directions: heavy-tailed scenes
    # routinely exceed the pairs_per_splat default (a trained-statistics
    # 1M scene measures ~5.5 pairs/splat at 1080p — clamping to the
    # default's 3·N silently truncated 2.5M pairs before round 5).
    return dataclasses.replace(
        config, pair_budget_override=max(budget, bucket)
    )


def composite_over(image: jnp.ndarray, background_rgba: jnp.ndarray) -> jnp.ndarray:
    """Under-composite a premultiplied splat layer over an opaque-or-not
    background: ``out = splat + (1 − splat_a)·bg`` — exactly what the
    reference's front-to-back GL under-blend produces once the scene is the
    final (farthest) layer (``src/GSplatRenderer.C:615-621``)."""
    a = image[..., 3:4]
    return image + (1.0 - a) * background_rgba


def render(
    splats: GaussianSplats,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    backend: str = "auto",
    with_stats: bool = False,
    background_rgba: jnp.ndarray = None,
    background_depth: jnp.ndarray = None,
) -> jnp.ndarray:
    """Render a splat scene.  Returns (H, W, 4) premultiplied RGBA.

    ``with_stats=True`` returns ``(image, RenderStats)`` instead — the
    overflow counters ride out of the jitted render as ordinary outputs, so
    hosts can warn on budget truncation even where host callbacks are
    unsupported (axon TPU backend, multi-process runs); pass them to
    :func:`gsplat_tpu.ops.binning.report_stats`.

    Compositing into a host scene (the reference's beauty-pass contract —
    splats drawn after all opaque geometry, z-tested against the scene's
    depth buffer but not z-written, ``src/GSplatRenderer.C:595-610``):

    * ``background_depth``: (H, W) view-space scene depth — per pixel,
      splat contributions behind it are killed before blending (enables
      ``config.depth_test``; incompatible with the packed payload, which
      has no view-z row slot);
    * ``background_rgba``: (H, W, 4) scene color the splat layer is
      under-composited over (works with or without the depth test).
    """
    if background_depth is not None and not config.depth_test:
        import dataclasses as _dc

        config = _dc.replace(config, depth_test=True)
    if config.depth_test and background_depth is None:
        raise ValueError("config.depth_test requires background_depth")
    if backend == "auto":
        backend = "pallas" if jax.default_backend() != "cpu" else "tiles"
    if backend == "pallas":
        out = render_pallas(
            splats, camera, config, with_stats=with_stats,
            bg_depth=background_depth,
        )
    elif backend == "pallas_interpret":
        out = render_pallas(
            splats, camera, config, interpret=True, with_stats=with_stats,
            bg_depth=background_depth,
        )
    elif backend == "tiles":
        out = render_tiles(
            splats, camera, config, with_stats=with_stats,
            bg_depth=background_depth,
        )
    elif backend == "reference":
        image = render_reference(
            splats, camera, config, bg_depth=background_depth
        )
        if with_stats:
            # the O(N·H·W) oracle composites every splat — nothing can drop
            out = (image, RenderStats(dropped_pairs=jnp.int32(0)))
        else:
            out = image
    else:
        raise ValueError(f"unknown backend {backend!r}")
    if background_rgba is not None:
        if with_stats:
            out = (composite_over(out[0], background_rgba), out[1])
        else:
            out = composite_over(out, background_rgba)
    return out
