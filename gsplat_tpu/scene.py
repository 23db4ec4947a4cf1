"""Scene registry: multi-cluster aggregation + frame lifecycle.

TPU-native re-design of the reference's global renderer singleton
(``gsplat_plugin/include/GSplatRenderer.h:23-131``,
``src/GSplatRenderer.C``).  The reference wires Houdini's draw loop to a
process-wide registry; here the registry is an explicit host-side session
object around the pure jitted render functions, reproducing the same
semantics:

* **registry of clusters** keyed by (cluster id, version); registering a new
  version flushes stale versions of the same id
  (``registerUpdate``/``flushEntriesForMatchingDetail``,
  ``src/GSplatRenderer.C:218-311``);
* **per-frame active set**: clusters are drawn only if included this frame
  (``includeInRenderPass`` ``:313-320``), and ``post_render`` ages entries —
  an entry not included for ``max_age`` frames is evicted (``:660-678``);
* **global budget**: at most ``config.max_splats`` (2^23 in the reference,
  ``include/GSplatRenderer.h:26``) splats are drawn; excess clusters are
  culled with a one-time warning (``:336-376``);
* **shared origin**: concatenated positions are re-based to the mean of the
  cluster barycenters for float precision (``:403-418``), with the camera
  translated to match — same math, no precision loss in world-scale scenes;
* **amortized sort**: the global depth order is cached and recomputed only
  when geometry changed or the camera has accumulated enough squared
  movement (``checkSignificantDelta``/``argsortByDistance`` ``:165-216``;
  threshold 0 → re-sort on any movement);
* **runtime config via setters**: explicit camera position override
  (consumed each frame, cleared in ``post_render`` — ``:551-563``, ``:677``)
  and SH order (clamped with a one-time error — ``src/GR_GSplat.C:444-457``).

The geometry concat recompiles the render when the active-set shapes change
— the analogue of the reference regenerating its packed textures
(``generateRenderGeometry`` ``:322-532``); steady-state frames reuse the
compiled executable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.camera import Camera
from .models.splats import GaussianSplats
from .ops.rasterize_tiles import depth_order
from .render import render as _render
from .utils.config import RenderConfig
from .utils.logging import format_count, get_logger

log = get_logger("scene")


@dataclasses.dataclass
class _Entry:
    splats: GaussianSplats
    version: int
    active: bool = False
    age: int = 0


class SceneRegistry:
    """Aggregates splat clusters and renders them in one globally-sorted pass."""

    def __init__(self, config: RenderConfig = RenderConfig(), max_age: int = 2):
        self.config = config
        self.max_age = max_age
        self._entries: Dict[str, _Entry] = {}
        self._generation = 0          # bumped on any registry change
        self._built_generation = -1   # generation of the cached concat
        self._built_active: tuple = ()
        self._cached: Optional[GaussianSplats] = None
        self._origin: Optional[jnp.ndarray] = None
        self._order: Optional[jnp.ndarray] = None
        self._last_sort_campos: Optional[np.ndarray] = None
        self._accum_delta_sq = 0.0
        self.sort_movement_threshold = 0.0  # reference default: any movement
        self._explicit_camera_pos: Optional[np.ndarray] = None
        self._sh_order: Optional[int] = None
        self._last_stats = None  # previous frame's RenderStats (deferred read)

    # ------------------------------------------------------------------ API
    def register_update(self, key: str, splats: GaussianSplats, version: int = 0) -> str:
        """Register (or update) a cluster.  Newer versions flush older
        versions of the same key (``flushEntriesForMatchingDetail``)."""
        registry_id = f"{key}__{version}"
        stale = [
            rid
            for rid, e in self._entries.items()
            if rid.startswith(f"{key}__") and e.version != version
        ]
        for rid in stale:
            del self._entries[rid]
        self._entries[registry_id] = _Entry(splats=splats.validate(), version=version)
        self._generation += 1
        return registry_id

    def flush(self, key: str) -> None:
        """Remove all versions of a cluster (the reference's destructor path,
        ``src/GR_GSplat.C:63-70``)."""
        for rid in [r for r in self._entries if r.startswith(f"{key}__")]:
            del self._entries[rid]
        self._generation += 1

    def include_in_render_pass(self, registry_id: str) -> None:
        entry = self._entries.get(registry_id)
        if entry is not None:
            entry.active = True
            entry.age = 0

    def set_explicit_camera_pos(self, pos) -> None:
        """Override the camera position used for sorting + SH this frame
        (``gsplat__explicit_camera_pos``)."""
        self._explicit_camera_pos = None if pos is None else np.asarray(pos, np.float32)

    def set_sh_order(self, order: int) -> None:
        if not 0 <= order <= 3:
            log.error_once(
                f"sh order {order} out of range [0,3] — disabling SH", key="sh_order"
            )
            order = 0
        else:
            log.reset_once("sh_order")
        self._sh_order = order

    @property
    def total_active_splats(self) -> int:
        return sum(e.splats.count for e in self._entries.values() if e.active)

    # ------------------------------------------------------- frame pipeline
    def generate_render_geometry(self) -> bool:
        """Concat active clusters (budget-culled) into the cached scene.

        Returns True if geometry was (re)built, False if cached (the
        reference's ``isRenderStateRegistryCurrent`` fast path)."""
        active = tuple(
            sorted(rid for rid, e in self._entries.items() if e.active)
        )
        if (
            self._built_generation == self._generation
            and self._built_active == active
            and self._cached is not None
        ):
            return False
        if not active:
            self._cached = None
            self._origin = None
            self._order = None
            self._built_generation = self._generation
            self._built_active = active
            return True

        budget = self.config.max_splats
        chosen = []
        total = 0
        culled = 0
        for rid in active:
            e = self._entries[rid]
            if total + e.splats.count <= budget:
                chosen.append(e.splats)
                total += e.splats.count
            elif total < budget:
                # Partial-cluster clamp: the reference still draws the first
                # budget − total splats of the cluster that crosses the cap
                # (myGSplatCount = min(total, GSplatCountMax),
                # src/GSplatRenderer.C:364-366) — only the excess is culled.
                head = budget - total
                chosen.append(e.splats.head(head))
                total = budget
                culled += e.splats.count - head
            else:
                culled += e.splats.count
        if culled:
            log.warning_once(
                f"splat budget {format_count(budget)} exceeded — culling "
                f"{format_count(culled)} splats",
                key="budget",
            )
        else:
            log.reset_once("budget")

        scene = chosen[0]
        for other in chosen[1:]:
            scene = scene.concat(other)
        # shared origin = mean of cluster barycenters (:403-418)
        barys = jnp.stack([s.barycenter() for s in chosen])
        origin = jnp.mean(barys, axis=0)
        self._cached = dataclasses.replace(scene, pos=scene.pos - origin[:, None])
        self._origin = origin
        self._order = None  # geometry fresh → must re-sort (:179-186)
        self._built_generation = self._generation
        self._built_active = active
        return True

    def _origin_camera(self, camera: Camera) -> Camera:
        """Translate the camera into origin-relative coordinates (same math
        as the reference's GSplatOrigin uniform, better fp32 precision)."""
        origin = self._origin
        view = jnp.asarray(camera.view)
        new_view = view.at[:3, 3].set(view[:3, :3] @ origin + view[:3, 3])
        explicit = camera.explicit_camera_pos
        if self._explicit_camera_pos is not None:
            explicit = jnp.asarray(self._explicit_camera_pos) - origin
        else:
            explicit = jnp.where(
                jnp.all(~jnp.isnan(explicit)), explicit - origin, explicit
            )
        return dataclasses.replace(camera, view=new_view, explicit_camera_pos=explicit)

    def render(self, camera: Camera, backend: str = "auto") -> Optional[jnp.ndarray]:
        """Render all active clusters.  Returns (H, W, 4) or None if empty.

        Overflow reporting: every render carries the binning overflow
        counters out as jit outputs (works on backends without host
        callbacks, e.g. the axon TPU tunnel).  To avoid a device sync per
        frame, the PREVIOUS frame's counters are read and reported at the
        start of the next render — by then they have long materialized.
        """
        from .ops.binning import report_stats

        if self._last_stats is not None:
            report_stats(self._last_stats, self.config)
            self._last_stats = None
        self.generate_render_geometry()
        if self._cached is None:
            return None
        cfg = self.config
        if self._sh_order is not None and self._sh_order != cfg.sh_order:
            cfg = dataclasses.replace(cfg, sh_order=self._sh_order)
        cam = self._origin_camera(camera)

        # amortized re-sort (:165-216): re-sort when geometry is fresh or the
        # camera accumulated enough squared movement since the last sort.
        campos = np.asarray(cam.position)
        if self._order is None or self._last_sort_campos is None:
            need_sort = True
        else:
            self._accum_delta_sq += float(
                np.sum((campos - self._last_sort_campos) ** 2)
            )
            need_sort = self._accum_delta_sq > self.sort_movement_threshold
        if need_sort:
            self._order = depth_order(self._cached, cam)
            self._last_sort_campos = campos
            self._accum_delta_sq = 0.0

        if backend in ("tiles", "auto") and jax.default_backend() == "cpu":
            from .ops.rasterize_tiles import render_tiles

            img, self._last_stats = render_tiles(
                self._cached, cam, cfg, order=self._order, with_stats=True
            )
            return img
        if backend in ("pallas", "auto"):
            from .render import render_pallas

            img, self._last_stats = render_pallas(
                self._cached, cam, cfg, order=self._order, with_stats=True
            )
            return img
        img, self._last_stats = _render(
            self._cached, cam, cfg, backend=backend, with_stats=True
        )
        return img

    def post_render(self) -> None:
        """Age + deactivate entries; clear the explicit camera (:660-678)."""
        evict = []
        for rid, e in self._entries.items():
            if not e.active:
                e.age += 1
                if e.age > self.max_age:
                    evict.append(rid)
            e.active = False
        for rid in evict:
            del self._entries[rid]
        if evict:
            self._generation += 1
        self._explicit_camera_pos = None
