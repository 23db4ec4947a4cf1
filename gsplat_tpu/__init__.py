"""gsplat_tpu — a TPU-native differentiable 3D Gaussian-splat rendering framework.

Built from scratch in JAX/Pallas/pjit with the capabilities of the reference
Houdini HDK/GLSL viewport plugin (rubendhz/houdini-gsplat-renderer, mounted at
/root/reference): EWA-projected screen-space Gaussians, SH color (deg 0-3),
global depth sort, tile binning, front-to-back alpha compositing — plus the
training / distribution stack the reference lacks (autodiff to all splat
parameters, multi-host sharding, checkpointing).

See SURVEY.md for the structural analysis of the reference this was built to.
"""

from .version import __version__
from .models.camera import Camera, make_camera, look_at, perspective
from .models.splats import GaussianSplats, make_splats, random_splats
from .utils.config import RenderConfig
from .ops.projection import ProjectedSplats, project_splats
from .ops.rasterize_ref import render_reference
from .ops.rasterize_tiles import render_tiles
from .render import render, render_pallas

__all__ = [
    "render",
    "render_pallas",
    "render_tiles",
    "__version__",
    "Camera",
    "make_camera",
    "look_at",
    "perspective",
    "GaussianSplats",
    "make_splats",
    "random_splats",
    "RenderConfig",
    "ProjectedSplats",
    "project_splats",
    "render_reference",
]
