from gsvc_tpu.render.splat import (
    RasterSettings,
    project_gaussians,
    rasterize,
)

__all__ = ["RasterSettings", "project_gaussians", "rasterize"]
