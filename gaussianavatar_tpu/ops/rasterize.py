"""Public differentiable rasterization API (render one camera's image).

Replaces the reference's CUDA `GaussianRasterizer` call
(/root/reference/gaussian_renderer/__init__.py:36-48) with a TPU pipeline:
  project (jnp, autodiff) -> depth sort + tile binning (XLA sort/gather)
  -> per-tile alpha blending (Pallas kernel with custom VJP).

Backends:
  - "tile":  the fast tile-binned path (Pallas blend on TPU, jnp blend on CPU)
  - "brute": O(N*H*W) reference blender, exact semantics, for tests
  - "auto":  tile
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.projection import project_gaussians
from gaussianavatar_tpu.ops.rasterize_ref import rasterize_brute


class RasterizeConfig(NamedTuple):
    tile_size: int = 32
    tile_capacity: int = 512
    max_tiles_per_gaussian: int = 16
    backend: str = "auto"


def rasterize(
    means3d: jax.Array,
    colors: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    camera: Camera,
    bg_color: jax.Array,
    scale_modifier: float = 1.0,
    config: RasterizeConfig = RasterizeConfig(),
) -> jax.Array:
    """Render (3, H, W). All inputs are per-gaussian arrays (N, ...);
    `opacities` may be (N,) or (N, 1); colors are precomputed RGB in [0,1]
    (the reference always uses colors_precomp with sh_degree=0,
    avatar_model.py:347-364).
    """
    proj = project_gaussians(
        means3d, scales, rotations,
        camera.world_view_transform, camera.full_proj_transform,
        camera.tan_fovx, camera.tan_fovy, camera.height, camera.width,
        scale_modifier=scale_modifier,
    )
    backend = config.backend
    if backend == "auto":
        backend = "tile"
    if backend == "brute":
        return rasterize_brute(
            proj, colors, opacities, bg_color, camera.height, camera.width
        )
    from gaussianavatar_tpu.ops.rasterize_tile import rasterize_tiled

    return rasterize_tiled(
        proj, colors, opacities, bg_color, camera.height, camera.width, config
    )
