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
    # two-tier capacity: when > 0, the `heavy_fraction` busiest tiles blend a
    # second depth segment [tile_capacity, tile_capacity + tile_capacity_hi)
    # — full coverage of dense tiles without paying their capacity everywhere
    tile_capacity_hi: int = 0
    heavy_fraction: float = 0.25
    # general capacity cascade: ((cap, fraction), ...) with fraction the share
    # of busiest tiles blending that extra depth segment; overrides the
    # two-tier fields when non-empty, e.g. ((256, 1.0), (512, .25), (512, .0625))
    tiers: tuple = ()
    # accumulator dtype of the Pallas forward blend ("float32"/"bfloat16").
    # bf16 accumulation was measured and REJECTED for the default (see
    # BASELINE.md round-2 bf16 experiment); the knob remains for study.
    blend_acc_dtype: str = "float32"
    # binning sort stability. True: equal (tile, depth-quantile) keys blend
    # in gaussian-index order (CUDA 64-bit-radix parity). False: ~35% faster
    # sort (measured v5e, 4.1M keys: 5.8 vs 9.2 ms); ties blend in a
    # deterministic-but-arbitrary order fixed by the sort network. Only
    # near-coincident surfaces are affected — use for inference/render.
    sort_stable: bool = True
    # gather the per-tile parameter slabs as 16-element contiguous slices
    # from the dense 1-D view of the packed table instead of lane-padded
    # (B*N, 16) rows. Bit-exact, 1/8 the HBM bytes — and REJECTED as a
    # default: measured 17x slower (XLA TPU serializes the 1-D sliced
    # gather; see rasterize_tile._gather_tile_params / BASELINE.md)
    gather_flat: bool = False
    gather_window: bool = False
    # ragged slot-stream blending (ops/rasterize_ragged): per-tile
    # DATA-DEPENDENT capacities under one static chunk budget, replacing the
    # capacity-tier approximation entirely — no tier quantization, no
    # count-rank order premium, no base-tier cost on empty tiles
    ragged: bool = False
    ragged_chunk: int = 128  # rows per Pallas grid step
    # static budget as average rows per tile (cascade-cost scale);
    # 0 = worst case (every binned pair fits)
    ragged_budget: int = 0
    # row-vectorized blend kernels (ops/blend_vec): whole 128-row chunks per
    # step with the transmittance chain as a log2-step scan. Same gating
    # semantics as the sequential kernels; float-tolerance, not bit-exact.
    # NOTE: False here is the library-level CUDA-parity bit-exactness
    # default (direct RasterizeConfig constructions — tests, parity locks);
    # the CLI layer (config.RasterParams.blend_vec = 1, engine/loop.
    # raster_config) flips production runs to the vectorized kernels,
    # campaign-gated in BASELINE.md round 4
    blend_vec: bool = False


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
    shs: Optional[jax.Array] = None,
    sh_degree: int = 0,
) -> jax.Array:
    """Render (3, H, W). All inputs are per-gaussian arrays (N, ...);
    `opacities` may be (N,) or (N, 1). `colors` are precomputed RGB in [0,1]
    (the reference always uses colors_precomp with sh_degree=0,
    avatar_model.py:347-364); pass `shs` ((N, (deg+1)^2, 3)) instead for
    view-dependent SH colors — full CUDA-rasterizer API parity.
    """
    if shs is not None:
        from gaussianavatar_tpu.ops.sh import sh_to_colors

        colors = sh_to_colors(sh_degree, shs, means3d, camera.camera_center)
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


def rasterize_views(
    means3d: jax.Array,                 # (B, N, 3)
    colors: jax.Array,                  # (B, N, 3)
    scales: jax.Array,                  # (B, N, 3)
    rotations: jax.Array,               # (N, 4) shared or (B, N, 4)
    opacities: jax.Array,               # (N,) shared or (B, N)
    world_view_transforms: jax.Array,   # (B, 4, 4)
    full_proj_transforms: jax.Array,    # (B, 4, 4)
    tan_fovx: jax.Array,                # (B,)
    tan_fovy: jax.Array,                # (B,)
    height: int,
    width: int,
    bg_color: jax.Array,                # (3,)
    scale_modifier: float = 1.0,
    config: RasterizeConfig = RasterizeConfig(),
    return_overflow: bool = False,
    caps: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched rendering -> (B, 3, H, W), or ((B, 3, H, W), overflow) with
    `return_overflow` (overflow = gaussian-tile pairs dropped by the capacity
    caps; the CUDA original is uncapped, so 0 means CUDA-exact coverage).
    Projection/binning vmap as XLA; the Pallas blend launches once with the
    batch folded into its tile grid (replacing the reference's per-item
    Python render loop, avatar_model.py:332-365).

    `caps` (ragged backend only): (B*T,) int32 per-tile blend capacities,
    e.g. probe-measured needed depths — see rasterize_ragged."""
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_tile import rasterize_views_binned

    B, N = means3d.shape[:2]
    if rotations.ndim == 2:
        rotations = jnp.broadcast_to(rotations[None], (B,) + rotations.shape)
    opacities = opacities.reshape((-1, N)) if opacities.ndim > 1 else opacities
    if opacities.ndim == 1:
        opacities = jnp.broadcast_to(opacities[None], (B, N))
    elif opacities.shape[0] != B:
        opacities = jnp.broadcast_to(opacities.reshape(1, N), (B, N))

    projs = jax.vmap(
        lambda m, s, r, wvt, fpt, tx, ty: project_gaussians(
            m, s, r, wvt, fpt, tx, ty, height, width, scale_modifier=scale_modifier
        )
    )(means3d, scales, rotations, world_view_transforms, full_proj_transforms, tan_fovx, tan_fovy)

    if config.backend == "brute":
        imgs = []
        for b in range(B):
            pr = type(projs)(*(x[b] for x in projs))
            imgs.append(rasterize_brute(pr, colors[b], opacities[b], bg_color, height, width))
        stacked = jnp.stack(imgs)
        return (stacked, jnp.int32(0)) if return_overflow else stacked

    img, overflow = rasterize_views_binned(
        projs, colors, opacities, bg_color, height, width, config, caps=caps
    )
    return (img, overflow) if return_overflow else img
