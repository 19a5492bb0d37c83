"""Feature-map resampling ops.

`pop_upsample_matrix` reproduces the reference POP decoder's
`F.grid_sample(pix_feature, uv_to_grid(uv_loc))` bilinear upsampling
(/root/reference/model/network.py:65-67, modules.py:745-754) **exactly**,
including its quirks: the query grid positions are i/(R-1) over the full UV
image, mapped with align_corners=False pixel math (px = u*F - 0.5), with
zero padding outside — so border queries sample half-weight features. Because
the query set is a full regular grid, the gather collapses to two small dense
interpolation matrices applied as matmuls (MXU-friendly, no gather at all).

`grid_sample` is a general bilinear sampler matching
torch.nn.functional.grid_sample(align_corners=False, padding_mode='zeros')
for arbitrary query grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _interp_matrix(out_res: int, in_res: int) -> np.ndarray:
    """(out_res, in_res) bilinear weights for positions p_i = i/(out_res-1)*in_res - 0.5
    with zero padding outside [0, in_res-1]."""
    pos = np.arange(out_res) / (out_res - 1) * in_res - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = pos - lo
    W = np.zeros((out_res, in_res), np.float32)
    for side, wgt in ((lo, 1.0 - frac), (lo + 1, frac)):
        ok = (side >= 0) & (side < in_res)
        W[np.arange(out_res)[ok], side[ok]] += wgt[ok]
    return W


def pop_upsample(feat: jax.Array, out_res: int) -> jax.Array:
    """Bilinearly upsample (B, F, F, C) NHWC features to (B, R, R, C) with the
    reference POP grid_sample semantics (see module docstring)."""
    B, F, F2, C = feat.shape
    assert F == F2
    if F == out_res:
        return feat
    W = jnp.asarray(_interp_matrix(out_res, F))
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("rf,bfgc->brgc", W, feat, precision=hi)  # rows
    out = jnp.einsum("sg,brgc->brsc", W, out, precision=hi)   # cols
    return out


def grid_sample(feat: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sampling of NHWC `feat` (B, H, W, C) at `grid` (B, Ho, Wo, 2)
    normalized coords in [-1, 1] (grid[..., 0]=x, grid[..., 1]=y), matching
    torch grid_sample(align_corners=False, padding_mode='zeros')."""
    B, H, W, C = feat.shape
    gx = (grid[..., 0] + 1.0) * W / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * H / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0

    def gather(yi, xi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jax.vmap(lambda f, y, x: f[y, x])(feat, yi_c, xi_c)  # (B, Ho, Wo, C)
        return vals * ok[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
