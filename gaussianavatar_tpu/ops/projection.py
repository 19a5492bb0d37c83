"""EWA projection of 3D Gaussians to screen space (pure JAX, differentiable).

Semantics match the CUDA `diff-gaussian-rasterization` preprocess stage that
the reference wraps (/root/reference/gaussian_renderer/__init__.py:6-50):
  - view/clip transforms use the reference's transposed row-vector convention
    (x_clip = [x,1] @ full_proj_transform),
  - frustum culling at view-space z <= 0.2,
  - 3D covariance R S S^T R^T from quaternion + per-axis scales,
  - EWA Jacobian with the 1.3*tan_fov clamp on view-space x/y,
  - +0.3 screen-space dilation on the 2D covariance diagonal,
  - radius = ceil(3 * sqrt(max eigenvalue))), NDC->pixel ((v+1)*S-1)/2.

Everything is branchless jnp so JAX autodiff provides the exact backward
through projection; the blend stage has its own custom VJP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianavatar_tpu.ops.rotations import quaternion_to_matrix


class ProjectedGaussians(NamedTuple):
    means2d: jax.Array   # (N, 2) pixel coords
    depths: jax.Array    # (N,) view-space z
    conics: jax.Array    # (N, 3) inverse 2D covariance (a, b, c) for ax^2+2bxy+cy^2
    radii: jax.Array     # (N,) float screen-space radius (<=0 means culled)


def compute_cov3d(scales: jax.Array, rotations: jax.Array, scale_modifier: float = 1.0) -> jax.Array:
    """(N,3) scales + (N,4) wxyz quats -> (N,3,3) covariance R S S^T R^T."""
    R = quaternion_to_matrix(rotations)
    S = scales * scale_modifier  # (N,3)
    M = R * S[..., None, :]  # columns scaled: R @ diag(S)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    world_view_transform: jax.Array,
    full_proj_transform: jax.Array,
    tan_fovx: jax.Array,
    tan_fovy: jax.Array,
    height: int,
    width: int,
    scale_modifier: float = 1.0,
) -> ProjectedGaussians:
    """Project N gaussians; culled gaussians get radius 0 (still static shape)."""
    f32 = means3d.dtype
    N = means3d.shape[0]
    ones = jnp.ones((N, 1), f32)
    p_hom4 = jnp.concatenate([means3d, ones], axis=-1)

    hi = jax.lax.Precision.HIGHEST  # positions must stay f32 on TPU
    p_view = jnp.matmul(p_hom4, world_view_transform, precision=hi)  # (N,4), row-vector convention
    depths = p_view[:, 2]

    p_clip = jnp.matmul(p_hom4, full_proj_transform, precision=hi)
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    p_proj = p_clip[:, :3] * p_w[:, None]

    in_frustum = depths > 0.2

    # EWA: view-space point with fov clamp
    tx, ty, tz = p_view[:, 0], p_view[:, 1], p_view[:, 2]
    tz_safe = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(tx / tz_safe, -limx, limx)
    tytz = jnp.clip(ty / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    # J rows (only first two matter for the 2x2 screen covariance)
    j00 = focal_x / tz_safe
    j02 = -(focal_x * tx) / (tz_safe * tz_safe)
    j11 = focal_y / tz_safe
    j12 = -(focal_y * ty) / (tz_safe * tz_safe)

    W = world_view_transform[:3, :3].T  # view rotation (maps world->view dirs)

    # cov2d = (J W RS)(J W RS)^T with RS = R diag(scales) — computed with
    # broadcasted elementwise math: batched (N,2,3)x(3,3) matmuls lower to
    # pathological tiny-dot loops on TPU (measured ~9ms for 125k gaussians vs
    # <1ms for this form).
    R = quaternion_to_matrix(rotations)                          # (N,3,3)
    RS = R * (scales * scale_modifier)[..., None, :]             # (N,3,3)
    # rows of M = J @ W: m0 = j00*W[0] + j02*W[2]; m1 = j11*W[1] + j12*W[2]
    m0 = j00[:, None] * W[0][None] + j02[:, None] * W[2][None]   # (N,3)
    m1 = j11[:, None] * W[1][None] + j12[:, None] * W[2][None]
    # B = M @ RS: B_i[j] = sum_k m_i[k] RS[k,j]
    B0 = jnp.sum(m0[:, :, None] * RS, axis=1)  # (N,3)
    B1 = jnp.sum(m1[:, :, None] * RS, axis=1)
    cxx = jnp.sum(B0 * B0, axis=-1) + 0.3
    cyy = jnp.sum(B1 * B1, axis=-1) + 0.3
    cxy = jnp.sum(B0 * B1, axis=-1)

    det = cxx * cyy - cxy * cxy
    det_valid = det > 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    mean_x = ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5
    mean_y = ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    valid = in_frustum & det_valid
    radii = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(means2d=means2d, depths=depths, conics=conics, radii=radii)
