"""Rotation representation conversions (pure JAX).

Behavioral parity targets (see SURVEY.md):
  - axis-angle -> matrix matches the reference Rodrigues formula
    (/root/reference/submodules/smplx/lbs.py:299-333), including its
    `norm(vec + 1e-8)` regularization so LBS outputs agree bit-for-bit
    within float tolerance.
  - euler/axis-angle helpers replace the reference's pytorch3d.transforms
    usage for the canonical pose constants
    (/root/reference/arguments/__init__.py:44-53).
All functions broadcast over leading batch dimensions and are jit/vmap/grad
safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_angle_to_matrix(rot_vecs: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Matches the reference smplx `batch_rodrigues`: the angle is computed as
    ||v + eps|| (a componentwise shift, not a norm clamp), which keeps the
    gradient finite at v = 0.
    """
    batch_shape = rot_vecs.shape[:-1]
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(batch_shape + (3, 3))

    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    return ident + sin * K + (1.0 - cos) * KK


def matrix_to_axis_angle(R: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle."""
    # Quaternion route is numerically stable near 0 and pi.
    q = matrix_to_quaternion(R)
    return quaternion_to_axis_angle(q, eps=eps)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion (need not be normalized) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    batch_shape = q.shape[:-1]
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(batch_shape + (3, 3))


def matrix_to_quaternion(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz unit quaternion (w >= 0 branchlessly chosen)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidate constructions; pick the numerically best (largest pivot).
    qw = jnp.sqrt(jnp.clip(1.0 + m00 + m11 + m22, 0.0, None)) / 2.0
    qx = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 0.0, None)) / 2.0
    qy = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 0.0, None)) / 2.0
    qz = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 0.0, None)) / 2.0

    c0 = jnp.stack([qw, (m21 - m12) / (4 * qw + 1e-12), (m02 - m20) / (4 * qw + 1e-12), (m10 - m01) / (4 * qw + 1e-12)], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * qx + 1e-12), qx, (m01 + m10) / (4 * qx + 1e-12), (m02 + m20) / (4 * qx + 1e-12)], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * qy + 1e-12), (m01 + m10) / (4 * qy + 1e-12), qy, (m12 + m21) / (4 * qy + 1e-12)], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * qz + 1e-12), (m02 + m20) / (4 * qz + 1e-12), (m12 + m21) / (4 * qz + 1e-12), qz], axis=-1)

    mags = jnp.stack([qw, qx, qy, qz], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_axis_angle(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 4) wxyz unit quaternion -> (..., 3) axis-angle."""
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half < eps, 2.0, angle / jnp.maximum(sin_half, eps))
    return xyz * scale


def euler_angles_to_matrix(angles: jax.Array, convention: str = "XYZ") -> jax.Array:
    """(..., 3) euler angles -> (..., 3, 3), matching pytorch3d's convention
    (intrinsic rotations, R = R_first @ R_second @ R_third).
    """

    def _axis_rot(axis: str, a: jax.Array) -> jax.Array:
        c, s = jnp.cos(a), jnp.sin(a)
        one, zero = jnp.ones_like(a), jnp.zeros_like(a)
        if axis == "X":
            flat = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            flat = [c, zero, s, zero, one, zero, -s, zero, c]
        else:
            flat = [c, -s, zero, s, c, zero, zero, zero, one]
        return jnp.stack(flat, axis=-1).reshape(a.shape + (3, 3))

    mats = [_axis_rot(ax, angles[..., i]) for i, ax in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis` (torch.nn.functional.normalize semantics)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)
