"""Linear blend skinning (pure JAX, jit/vmap/grad-safe).

Behavioral parity with the reference's vendored smplx LBS
(/root/reference/submodules/smplx/lbs.py:152-252,349-405), including the local
modification that surfaces the per-joint relative affine matrices `A` used to
re-skin the avatar's canonical Gaussians.

TPU-first notes: the kinematic chain is composed with a statically unrolled
sequence of batched 4x4 matmuls over the topologically-sorted `parents` array
(24 joints for SMPL, 55 for SMPL-X) — the chain is tiny, so unrolling beats a
`lax.scan` (no loop-carried dynamic slicing, XLA fuses the whole chain); the
heavy work (blendshape einsums, the (V,J)x(J,16) skinning matmul) is left to
the MXU as large matmuls.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.ops.rotations import axis_angle_to_matrix


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """(B, num_betas) x (V, 3, num_betas) -> (B, V, 3) per-vertex displacement."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps, precision=jax.lax.Precision.HIGHEST)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J, V) x (B, V, 3) -> (B, J, 3) joint locations."""
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor, precision=jax.lax.Precision.HIGHEST)


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents: np.ndarray
) -> Tuple[jax.Array, jax.Array]:
    """Compose the kinematic chain.

    Args:
      rot_mats: (B, J, 3, 3) per-joint local rotations.
      joints: (B, J, 3) rest-pose joint locations.
      parents: static (J,) int array; parents[0] is the root; topologically
        sorted (parents[i] < i).

    Returns:
      posed_joints: (B, J, 3)
      rel_transforms: (B, J, 4, 4) world transforms with the rest-pose joint
        location subtracted (the `A` matrices used for skinning).
    """
    parents = np.asarray(parents)
    J = parents.shape[0]

    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, parents[1:]]], axis=1
    )

    # (B, J, 4, 4) local transforms
    T_local = jnp.zeros(rot_mats.shape[:2] + (4, 4), dtype=rot_mats.dtype)
    T_local = T_local.at[..., :3, :3].set(rot_mats)
    T_local = T_local.at[..., :3, 3].set(rel_joints)
    T_local = T_local.at[..., 3, 3].set(1.0)

    # Statically unrolled chain: world[i] = world[parents[i]] @ local[i].
    # 4x4 matmuls are tiny — pin full f32 precision (TPU default is bf16).
    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    chain = [T_local[:, 0]]
    for i in range(1, J):
        chain.append(mm(chain[parents[i]], T_local[:, i]))
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[..., :3, 3]

    # A = T - [0 | T @ [j;0]]: subtract the transform applied to the rest joint
    # so A maps rest-space points directly (reference lbs.py:400-403).
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    shifted = jnp.einsum("bjxy,bjy->bjx", transforms, joints_h)
    rel_transforms = transforms.at[..., :, 3].add(-shifted)
    # note: the above subtracts from the full last column including row 3;
    # shifted[...,3] is 0 because joints_h has w=0, so row 3 is untouched.
    return posed_joints, rel_transforms


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    J_regressor: jax.Array,
    parents: np.ndarray,
    lbs_weights: jax.Array,
    pose2rot: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full SMPL-family linear blend skinning.

    Args mirror reference lbs.py:152-252. `pose` is (B, (J)*3) axis-angle when
    pose2rot else (B, J, 3, 3) rotation matrices.

    Returns:
      verts: (B, V, 3); joints: (B, J, 3); A: (B, J, 4, 4) relative affines.
    """
    B = max(betas.shape[0], pose.shape[0])
    J = np.asarray(parents).shape[0]

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(J_regressor, v_shaped)

    ident = jnp.eye(3, dtype=v_shaped.dtype)
    if pose2rot:
        rot_mats = axis_angle_to_matrix(pose.reshape(B, J, 3))
    else:
        rot_mats = pose.reshape(B, J, 3, 3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    # (B, 9(J-1)) @ (9(J-1), V*3) -> (B, V, 3)
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)

    v_posed = v_shaped + pose_offsets
    posed_joints, A = batch_rigid_transform(rot_mats, joints, parents)

    # skinning: T = W @ A  — a (V, J) x (J, 16) matmul per batch item (MXU).
    # Geometry einsums stay f32 (HIGHEST): bf16 default costs ~0.2% position
    # error (≈1px at 512²), and these are a negligible FLOP fraction.
    hi = jax.lax.Precision.HIGHEST
    T = jnp.einsum("vj,bjpq->bvpq", lbs_weights, A, precision=hi)
    verts = (
        jnp.einsum("bvxy,bvy->bvx", T[..., :3, :3], v_posed, precision=hi)
        + T[..., :3, 3]
    )
    return verts, posed_joints, A
