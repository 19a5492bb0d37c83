"""SMPL-family body models as pure-JAX parameter pytrees + functions.

Capability parity with the reference's vendored smplx package
(/root/reference/submodules/smplx/body_models.py): SMPL (:43-393),
SMPL-X incl. expression blendshapes (:886-1292), plus the SMPLH (:396-638),
MANO (:1642-1843) and FLAME (:1846-2108) variants — all over the same
generic `lbs()` core, used with the avatar pipeline's settings
(avatar_model.py:47,57: use_pca=False, flat_hand_mean=True). Output
semantics match the local smplx modification: `forward` returns the
per-joint relative affines `A` with the global translation folded into
vertices, joints AND A[:, :, :3, 3] (body_models.py:380-383).

Design: a `BodyModel` NamedTuple of device arrays (a pytree — jit/vmap/shard
friendly); `forward` is a pure function; loaders read the official .pkl/.npz
model files on the host. No torch anywhere.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.models import keypoints
from gaussianavatar_tpu.ops.lbs import lbs

SMPL_NUM_JOINTS = 24
SMPLX_NUM_JOINTS = 55

# joints per model type at official scale (body_models.py NUM_BODY_JOINTS);
# informational — tiny synthetic models with other J are fully supported
NUM_JOINTS = {"smpl": 24, "smplh": 52, "smplx": 55, "mano": 16, "flame": 5}


class BodyModel(NamedTuple):
    """Parameter pytree for an SMPL-family body model."""

    v_template: jax.Array    # (V, 3)
    shapedirs: jax.Array     # (V, 3, n_betas)
    posedirs: jax.Array      # (9*(J-1), V*3)
    J_regressor: jax.Array   # (J, V)
    lbs_weights: jax.Array   # (V, J)
    parents: np.ndarray      # (J,) static int
    faces: np.ndarray        # (F, 3) static int
    model_type: str = "smpl"  # static
    # expression blendshapes (smplx/flame; reference body_models.py:1004-1017
    # slices them off shapedirs[..., 300:]); None for the other model types
    expr_dirs: Optional[jax.Array] = None  # (V, 3, n_expr)
    # vertex-anchored extra keypoints (reference VertexJointSelector); set by
    # the loaders for official-topology meshes, None for synthetic bodies
    extra_joint_ids: Optional[np.ndarray] = None  # (E,) static int


class BodyOutput(NamedTuple):
    vertices: jax.Array   # (B, V, 3)
    joints: jax.Array     # (B, J, 3); (B, J+E, 3) when the model carries
                          # extra_joint_ids (official meshes: +21 keypoints)
    A: jax.Array          # (B, J, 4, 4) relative affines (transl folded in)


def _to_np(x) -> np.ndarray:
    """Convert raw pickle entries (numpy, chumpy, scipy sparse) to ndarray."""
    if hasattr(x, "r"):  # chumpy
        return np.asarray(x.r, dtype=np.float64)
    if hasattr(x, "todense"):  # scipy sparse
        return np.asarray(x.todense(), dtype=np.float64)
    return np.asarray(x)


def _from_struct(
    data: dict, model_type: str, num_betas: int, num_expressions: int = 10
) -> BodyModel:
    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs_all = _to_np(data["shapedirs"]).astype(np.float32)
    shapedirs = shapedirs_all[:, :, :num_betas]
    # expression dirs (smplx/flame): files with the full 300+100 space store
    # them at columns [300:]; compact (<400-column) files at [10:20] with at
    # most 10 expression coefficients — regardless of num_betas
    # (reference body_models.py:1050-1067 SMPLX.__init__ does the same split)
    expr_dirs = None
    if model_type in ("smplx", "flame") and num_expressions > 0:
        if shapedirs_all.shape[-1] >= 400:
            start, n_expr = 300, num_expressions
        else:
            start, n_expr = 10, min(num_expressions, 10)
        if shapedirs_all.shape[-1] > start:
            expr_dirs = shapedirs_all[:, :, start : start + n_expr]
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    # official storage is (V, 3, P); flatten to (P, V*3) like smplx init
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    lbs_weights = _to_np(data["weights"]).astype(np.float32)
    faces = _to_np(data["f"]).astype(np.int64)
    J = J_regressor.shape[0]
    # official-topology meshes get the OpenPose extra-keypoint table
    # (reference body_models.py builds VertexJointSelector unconditionally;
    # synthetic/tiny meshes have no such table to index)
    extra_ids = None
    if keypoints.OFFICIAL_NUM_VERTS.get(model_type) == v_template.shape[0]:
        extra_ids = keypoints.extra_joint_ids(model_type)
    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs[: 9 * (J - 1)]),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents.astype(np.int32),
        faces=faces,
        model_type=model_type,
        expr_dirs=jnp.asarray(expr_dirs) if expr_dirs is not None else None,
        extra_joint_ids=extra_ids,
    )


def load_body_model(
    model_path: str,
    model_type: str = "smpl",
    gender: str = "neutral",
    num_betas: int = 10,
    num_expressions: int = 10,
) -> BodyModel:
    """Load an official SMPL-family (.pkl/.npz) model file: smpl, smplh,
    smplx, mano, flame.

    `model_path` may be the file itself or a directory containing
    `SMPL_{GENDER}.pkl` / `SMPLX_{GENDER}.npz` etc. (smplx layout; for mano,
    pass gender='right'/'left' to pick MANO_RIGHT/MANO_LEFT)."""
    path = model_path
    if os.path.isdir(path):
        candidates = [
            os.path.join(path, f"{model_type.upper()}_{gender.upper()}.pkl"),
            os.path.join(path, f"{model_type.upper()}_{gender.upper()}.npz"),
            os.path.join(path, f"basicmodel_{'m' if gender == 'male' else 'f' if gender == 'female' else 'neutral'}_lbs_10_207_0_v1.0.0.pkl"),
        ]
        if model_type == "mano":
            candidates += [os.path.join(path, "MANO_RIGHT.pkl"), os.path.join(path, "MANO_LEFT.pkl")]
        for c in candidates:
            if os.path.exists(c):
                path = c
                break
        else:
            raise FileNotFoundError(f"no {model_type} model for gender={gender} in {model_path}")

    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    return _from_struct(data, model_type, num_betas, num_expressions)


def create(model_path: str, model_type: str = "smpl", gender: str = "neutral", **kwargs) -> BodyModel:
    """smplx.create-style factory (reference body_models.py:2337-2415 shape)."""
    return load_body_model(model_path, model_type=model_type, gender=gender, **kwargs)


def forward(
    model: BodyModel,
    betas: jax.Array,                       # (B, n_betas)
    global_orient: jax.Array,               # (B, 3)
    body_pose: jax.Array,                   # (B, 63|69) axis-angle; (B, 45) hand pose for mano
    transl: Optional[jax.Array] = None,     # (B, 3)
    jaw_pose: Optional[jax.Array] = None,   # (B, 3) smplx/flame
    leye_pose: Optional[jax.Array] = None,
    reye_pose: Optional[jax.Array] = None,
    left_hand_pose: Optional[jax.Array] = None,   # (B, 45) smplx/smplh, use_pca=False
    right_hand_pose: Optional[jax.Array] = None,
    expression: Optional[jax.Array] = None,       # (B, n_expr) smplx/flame
    neck_pose: Optional[jax.Array] = None,        # (B, 3) flame
) -> BodyOutput:
    """Pose the body. Full-pose assembly per model type (matching the
    reference's forward() concatenations, flat_hand_mean=True semantics —
    hand poses used as-is):
      smpl:  [global(3), body(69)]
      smplh: [global(3), body(63), lhand(45), rhand(45)]
      smplx: [global(3), body(63), jaw(3), leye(3), reye(3), lhand(45), rhand(45)]
      mano:  [global(3), hand(45)]   (pass the hand pose as `body_pose`)
      flame: [global(3), neck(3), jaw(3), leye(3), reye(3)]  (`body_pose` unused)
    `expression` adds the expression blendshapes (smplx body_models.py:1197:
    shape_components = cat([betas, expression]))."""
    B = (body_pose if body_pose is not None else global_orient).shape[0]
    J = model.parents.shape[0]

    z3 = jnp.zeros((B, 3), global_orient.dtype)
    z45 = jnp.zeros((B, 45), global_orient.dtype)
    if model.model_type == "smplx":
        parts = [
            global_orient,
            body_pose,
            jaw_pose if jaw_pose is not None else z3,
            leye_pose if leye_pose is not None else z3,
            reye_pose if reye_pose is not None else z3,
            left_hand_pose if left_hand_pose is not None else z45,
            right_hand_pose if right_hand_pose is not None else z45,
        ]
        full_pose = jnp.concatenate(parts, axis=1)
    elif model.model_type == "smplh":
        parts = [
            global_orient,
            body_pose,
            left_hand_pose if left_hand_pose is not None else z45,
            right_hand_pose if right_hand_pose is not None else z45,
        ]
        full_pose = jnp.concatenate(parts, axis=1)
    elif model.model_type == "mano":
        hand = body_pose if body_pose is not None else (
            right_hand_pose if right_hand_pose is not None else left_hand_pose
        )
        full_pose = jnp.concatenate([global_orient, hand if hand is not None else z45], axis=1)
    elif model.model_type == "flame":
        parts = [
            global_orient,
            neck_pose if neck_pose is not None else z3,
            jaw_pose if jaw_pose is not None else z3,
            leye_pose if leye_pose is not None else z3,
            reye_pose if reye_pose is not None else z3,
        ]
        full_pose = jnp.concatenate(parts, axis=1)
    else:
        full_pose = jnp.concatenate([global_orient, body_pose], axis=1)

    assert full_pose.shape[1] == J * 3, (full_pose.shape, J)

    shapedirs = model.shapedirs
    shape_components = betas
    if expression is not None:
        if model.expr_dirs is None:
            raise ValueError(f"{model.model_type} model has no expression blendshapes loaded")
        shapedirs = jnp.concatenate([model.shapedirs, model.expr_dirs], axis=-1)
        shape_components = jnp.concatenate([betas, expression], axis=-1)

    verts, joints, A = lbs(
        shape_components,
        full_pose,
        model.v_template,
        shapedirs,
        model.posedirs,
        model.J_regressor,
        model.parents,
        model.lbs_weights,
    )
    if model.extra_joint_ids is not None:
        # append the vertex-anchored OpenPose keypoints (reference SMPL.forward
        # runs VertexJointSelector on every call: body_models.py:365)
        joints = keypoints.select_extra_joints(verts, joints, model.extra_joint_ids)
    if transl is not None:
        t = transl[:, None, :]
        verts = verts + t
        joints = joints + t
        A = A.at[:, :, :3, 3].add(t)
    return BodyOutput(vertices=verts, joints=joints, A=A)
