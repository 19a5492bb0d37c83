"""Vertex-anchored extra keypoints for SMPL-family models.

TPU-native equivalent of the reference's VertexJointSelector
(/root/reference/submodules/smplx/vertex_joint_selector.py:29-77) and its
static tables (vertex_ids.py, joint_names.py): a handful of mesh vertices
(nose/eyes/ears, toe/heel, fingertips) are appended to the regressed joints
so the output covers the OpenPose/MSCOCO keypoint set. The vertex indices
are facts about the official mesh topologies (data, not code).

Pure functions over static numpy index tables — the gather is a single
`jnp.take` that fuses into the surrounding jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# vertex index -> keypoint tables for the official topologies
# (SMPL and SMPL-H share the 6890-vertex mesh, so 'smpl' aliases 'smplh')
VERTEX_IDS = {
    "smplh": {
        "nose": 332, "reye": 6260, "leye": 2800, "rear": 4071, "lear": 583,
        "rthumb": 6191, "rindex": 5782, "rmiddle": 5905, "rring": 6016,
        "rpinky": 6133, "lthumb": 2746, "lindex": 2319, "lmiddle": 2445,
        "lring": 2556, "lpinky": 2673,
        "LBigToe": 3216, "LSmallToe": 3226, "LHeel": 3387,
        "RBigToe": 6617, "RSmallToe": 6624, "RHeel": 6787,
    },
    "smplx": {
        "nose": 9120, "reye": 9929, "leye": 9448, "rear": 616, "lear": 6,
        "rthumb": 8079, "rindex": 7669, "rmiddle": 7794, "rring": 7905,
        "rpinky": 8022, "lthumb": 5361, "lindex": 4933, "lmiddle": 5058,
        "lring": 5169, "lpinky": 5286,
        "LBigToe": 5770, "LSmallToe": 5780, "LHeel": 8846,
        "RBigToe": 8463, "RSmallToe": 8474, "RHeel": 8635,
    },
    "mano": {
        "thumb": 744, "index": 320, "middle": 443, "ring": 554, "pinky": 671,
    },
}
VERTEX_IDS["smpl"] = VERTEX_IDS["smplh"]

# official vertex counts, used by the loaders to decide whether a model file
# has the topology these tables index into
OFFICIAL_NUM_VERTS = {"smpl": 6890, "smplh": 6890, "smplx": 10475, "mano": 778}

_FACE_KEYS = ["nose", "reye", "leye", "rear", "lear"]
_FEET_KEYS = ["LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel"]
_TIP_KEYS = ["thumb", "index", "middle", "ring", "pinky"]

# names of the appended keypoints, in the exact order extra_joint_ids emits
# them (reference joint_names.py tail: face, feet, then l/r fingertips)
EXTRA_JOINT_NAMES = (
    _FACE_KEYS
    + _FEET_KEYS
    + ["l" + t for t in _TIP_KEYS]
    + ["r" + t for t in _TIP_KEYS]
)

SMPL_JOINT_NAMES = [
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot",
    "right_foot", "neck", "left_collar", "right_collar", "head",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hand", "right_hand",
]

SMPLX_JOINT_NAMES = SMPL_JOINT_NAMES[:22] + [
    "jaw", "left_eye_smplhf", "right_eye_smplhf",
] + [
    f"{side}_{finger}{k}"
    for side in ("left", "right")
    for finger in ("index", "middle", "pinky", "ring", "thumb")
    for k in ("1", "2", "3")
]  # 22 body + 3 head + 30 hand = 55


def extra_joint_ids(
    model_type: str, use_hands: bool = True, use_feet_keypoints: bool = True
) -> np.ndarray:
    """Static vertex-index table, reference VertexJointSelector.__init__
    semantics: face keypoints, then feet, then l/r fingertips."""
    table = VERTEX_IDS[model_type]
    if model_type == "mano":
        return np.array([table[k] for k in _TIP_KEYS], dtype=np.int32)
    idxs = [table[k] for k in _FACE_KEYS]
    if use_feet_keypoints:
        idxs += [table[k] for k in _FEET_KEYS]
    if use_hands:
        idxs += [table[h + t] for h in ("l", "r") for t in _TIP_KEYS]
    return np.array(idxs, dtype=np.int32)


def select_extra_joints(
    vertices: jax.Array,  # (B, V, 3)
    joints: jax.Array,    # (B, J, 3)
    ids: np.ndarray,      # (E,) static vertex indices
) -> jax.Array:
    """Append vertex-anchored keypoints to the regressed joints ->
    (B, J+E, 3) (reference vertex_joint_selector.py:73-77)."""
    extra = jnp.take(vertices, jnp.asarray(ids), axis=1)
    return jnp.concatenate([joints, extra], axis=1)
