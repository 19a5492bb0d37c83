import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from gaussianavatar_tpu.ops.lbs import batch_rigid_transform, blend_shapes, lbs, vertices2joints
from gaussianavatar_tpu.ops.rotations import axis_angle_to_matrix


def make_toy_model(rng, V=40, J=4, nb=3):
    """A tiny synthetic SMPL-like model: a chain of J joints along +y."""
    v_template = rng.normal(size=(V, 3)).astype(np.float32) * 0.1
    v_template[:, 1] += np.repeat(np.arange(V) % J, 1) * 0.5  # spread along chain
    shapedirs = rng.normal(size=(V, 3, nb)).astype(np.float32) * 0.01
    posedirs = rng.normal(size=(9 * (J - 1), V * 3)).astype(np.float32) * 0.001
    # joint regressor: joint j = mean of verts with (i % J == j)
    J_regressor = np.zeros((J, V), np.float32)
    for j in range(J):
        sel = np.arange(V) % J == j
        J_regressor[j, sel] = 1.0 / sel.sum()
    parents = np.array([-1, 0, 1, 2])
    w = rng.uniform(size=(V, J)).astype(np.float32)
    lbs_weights = w / w.sum(-1, keepdims=True)
    return dict(
        v_template=v_template, shapedirs=shapedirs, posedirs=posedirs,
        J_regressor=J_regressor, parents=parents, lbs_weights=lbs_weights,
    )


def test_zero_pose_is_rest():
    rng = np.random.default_rng(0)
    m = make_toy_model(rng)
    betas = jnp.zeros((2, 3))
    pose = jnp.zeros((2, 12))
    verts, joints, A = lbs(betas, pose, **{k: (jnp.asarray(v) if k != "parents" else v) for k, v in m.items()})
    np.testing.assert_allclose(np.asarray(verts[0]), m["v_template"], atol=1e-5)
    # A must be identity-with-zero-translation for the rest pose
    np.testing.assert_allclose(np.asarray(A[0]), np.broadcast_to(np.eye(4), A[0].shape), atol=1e-5)
    # joints = regressed rest joints
    np.testing.assert_allclose(np.asarray(joints[0]), m["J_regressor"] @ m["v_template"], atol=1e-5)


def test_global_rotation_rotates_about_root():
    rng = np.random.default_rng(1)
    m = make_toy_model(rng)
    m["posedirs"] = np.zeros_like(m["posedirs"])  # isolate the rigid effect
    rotvec = np.array([0.3, -0.2, 0.5], np.float32)
    pose = np.zeros((1, 12), np.float32)
    pose[0, :3] = rotvec
    args = {k: (jnp.asarray(v) if k != "parents" else v) for k, v in m.items()}
    verts, joints, A = lbs(jnp.zeros((1, 3)), jnp.asarray(pose), **args)

    R = Rotation.from_rotvec(rotvec).as_matrix()
    root = m["J_regressor"][0] @ m["v_template"]
    expected = (m["v_template"] - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), expected, atol=1e-4)


def test_A_reskins_rest_vertices():
    """verts == sum_j w_j * (A_j @ [v_posed;1]) — the identity the avatar
    pipeline relies on to pose canonical gaussians with query_lbs weights."""
    rng = np.random.default_rng(2)
    m = make_toy_model(rng)
    pose = rng.normal(size=(1, 12)).astype(np.float32) * 0.4
    betas = rng.normal(size=(1, 3)).astype(np.float32)
    args = {k: (jnp.asarray(v) if k != "parents" else v) for k, v in m.items()}
    verts, joints, A = lbs(jnp.asarray(betas), jnp.asarray(pose), **args)

    v_shaped = m["v_template"] + np.asarray(blend_shapes(jnp.asarray(betas), jnp.asarray(m["shapedirs"])))[0]
    rot = np.asarray(axis_angle_to_matrix(jnp.asarray(pose.reshape(1, 4, 3))))[0]
    pose_feature = (rot[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feature @ m["posedirs"]).reshape(-1, 3)

    T = np.einsum("vj,jpq->vpq", m["lbs_weights"], np.asarray(A[0]))
    vh = np.concatenate([v_posed, np.ones((v_posed.shape[0], 1))], axis=1)
    re_skinned = np.einsum("vpq,vq->vp", T, vh)[:, :3]
    np.testing.assert_allclose(np.asarray(verts[0]), re_skinned, atol=1e-5)


def test_rigid_transform_chain_composition():
    """World transform of joint i must equal the composed chain product."""
    rng = np.random.default_rng(3)
    J = 5
    parents = np.array([-1, 0, 1, 1, 3])
    joints = rng.normal(size=(1, J, 3)).astype(np.float32)
    rots = Rotation.random(J, random_state=4).as_matrix().astype(np.float32)[None]
    posed, A = batch_rigid_transform(jnp.asarray(rots), jnp.asarray(joints), parents)

    # rebuild with plain numpy forward kinematics
    world = [None] * J
    for i in range(J):
        Tl = np.eye(4, dtype=np.float32)
        Tl[:3, :3] = rots[0, i]
        rel = joints[0, i] - (joints[0, parents[i]] if i > 0 else 0)
        Tl[:3, 3] = rel
        world[i] = Tl if i == 0 else world[parents[i]] @ Tl
    expected_joints = np.stack([w[:3, 3] for w in world])
    np.testing.assert_allclose(np.asarray(posed[0]), expected_joints, atol=1e-5)

    # A = world with rest-joint offset removed: A @ [j_rest;1] == posed joint
    for i in range(J):
        jh = np.append(joints[0, i], 1.0)
        np.testing.assert_allclose(np.asarray(A[0, i]) @ jh, np.append(expected_joints[i], 1.0), atol=1e-5)


def test_vertices2joints_and_blendshapes():
    rng = np.random.default_rng(5)
    verts = rng.normal(size=(2, 10, 3)).astype(np.float32)
    Jr = rng.normal(size=(3, 10)).astype(np.float32)
    out = np.asarray(vertices2joints(jnp.asarray(Jr), jnp.asarray(verts)))
    np.testing.assert_allclose(out, np.einsum("jv,bvk->bjk", Jr, verts), atol=1e-5)

    betas = rng.normal(size=(2, 4)).astype(np.float32)
    dirs = rng.normal(size=(10, 3, 4)).astype(np.float32)
    out = np.asarray(blend_shapes(jnp.asarray(betas), jnp.asarray(dirs)))
    np.testing.assert_allclose(out, np.einsum("bl,vkl->bvk", betas, dirs), atol=1e-5)
