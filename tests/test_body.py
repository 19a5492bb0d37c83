import os
import pickle

import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.models import body as body_mod
from gaussianavatar_tpu.models.body import BodyModel, create, forward, load_body_model
from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose


def test_synthetic_rest_pose():
    model, _ = synthetic_body()
    J = model.parents.shape[0]
    B = 2
    out = forward(
        model,
        betas=jnp.zeros((B, 4)),
        global_orient=jnp.zeros((B, 3)),
        body_pose=jnp.zeros((B, (J - 1) * 3)),
        transl=jnp.asarray(np.tile([[0.1, 0.2, 0.3]], (B, 1)).astype(np.float32)),
    )
    expected = np.asarray(model.v_template) + np.array([0.1, 0.2, 0.3])
    np.testing.assert_allclose(np.asarray(out.vertices[0]), expected, atol=1e-5)
    # transl must be folded into A's translation column (the local smplx mod)
    np.testing.assert_allclose(np.asarray(out.A[0, :, :3, 3]), np.tile([0.1, 0.2, 0.3], (J, 1)), atol=1e-5)


def test_A_reskins_canonical_points():
    """The core avatar identity: posing canonical query points with
    cano2live = A_live @ inv(A_cano) must land on the posed surface
    (avatar_model.py:296,313-314). Exact only for rigid (one-hot) weights
    and no pose correctives, so build such a model."""
    model, _ = synthetic_body()
    W_soft = np.asarray(model.lbs_weights)
    W_rigid = np.zeros_like(W_soft)
    W_rigid[np.arange(W_soft.shape[0]), W_soft.argmax(1)] = 1.0
    model = model._replace(
        lbs_weights=jnp.asarray(W_rigid),
        posedirs=jnp.zeros_like(model.posedirs),
    )
    J = model.parents.shape[0]
    betas = jnp.zeros((1, 4))

    cano_pose = np.zeros((J * 3,), np.float32)
    cano_pose[5] = 0.3  # some canonical bend
    live_pose = synthetic_pose(model, 0.3, amplitude=1.5)

    cano = forward(model, betas, jnp.asarray(cano_pose[None, :3]), jnp.asarray(cano_pose[None, 3:]))
    live = forward(model, betas, jnp.asarray(live_pose[None, :3]), jnp.asarray(live_pose[None, 3:]))

    cano2live = np.einsum("jpq,jqr->jpr", np.asarray(live.A[0]), np.linalg.inv(np.asarray(cano.A[0])))
    W = np.asarray(model.lbs_weights)  # (V, J)
    pt_mats = np.einsum("vj,jpq->vpq", W, cano2live)
    cano_pts = np.asarray(cano.vertices[0])
    posed = np.einsum("vpq,vq->vp", pt_mats[:, :3, :3], cano_pts) + pt_mats[:, :3, 3]
    np.testing.assert_allclose(posed, np.asarray(live.vertices[0]), atol=1e-4)


def test_pkl_loader_roundtrip(tmp_path):
    """Loader must accept the official pkl layout (v_template/shapedirs/
    posedirs (V,3,P)/J_regressor/kintree_table/weights/f)."""
    rng = np.random.default_rng(0)
    V, J, nb = 30, 4, 10
    data = {
        "v_template": rng.normal(size=(V, 3)),
        "shapedirs": rng.normal(size=(V, 3, 300)),  # official files ship 300, trimmed to num_betas
        "posedirs": rng.normal(size=(V, 3, 9 * (J - 1))),
        "J_regressor": rng.uniform(size=(J, V)),
        "kintree_table": np.stack([np.array([2**32 - 1, 0, 1, 2]), np.arange(4)]),
        "weights": (lambda w: w / w.sum(1, keepdims=True))(rng.uniform(size=(V, J))),
        "f": rng.integers(0, V, size=(50, 3)),
    }
    p = os.path.join(tmp_path, "SMPL_NEUTRAL.pkl")
    with open(p, "wb") as f:
        pickle.dump(data, f)

    model = load_body_model(str(tmp_path), "smpl", "neutral", num_betas=nb)
    assert model.shapedirs.shape == (V, 3, nb)
    assert model.posedirs.shape == (9 * (J - 1), V * 3)
    assert model.parents[0] == -1 and list(model.parents[1:]) == [0, 1, 2]

    out = forward(model, jnp.zeros((1, nb)), jnp.zeros((1, 3)), jnp.zeros((1, (J - 1) * 3)))
    np.testing.assert_allclose(np.asarray(out.vertices[0]), data["v_template"], atol=1e-4)
    # factory parity
    model2 = create(str(tmp_path), "smpl", "neutral", num_betas=nb)
    assert model2.v_template.shape == model.v_template.shape


def _tiny_model(J, model_type, V=40, seed=1, n_expr=0):
    rng = np.random.default_rng(seed)
    expr = (
        jnp.asarray(rng.normal(scale=0.01, size=(V, 3, n_expr)).astype(np.float32))
        if n_expr
        else None
    )
    return BodyModel(
        v_template=jnp.asarray(rng.normal(size=(V, 3)).astype(np.float32)),
        shapedirs=jnp.asarray(rng.normal(scale=0.01, size=(V, 3, 10)).astype(np.float32)),
        posedirs=jnp.asarray(np.zeros((9 * (J - 1), V * 3), np.float32)),
        J_regressor=jnp.asarray((np.ones((J, V)) / V).astype(np.float32)),
        lbs_weights=jnp.asarray((np.ones((V, J)) / J).astype(np.float32)),
        parents=np.concatenate([[-1], np.zeros(J - 1, int)]).astype(np.int32),
        faces=np.zeros((1, 3), np.int64),
        model_type=model_type,
        expr_dirs=expr,
    )


def test_smplh_mano_flame_pose_assembly():
    """Each variant's forward must assemble the right full-pose width over
    the shared lbs() core (reference body_models.py:396-638 SMPLH,
    :1642-1843 MANO, :1846-2108 FLAME)."""
    b = jnp.zeros((1, 10))
    g = jnp.zeros((1, 3))
    # SMPLH: [global, body63, lhand45, rhand45] -> 52 joints
    out = forward(_tiny_model(52, "smplh"), b, g, body_pose=jnp.zeros((1, 63)),
                  left_hand_pose=jnp.zeros((1, 45)))
    assert out.A.shape == (1, 52, 4, 4)
    # MANO: [global, hand45] -> 16 joints; hand pose rides body_pose
    out = forward(_tiny_model(16, "mano"), b, g, body_pose=jnp.zeros((1, 45)))
    assert out.A.shape == (1, 16, 4, 4)
    # MANO also accepts right_hand_pose with body_pose=None
    out = forward(_tiny_model(16, "mano"), b, g, body_pose=None,
                  right_hand_pose=jnp.zeros((1, 45)))
    assert out.A.shape == (1, 16, 4, 4)
    # FLAME: [global, neck, jaw, leye, reye] -> 5 joints
    out = forward(_tiny_model(5, "flame"), b, g, body_pose=None,
                  neck_pose=jnp.zeros((1, 3)), jaw_pose=jnp.zeros((1, 3)))
    assert out.A.shape == (1, 5, 4, 4)


def test_expression_blendshapes():
    """expression coeffs must displace vertices by expr_dirs @ expression
    (reference body_models.py:1197: shape_components = cat([betas, expr]))."""
    model = _tiny_model(55, "smplx", n_expr=10)
    b = jnp.zeros((1, 10))
    g = jnp.zeros((1, 3))
    body = jnp.zeros((1, 63))
    expr = jnp.asarray(np.linspace(-1, 1, 10, dtype=np.float32)[None])

    rest = forward(model, b, g, body)
    out = forward(model, b, g, body, expression=expr)
    expected = np.asarray(rest.vertices[0]) + np.einsum(
        "vde,e->vd", np.asarray(model.expr_dirs), np.asarray(expr[0])
    )
    np.testing.assert_allclose(np.asarray(out.vertices[0]), expected, atol=1e-5)

    # a model without expr_dirs must reject expressions loudly
    import pytest
    with pytest.raises(ValueError):
        forward(_tiny_model(55, "smplx"), b, g, body, expression=expr)


def test_loader_splits_expression_dirs(tmp_path):
    """SMPL-X files with >300 shapedir columns store expressions at [300:];
    the loader must slice them into expr_dirs (body_models.py:1004-1017)."""
    rng = np.random.default_rng(2)
    V, J = 30, 55
    data = {
        "v_template": rng.normal(size=(V, 3)),
        "shapedirs": rng.normal(size=(V, 3, 400)),
        "posedirs": rng.normal(size=(V, 3, 9 * (J - 1))),
        "J_regressor": rng.uniform(size=(J, V)),
        "kintree_table": np.stack(
            [np.concatenate([[2**32 - 1], np.zeros(J - 1, np.int64)]), np.arange(J)]
        ),
        "weights": (lambda w: w / w.sum(1, keepdims=True))(rng.uniform(size=(V, J))),
        "f": rng.integers(0, V, size=(50, 3)),
    }
    np.savez(os.path.join(tmp_path, "SMPLX_NEUTRAL.npz"), **data)
    model = load_body_model(str(tmp_path), "smplx", "neutral", num_betas=10, num_expressions=10)
    assert model.shapedirs.shape == (V, 3, 10)
    assert model.expr_dirs.shape == (V, 3, 10)
    np.testing.assert_allclose(
        np.asarray(model.expr_dirs), data["shapedirs"][:, :, 300:310], atol=1e-6
    )


def test_smplx_pose_assembly():
    """SMPL-X forward must assemble [global, body63, jaw, eyes, hands90] and
    default missing parts to zero (flat_hand_mean semantics)."""
    rng = np.random.default_rng(1)
    V, J = 40, 55
    model = BodyModel(
        v_template=jnp.asarray(rng.normal(size=(V, 3)).astype(np.float32)),
        shapedirs=jnp.asarray(rng.normal(scale=0.01, size=(V, 3, 10)).astype(np.float32)),
        posedirs=jnp.asarray(np.zeros((9 * (J - 1), V * 3), np.float32)),
        J_regressor=jnp.asarray((np.ones((J, V)) / V).astype(np.float32)),
        lbs_weights=jnp.asarray((np.ones((V, J)) / J).astype(np.float32)),
        parents=np.concatenate([[-1], np.zeros(J - 1, int)]).astype(np.int32),
        faces=np.zeros((1, 3), np.int64),
        model_type="smplx",
    )
    out = forward(
        model,
        betas=jnp.zeros((1, 10)),
        global_orient=jnp.zeros((1, 3)),
        body_pose=jnp.zeros((1, 63)),
        jaw_pose=jnp.zeros((1, 3)),
        left_hand_pose=jnp.zeros((1, 45)),
        right_hand_pose=jnp.zeros((1, 45)),
    )
    assert out.A.shape == (1, 55, 4, 4)
    np.testing.assert_allclose(np.asarray(out.vertices[0]), np.asarray(model.v_template), atol=1e-5)


def test_vertex_joint_selector(tmp_path):
    """Official-topology meshes must get the 21 OpenPose extra keypoints
    appended to the regressed joints, each equal to its anchor vertex
    (reference vertex_joint_selector.py:73-77, tables vertex_ids.py)."""
    from gaussianavatar_tpu.models import keypoints

    rng = np.random.default_rng(3)
    V, J = keypoints.OFFICIAL_NUM_VERTS["smpl"], 24
    data = {
        "v_template": rng.normal(size=(V, 3)),
        "shapedirs": rng.normal(scale=0.01, size=(V, 3, 10)),
        "posedirs": np.zeros((V, 3, 9 * (J - 1))),
        "J_regressor": np.ones((J, V)) / V,
        "kintree_table": np.stack(
            [np.concatenate([[2**32 - 1], np.zeros(J - 1, int)]), np.arange(J)]
        ),
        "weights": np.ones((V, J)) / J,
        "f": np.zeros((4, 3), int),
    }
    p = os.path.join(tmp_path, "SMPL_NEUTRAL.pkl")
    with open(p, "wb") as f:
        pickle.dump(data, f)
    model = load_body_model(p, "smpl")
    assert model.extra_joint_ids is not None and len(model.extra_joint_ids) == 21

    transl = jnp.asarray([[0.1, 0.2, 0.3]])
    out = forward(model, jnp.zeros((1, 10)), jnp.zeros((1, 3)),
                  jnp.zeros((1, (J - 1) * 3)), transl=transl)
    assert out.joints.shape == (1, J + 21, 3)
    np.testing.assert_allclose(
        np.asarray(out.joints[0, J:]),
        np.asarray(out.vertices[0])[model.extra_joint_ids],
        atol=1e-6,
    )
    # tiny synthetic meshes are unaffected
    out2 = forward(_tiny_model(24, "smpl"), jnp.zeros((1, 10)),
                   jnp.zeros((1, 3)), jnp.zeros((1, 69)))
    assert out2.joints.shape == (1, 24, 3)
