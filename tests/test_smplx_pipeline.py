"""SMPL-X path through the avatar pipeline: rest_pose (jaw/eyes/hands)
threading from batch into pose_gaussians (avatar_model.py:279-289)."""

import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.models.avatar import AvatarAssets, pose_gaussians
from gaussianavatar_tpu.models.body import BodyModel


def _smplx_like(V=60, J=55, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.uniform(size=(V, J)).astype(np.float32)
    return BodyModel(
        v_template=jnp.asarray(rng.normal(size=(V, 3)).astype(np.float32)),
        shapedirs=jnp.asarray(rng.normal(scale=0.01, size=(V, 3, 10)).astype(np.float32)),
        posedirs=jnp.zeros((9 * (J - 1), V * 3)),
        J_regressor=jnp.asarray((np.eye(J, V) if J <= V else None).astype(np.float32)),
        lbs_weights=jnp.asarray(w / w.sum(1, keepdims=True)),
        parents=np.concatenate([[-1], np.zeros(J - 1, int)]).astype(np.int32),
        faces=np.zeros((1, 3), np.int64),
        model_type="smplx",
    )


def test_pose_gaussians_smplx_rest_pose():
    model = _smplx_like()
    J = 55
    N = 16
    rng = np.random.default_rng(1)
    assets = AvatarAssets(
        query_points=jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
        query_lbs=jnp.asarray((np.ones((N, J)) / J).astype(np.float32)),
        inv_mats=jnp.broadcast_to(jnp.eye(4), (J, 4, 4)),
        valid_idx=jnp.zeros(N, jnp.int32),
        uv_coords=jnp.zeros((N, 2)),
        betas=jnp.zeros(10),
        query_res=4,
        num_valid=N,
    )
    B = 2
    pose = jnp.zeros((B, 66))   # global(3) + body(63)
    transl = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    rest = jnp.zeros((B, 99))   # jaw(3)+eyes(6)+hands(90)
    offs = jnp.zeros((B, N, 3))

    world = pose_gaussians(model, assets, pose, transl, offs, rest_pose=rest)
    # identity pose + identity cano mats: points just translate
    expected = np.asarray(assets.query_points)[None] + np.asarray(transl)[:, None]
    np.testing.assert_allclose(np.asarray(world), expected, atol=1e-5)

    # nonzero jaw/hand pose changes the output (the rest_pose is really used)
    rest2 = rest.at[:, 0].set(0.6).at[:, 20].set(0.4)
    world2 = pose_gaussians(model, assets, pose, transl, offs, rest_pose=rest2)
    assert float(jnp.abs(world2 - world).max()) > 1e-4
