"""AIAP regularizer wired into the fused train step (--use_aiap)."""

import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.config import OptimizationParams
from gaussianavatar_tpu.engine.optim import build_optimizer
from gaussianavatar_tpu.engine.train_step import init_state, make_train_step
from gaussianavatar_tpu.models.avatar import AvatarNet, build_avatar_assets
from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.knn import host_knn
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose


def test_aiap_term_present_and_finite():
    H = W = 32
    model, uv = synthetic_body()
    J = model.parents.shape[0]
    assets = build_avatar_assets(
        model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
        np.zeros(J * 3, np.float32), np.zeros(4, np.float32),
        query_res=32, pad_to=128,
    )
    nn = jnp.asarray(host_knn(np.asarray(assets.query_points[: assets.num_valid]), k=5))

    K = np.array([[36.0, 0, W / 2], [0, 36.0, H / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0, -0.8, 1.6], np.float32), K, H, W
    )
    NF = 2
    poses = np.stack([synthetic_pose(model, t / NF, amplitude=2.0) for t in range(NF)])
    net = AvatarNet(
        num_frames=NF, pose_dim=poses.shape[1], c_geom=8, c_pose=8,
        inp_posmap_size=16, hsize=32, nf=8, train_stage=1,
        pose_init=poses, transl_init=np.zeros((NF, 3), np.float32),
    )
    opt = OptimizationParams(epochs=10, use_aiap=True)

    class _TX0:
        def init(self, p):
            return None

    state = init_state(net, assets, _TX0(), batch_size=2)
    tx = build_optimizer(state.params, opt, steps_per_epoch=1, train_stage=1)
    state = state.replace(opt_state=tx.init(state.params))
    rc = RasterizeConfig(tile_size=16, tile_capacity=64, max_tiles_per_gaussian=16, backend="xla")
    step = make_train_step(net, model, assets, tx, opt, H, W, (1, 1, 1), rc,
                           train_stage=1, aiap_nn=nn)
    batch = {
        "pose_idx": jnp.asarray([0, 1], jnp.int32),
        "original_image": jnp.full((2, 3, H, W), 0.5),
        "world_view_transform": jnp.tile(cam.world_view_transform[None], (2, 1, 1)),
        "full_proj_transform": jnp.tile(cam.full_proj_transform[None], (2, 1, 1)),
        "tan_fovx": jnp.tile(cam.tan_fovx[None], (2,)),
        "tan_fovy": jnp.tile(cam.tan_fovy[None], (2,)),
    }
    state, terms, _ = step(state, batch, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    assert "aiap" in terms
    # the bent pose is non-isometric around joints -> strictly positive term
    assert 0 < float(terms["aiap"]) < 1.0
    assert np.isfinite(float(terms["total"]))
