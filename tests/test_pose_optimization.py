"""Per-frame pose refinement (BASELINE config #3: --pose_op_start_iter):
train with deliberately perturbed pose embeddings and verify the SparseAdam
path pulls them back toward the ground truth that rendered the images."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.config import OptimizationParams
from gaussianavatar_tpu.engine.optim import build_optimizer
from gaussianavatar_tpu.engine.train_step import init_state, make_train_step
from gaussianavatar_tpu.models import body as body_mod
from gaussianavatar_tpu.models.avatar import AvatarNet, build_avatar_assets
from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize
from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

H = W = 64
NF = 2
RC = RasterizeConfig(tile_size=16, tile_capacity=256, max_tiles_per_gaussian=16, backend="xla")


def test_pose_refinement_reduces_pose_error():
    model, uv = synthetic_body()
    J = model.parents.shape[0]
    assets = build_avatar_assets(
        model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
        np.zeros(J * 3, np.float32), np.zeros(4, np.float32),
        query_res=64, pad_to=256,
    )
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0, -0.8, 1.6], np.float32), K, H, W
    )

    true_poses = np.stack([synthetic_pose(model, t / NF, amplitude=2.0) for t in range(NF)])
    transls = np.zeros((NF, 3), np.float32)

    # ground-truth images: splat the TRUE-posed body with fixed colors
    vt = np.asarray(model.v_template)
    colors = jnp.asarray((vt - vt.min(0)) / (vt.max(0) - vt.min(0)), jnp.float32)
    gts = []
    for i in range(NF):
        out = body_mod.forward(
            model, jnp.zeros((1, 4)),
            jnp.asarray(true_poses[i : i + 1, :3]), jnp.asarray(true_poses[i : i + 1, 3:]),
            transl=jnp.asarray(transls[i : i + 1]),
        )
        img = rasterize(
            out.vertices[0], colors, jnp.full((vt.shape[0], 3), 0.02),
            jnp.zeros((vt.shape[0], 4)).at[:, 0].set(1.0), jnp.ones((vt.shape[0],)),
            cam, jnp.ones(3), config=RC,
        )
        gts.append(np.asarray(jnp.clip(img, 0, 1)))
    gts = np.stack(gts)

    # initialize embeddings with PERTURBED poses
    rng = np.random.default_rng(0)
    noise = rng.normal(scale=0.12, size=true_poses.shape).astype(np.float32)
    noise[:, :3] = 0  # keep global orient
    init_poses = true_poses + noise

    net = AvatarNet(
        num_frames=NF, pose_dim=true_poses.shape[1], c_geom=16, c_pose=16,
        inp_posmap_size=32, hsize=64, nf=8, train_stage=1,
        pose_init=init_poses, transl_init=transls,
    )
    opt = OptimizationParams(epochs=500, pose_op_start_iter=0)

    class _TX0:
        def init(self, p):
            return None

    state = init_state(net, assets, _TX0(), batch_size=NF)
    tx = build_optimizer(state.params, opt, steps_per_epoch=1, train_stage=1)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(net, model, assets, tx, opt, H, W, (1, 1, 1), RC, train_stage=1)

    batch = {
        "pose_idx": jnp.arange(NF, dtype=jnp.int32),
        "original_image": jnp.asarray(gts),
        "world_view_transform": jnp.tile(cam.world_view_transform[None], (NF, 1, 1)),
        "full_proj_transform": jnp.tile(cam.full_proj_transform[None], (NF, 1, 1)),
        "tan_fovx": jnp.tile(cam.tan_fovx[None], (NF,)),
        "tan_fovy": jnp.tile(cam.tan_fovy[None], (NF,)),
    }

    err0 = np.abs(init_poses - true_poses).mean()
    for _ in range(150):
        state, terms, _ = step(
            state, batch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
        )
    learned = np.asarray(state.params["pose_embedding"])
    err1 = np.abs(learned - true_poses).mean()
    assert err1 < err0 * 0.7, (err0, err1)
    assert np.isfinite(float(terms["total"]))
