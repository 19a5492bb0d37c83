"""4-subject data-parallel training on the virtual 8-device mesh
(BASELINE config #5). Subjects own params/assets; the subject axis is
sharded; training must proceed independently per subject."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.config import OptimizationParams
from gaussianavatar_tpu.engine.optim import build_optimizer
from gaussianavatar_tpu.engine.train_step import init_state
from gaussianavatar_tpu.models.avatar import AvatarNet, build_avatar_assets
from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
from gaussianavatar_tpu.parallel.multi_subject import (
    make_multi_subject_step,
    make_subject_mesh,
    stack_assets,
    stack_subjects,
)
from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

H = W = 32
NS = 4  # subjects
NF = 4  # frames per subject
RC = RasterizeConfig(tile_size=16, tile_capacity=64, max_tiles_per_gaussian=16, backend="xla")


def test_four_subject_dp_training():
    model, uv = synthetic_body()
    J = model.parents.shape[0]
    rng = np.random.default_rng(0)

    # per-subject assets: different betas -> different canonical geometry
    assets_list = [
        build_avatar_assets(
            model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
            np.zeros(J * 3, np.float32),
            (0.5 * rng.normal(size=4)).astype(np.float32),
            query_res=32, pad_to=128,
        )
        for _ in range(NS)
    ]
    assets = stack_assets(assets_list)

    K = np.array([[36.0, 0, W / 2], [0, 36.0, H / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0, -0.8, 1.6], np.float32), K, H, W
    )
    poses = np.stack([synthetic_pose(model, t / NF) for t in range(NF)])
    net = AvatarNet(
        num_frames=NF, pose_dim=poses.shape[1], c_geom=8, c_pose=8,
        inp_posmap_size=16, hsize=32, nf=8, train_stage=1,
        pose_init=poses, transl_init=np.zeros((NF, 3), np.float32),
    )
    opt = OptimizationParams(epochs=10)

    class _TX0:
        def init(self, p):
            return None

    states = []
    for s in range(NS):
        st = init_state(net, assets_list[s], _TX0(), batch_size=2, rng=jax.random.PRNGKey(s))
        states.append(st)
    tx = build_optimizer(states[0].params, opt, steps_per_epoch=2, train_stage=1)
    states = [st.replace(opt_state=tx.init(st.params)) for st in states]
    stacked = stack_subjects(states)

    mesh = make_subject_mesh(NS)
    step, place = make_multi_subject_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RC, mesh
    )

    B = 2
    gts = rng.uniform(size=(NS, B, 3, H, W)).astype(np.float32)
    batch = {
        "pose_idx": jnp.tile(jnp.arange(B, dtype=jnp.int32)[None], (NS, 1)),
        "original_image": jnp.asarray(gts),
        "world_view_transform": jnp.tile(cam.world_view_transform[None, None], (NS, B, 1, 1)),
        "full_proj_transform": jnp.tile(cam.full_proj_transform[None, None], (NS, B, 1, 1)),
        "tan_fovx": jnp.tile(cam.tan_fovx[None, None], (NS, B)),
        "tan_fovy": jnp.tile(cam.tan_fovy[None, None], (NS, B)),
    }

    stacked = place(stacked)
    batch = place(batch)

    new_state, terms, images = step(
        stacked, batch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    )
    jax.block_until_ready(new_state.params)

    losses = np.asarray(terms["total"])
    assert losses.shape == (NS,)
    assert np.isfinite(losses).all()
    assert images.shape == (NS, B, 3, H, W)
    # subject axis is actually sharded over the mesh
    assert "subject" in str(images.sharding.spec)

    # independence: different inits + different GT -> different trained params
    geo = np.asarray(new_state.params["geo_feature"])
    assert geo.shape[0] == NS
    for s in range(1, NS):
        assert np.abs(geo[s] - geo[0]).max() > 0

    # second step continues fine
    new_state2, terms2, _ = step(
        new_state, batch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    )
    assert np.isfinite(np.asarray(terms2["total"])).all()
    assert int(new_state2.iteration[0]) == 2
