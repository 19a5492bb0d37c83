"""Composed (subject x dp) grid parallelism on the virtual 8-device mesh:
2 subjects, each trained 4-way frame-data-parallel, in ONE jitted step
(parallel/grid.py). Verifies sharding placement and per-subject equivalence
against unsharded single-subject steps on the same global batches."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.config import OptimizationParams
from gaussianavatar_tpu.engine.optim import build_optimizer
from gaussianavatar_tpu.engine.train_step import init_state, make_train_step
from gaussianavatar_tpu.models.avatar import AvatarNet, build_avatar_assets
from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
from gaussianavatar_tpu.parallel.grid import make_grid_mesh, make_grid_step
from gaussianavatar_tpu.parallel.multi_subject import stack_assets, stack_subjects
from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

H = W = 32
NS, ND = 2, 4          # 2 subjects x 4-way dp = 8 devices
B = 4                  # global batch per subject (1 frame per dp slot)
NF = 4
RC = RasterizeConfig(tile_size=16, tile_capacity=64, max_tiles_per_gaussian=16, backend="xla")


def test_grid_subject_by_dp_training():
    model, uv = synthetic_body()
    J = model.parents.shape[0]
    rng = np.random.default_rng(0)

    assets_list = [
        build_avatar_assets(
            model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
            np.zeros(J * 3, np.float32),
            (0.5 * rng.normal(size=4)).astype(np.float32),
            query_res=32, pad_to=128,
        )
        for _ in range(NS)
    ]
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

    states = [
        init_state(net, assets_list[s], _TX0(), batch_size=B, rng=jax.random.PRNGKey(s))
        for s in range(NS)
    ]
    tx = build_optimizer(states[0].params, opt, steps_per_epoch=1, train_stage=1)
    states = [st.replace(opt_state=tx.init(st.params)) for st in states]

    gts = rng.uniform(size=(NS, B, 3, H, W)).astype(np.float32)

    def batch_for(s):
        return {
            "pose_idx": jnp.arange(B, dtype=jnp.int32),
            "original_image": jnp.asarray(gts[s]),
            "world_view_transform": jnp.tile(cam.world_view_transform[None], (B, 1, 1)),
            "full_proj_transform": jnp.tile(cam.full_proj_transform[None], (B, 1, 1)),
            "tan_fovx": jnp.tile(cam.tan_fovx[None], (B,)),
            "tan_fovy": jnp.tile(cam.tan_fovy[None], (B,)),
        }

    # ---- reference: unsharded per-subject steps on the same global batches
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)
    ref_states = []
    f10, f1, f0 = jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    for s in range(NS):
        step_s = make_train_step(
            net, model, assets_list[s], tx, opt, H, W, (1.0, 1.0, 1.0), RC,
            train_stage=1,
        )
        st, terms_s, _ = step_s(copy(states[s]), batch_for(s), f10, f1, f0)
        ref_states.append((st, float(terms_s["total"])))

    # ---- grid: one step over the (2, 4) mesh
    mesh = make_grid_mesh(NS, ND)
    step, place_subject, place_batch = make_grid_step(
        net, model, stack_assets(assets_list), tx, opt, H, W, (1.0, 1.0, 1.0), RC, mesh
    )
    stacked_state = place_subject(stack_subjects([copy(s) for s in states]))
    stacked_batch = place_batch(
        jax.tree.map(lambda *xs: jnp.stack(xs), *[batch_for(s) for s in range(NS)])
    )

    new_state, terms, images = step(stacked_state, stacked_batch, f10, f1, f0)
    jax.block_until_ready(terms["total"])

    losses = np.asarray(terms["total"])
    assert losses.shape == (NS,) and np.isfinite(losses).all()
    assert images.shape == (NS, B, 3, H, W)
    spec = str(images.sharding.spec)
    assert "subject" in spec and "dp" in spec, spec

    # per-subject equivalence with the unsharded reference (cross-program
    # ulp noise only; see test_train_step.py tolerance rationale)
    for s in range(NS):
        ref_st, ref_loss = ref_states[s]
        np.testing.assert_allclose(losses[s], ref_loss, rtol=3e-5)
        np.testing.assert_allclose(
            np.asarray(new_state.params["pose_embedding"][s]),
            np.asarray(ref_st.params["pose_embedding"]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_state.params["geo_feature"][s]),
            np.asarray(ref_st.params["geo_feature"]), atol=1e-4,
        )

    # a second grid step continues fine
    new_state2, terms2, _ = step(new_state, stacked_batch, f10, f1, f0)
    assert np.isfinite(np.asarray(terms2["total"])).all()
    assert int(np.asarray(new_state2.iteration)[0]) == 2
