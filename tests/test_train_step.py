"""End-to-end integration: a synthetic avatar must overfit a few frames —
the SURVEY.md §4 'single-frame overfit (loss down, PSNR up)' acceptance test,
exercising the full fused step: embeddings -> LBS -> POP decode -> skinning ->
tile rasterization -> losses -> multi-group optax update.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatar_tpu.config import OptimizationParams
from gaussianavatar_tpu.engine.optim import build_optimizer, sparse_adam
from gaussianavatar_tpu.engine.train_step import (
    init_state,
    make_render_fn,
    make_train_step,
)
from gaussianavatar_tpu.models import body as body_mod
from gaussianavatar_tpu.models.avatar import AvatarNet, build_avatar_assets
from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize
from gaussianavatar_tpu.ops.ssim import psnr
from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

H = W = 64
N_FRAMES = 4
RASTER_CFG = RasterizeConfig(tile_size=16, tile_capacity=256, max_tiles_per_gaussian=16, backend="xla")


@functools.lru_cache(maxsize=1)
def fixture():
    model, uv = synthetic_body()
    J = model.parents.shape[0]
    cano_pose = np.zeros(J * 3, np.float32)
    betas = np.zeros(4, np.float32)
    assets = build_avatar_assets(
        model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
        cano_pose, betas, query_res=64, pad_to=256,
    )

    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([-0.0, -0.8, 1.6], np.float32), K, H, W
    )

    poses = np.stack([synthetic_pose(model, t / N_FRAMES) for t in range(N_FRAMES)])
    transls = np.zeros((N_FRAMES, 3), np.float32)

    # ground truth: splat the body VERTICES with position-derived colors
    vt = np.asarray(model.v_template)
    gt_colors = jnp.asarray(
        (vt - vt.min(0)) / (vt.max(0) - vt.min(0)), jnp.float32
    )
    scales = jnp.full((vt.shape[0], 3), 0.02)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (vt.shape[0], 1))
    opac = jnp.ones((vt.shape[0],))
    gts = []
    for i in range(N_FRAMES):
        out = body_mod.forward(
            model, jnp.zeros((1, 4)),
            jnp.asarray(poses[i : i + 1, :3]), jnp.asarray(poses[i : i + 1, 3:]),
            transl=jnp.asarray(transls[i : i + 1]),
        )
        img = rasterize(
            out.vertices[0], gt_colors, scales, quats, opac, cam,
            jnp.ones(3), config=RASTER_CFG,
        )
        gts.append(np.asarray(jnp.clip(img, 0, 1)))
    gts = np.stack(gts)  # (N, 3, H, W)
    assert gts.std() > 0.05  # scene is actually visible
    return model, assets, cam, poses, transls, gts


def make_batch(cam, poses, transls, gts, idxs):
    B = len(idxs)
    return {
        "pose_idx": jnp.asarray(np.asarray(idxs, np.int32)),
        "original_image": jnp.asarray(gts[idxs]),
        "world_view_transform": jnp.tile(cam.world_view_transform[None], (B, 1, 1)),
        "full_proj_transform": jnp.tile(cam.full_proj_transform[None], (B, 1, 1)),
        "tan_fovx": jnp.tile(cam.tan_fovx[None], (B,)),
        "tan_fovy": jnp.tile(cam.tan_fovy[None], (B,)),
    }


def test_stage1_overfit_and_render():
    model, assets, cam, poses, transls, gts = fixture()
    opt = OptimizationParams(epochs=200)

    net = AvatarNet(
        num_frames=N_FRAMES, pose_dim=poses.shape[1], c_geom=16, c_pose=16,
        inp_posmap_size=32, hsize=64, nf=8, train_stage=1,
        pose_init=poses, transl_init=transls,
    )
    # build params once to create the optimizer
    state0 = init_state(net, assets, tx=None_safe_tx(), batch_size=2)
    tx = build_optimizer(state0.params, opt, steps_per_epoch=2, train_stage=1)
    state = state0.replace(opt_state=tx.init(state0.params))

    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RASTER_CFG, train_stage=1
    )

    rng = np.random.default_rng(0)
    first_terms = None
    for it in range(120):
        idxs = rng.choice(N_FRAMES, size=2, replace=False)
        batch = make_batch(cam, poses, transls, gts, idxs)
        state, terms, images = step(
            state, batch, jnp.float32(opt.lambda_rgl), jnp.float32(0.0), jnp.float32(0.0)
        )
        if first_terms is None:
            first_terms = {k: float(v) for k, v in terms.items()}
    last_terms = {k: float(v) for k, v in terms.items()}

    assert np.isfinite(last_terms["total"])
    assert last_terms["l1"] < first_terms["l1"] * 0.6, (first_terms, last_terms)

    # inference path renders the trained avatar and beats a blank image
    render = make_render_fn(net, model, assets, H, W, (1.0, 1.0, 1.0), RASTER_CFG)
    batch = make_batch(cam, poses, transls, gts, [0])
    # short training run: keep the warm-up factor consistent with the last
    # train iteration (the reference renders with iteration=59400 only after
    # full training has shrunk the sigmoid scales)
    img = render(state.params, state.batch_stats, batch, state.iteration)
    p = float(psnr(np.asarray(img), gts[:1])[0, 0])
    p_blank = float(psnr(np.ones_like(gts[:1]), gts[:1])[0, 0])
    assert p > p_blank + 2.0, (p, p_blank)


def test_stage2_step_runs():
    model, assets, cam, poses, transls, gts = fixture()
    opt = OptimizationParams(epochs=200)
    net = AvatarNet(
        num_frames=N_FRAMES, pose_dim=poses.shape[1], c_geom=16, c_pose=16,
        inp_posmap_size=32, hsize=64, nf=8, train_stage=2,
        pose_init=poses, transl_init=transls,
    )
    state0 = init_state(net, assets, tx=None_safe_tx(), batch_size=2)
    tx = build_optimizer(state0.params, opt, steps_per_epoch=2, train_stage=2)
    state = state0.replace(opt_state=tx.init(state0.params))
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RASTER_CFG, train_stage=2
    )
    batch = make_batch(cam, poses, transls, gts, [0, 1])
    batch["inp_pos_map"] = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )
    prev_pose = np.asarray(state.params["pose_embedding"]).copy()
    prev_enc = [np.asarray(x).copy() for x in jax.tree.leaves(state.params["pose_encoder"])]
    state, terms, _ = step(state, batch, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    assert np.isfinite(float(terms["total"]))
    assert "pose" in terms
    # embeddings frozen, pose encoder trained
    np.testing.assert_array_equal(prev_pose, np.asarray(state.params["pose_embedding"]))
    moved = max(
        np.abs(np.asarray(a) - b).max()
        for a, b in zip(jax.tree.leaves(state.params["pose_encoder"]), prev_enc)
    )
    assert moved > 0


class None_safe_tx:
    """placeholder so init_state can run before the real optimizer exists."""

    def init(self, params):
        return None


def test_sparse_adam_row_semantics():
    tx = sparse_adam(0.1)
    params = {"emb": jnp.zeros((4, 3))}
    state = tx.init(params)
    g = {"emb": jnp.zeros((4, 3)).at[1].set(1.0)}
    upd, state = tx.update(g, state, params)
    u = np.asarray(upd["emb"])
    assert (u[0] == 0).all() and (u[2] == 0).all() and (u[3] == 0).all()
    assert (np.abs(u[1]) > 1e-3).all()
    # all-zero grads: nothing moves, step does not advance
    upd2, state2 = tx.update({"emb": jnp.zeros((4, 3))}, state, params)
    assert (np.asarray(upd2["emb"]) == 0).all()
    assert int(state2.step) == int(state.step)


def test_pose_opt_gate_freezes_embeddings():
    model, assets, cam, poses, transls, gts = fixture()
    opt = OptimizationParams(epochs=200)
    net = AvatarNet(
        num_frames=N_FRAMES, pose_dim=poses.shape[1], c_geom=16, c_pose=16,
        inp_posmap_size=32, hsize=64, nf=8, train_stage=1,
        pose_init=poses, transl_init=transls,
    )
    state0 = init_state(net, assets, tx=None_safe_tx(), batch_size=2)
    tx = build_optimizer(state0.params, opt, steps_per_epoch=2, train_stage=1)
    state = state0.replace(opt_state=tx.init(state0.params))
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RASTER_CFG, train_stage=1
    )
    batch = make_batch(cam, poses, transls, gts, [0, 1])

    before = np.asarray(state.params["pose_embedding"]).copy()
    state, _, _ = step(state, batch, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    np.testing.assert_array_equal(before, np.asarray(state.params["pose_embedding"]))

    state, _, _ = step(state, batch, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0))
    after = np.asarray(state.params["pose_embedding"])
    assert np.abs(after[:2] - before[:2]).max() > 0  # batch rows moved
    np.testing.assert_array_equal(after[2:], before[2:])  # untouched rows frozen


def test_cached_render_matches_full():
    """Stage-1 cached-canonical rendering must equal the full-decode path."""
    from gaussianavatar_tpu.engine.train_step import (
        make_cached_render_fn,
        make_render_fn,
        precompute_canonical,
    )

    model, assets, cam, poses, transls, gts = fixture()
    net = AvatarNet(
        num_frames=N_FRAMES, pose_dim=poses.shape[1], c_geom=16, c_pose=16,
        inp_posmap_size=32, hsize=64, nf=8, train_stage=1,
        pose_init=poses, transl_init=transls,
    )
    state = init_state(net, assets, None_safe_tx(), batch_size=1)
    batch = make_batch(cam, poses, transls, gts, [1])

    full = make_render_fn(net, model, assets, H, W, (1.0, 1.0, 1.0), RASTER_CFG)
    img_full = full(state.params, state.batch_stats, batch)

    cache = precompute_canonical(net, assets, state.params, state.batch_stats)
    cached = make_cached_render_fn(net, model, assets, H, W, (1.0, 1.0, 1.0), RASTER_CFG)
    img_cached = cached(cache, state.params, batch)

    np.testing.assert_allclose(np.asarray(img_cached), np.asarray(img_full), atol=1e-5)


def test_gt_bank_step_matches_explicit_images():
    """The device-resident GT bank path (gather by pose_idx inside the step)
    must produce the SAME update as feeding the images explicitly. Bank
    storage is uint8, so both sides are fed the same quantized pixels."""
    model, assets, cam, poses, transls, gts = fixture()
    opt = OptimizationParams(epochs=200)
    net = AvatarNet(
        num_frames=N_FRAMES, pose_dim=poses.shape[1], c_geom=16, c_pose=16,
        inp_posmap_size=32, hsize=64, nf=8, train_stage=1,
        pose_init=poses, transl_init=transls,
    )
    state0 = init_state(net, assets, tx=None_safe_tx(), batch_size=2)
    tx = build_optimizer(state0.params, opt, steps_per_epoch=2, train_stage=1)
    # the jitted step donates its input state: each side needs its own buffers
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)
    state_a = state0.replace(params=copy(state0.params),
                             opt_state=tx.init(state0.params))
    state_b = copy(state0.replace(opt_state=tx.init(state0.params)))

    bank_u8 = np.clip(np.rint(gts * 255.0), 0, 255).astype(np.uint8)
    # compute the dequantized GT ON DEVICE: XLA lowers /255 to *(1/255), so a
    # host-side numpy division differs by 1 ulp, which adam's near-zero-moment
    # normalization then amplifies; device-computed values are bit-identical
    gts_q = np.asarray(jnp.asarray(bank_u8).astype(jnp.float32) / 255.0)

    step_plain = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RASTER_CFG, train_stage=1
    )
    step_bank = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RASTER_CFG,
        train_stage=1, gt_bank=jnp.asarray(bank_u8),
    )

    rng = np.random.default_rng(1)
    for step_i in range(3):
        idxs = rng.choice(N_FRAMES, size=2, replace=False)
        batch = make_batch(cam, poses, transls, gts_q, idxs)
        bank_batch = {k: v for k, v in batch.items() if k != "original_image"}
        state_a, terms_a, _ = step_plain(
            state_a, batch, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)
        )
        state_b, terms_b, _ = step_bank(
            state_b, bank_batch, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)
        )
        # per-step loss equality on EVOLVING states is the plumbing check: a
        # wrong gather index or dequant would compound into O(1e-1) by step 3
        np.testing.assert_allclose(
            float(terms_a["total"]), float(terms_b["total"]), rtol=3e-5,
            err_msg=f"step {step_i}",
        )
    # Param tolerance is loose BY NECESSITY, not sloppiness: the decoder's
    # Dense biases feed straight into BatchNorm, so their true gradient is
    # exactly zero — each XLA program leaves different ~1e-10 float noise
    # there, and adam's g/(sqrt(g^2)+eps) turns that noise into full +-lr
    # sign flips (measured 3e-3 after one step). Meaningful params (kernels,
    # geo_feature, embeddings) agree to ~1e-5.
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(state_a.params),
        jax.tree_util.tree_leaves_with_path(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=2e-2,
                                   err_msg=str(ka))
    np.testing.assert_allclose(
        np.asarray(state_a.params["pose_embedding"]),
        np.asarray(state_b.params["pose_embedding"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state_a.params["geo_feature"]),
        np.asarray(state_b.params["geo_feature"]), atol=1e-4,
    )


def test_scan_steps_match_sequential():
    """make_train_step_scan(S steps in one lax.scan dispatch) must produce
    the same trajectory as S sequential single-step dispatches — the
    guarantee that lets `steps_per_dispatch` default on for throughput."""
    from gaussianavatar_tpu.engine.train_step import make_train_step_scan

    model, assets, cam, poses, transls, gts = fixture()
    opt = OptimizationParams(epochs=200)
    net = AvatarNet(
        num_frames=N_FRAMES, pose_dim=poses.shape[1], c_geom=16, c_pose=16,
        inp_posmap_size=32, hsize=64, nf=8, train_stage=1,
        pose_init=poses, transl_init=transls,
    )
    state0 = init_state(net, assets, tx=None_safe_tx(), batch_size=2)
    tx = build_optimizer(state0.params, opt, steps_per_epoch=2, train_stage=1)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)
    state_seq = state0.replace(params=copy(state0.params),
                               opt_state=tx.init(state0.params))
    state_scan = copy(state0.replace(opt_state=tx.init(state0.params)))

    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RASTER_CFG, train_stage=1
    )
    scan_step = make_train_step_scan(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), RASTER_CFG, train_stage=1
    )

    rng = np.random.default_rng(2)
    batches = []
    for _ in range(4):
        idxs = rng.choice(N_FRAMES, size=2, replace=False)
        batches.append(make_batch(cam, poses, transls, gts, idxs))
    f1, f0 = jnp.float32(1.0), jnp.float32(0.0)
    for b in batches:
        state_seq, terms_seq, _ = step(state_seq, b, f1, f0, f0)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    state_scan, terms_scan, _ = scan_step(state_scan, stacked, f1, f0, f0)

    # the scan body IS the single step, but it is compiled as a different
    # XLA program (loop context), so fusion may reassociate reductions at
    # ulp level — hence tolerances instead of bit equality
    np.testing.assert_allclose(
        float(terms_seq["total"]), float(terms_scan["total"][-1]), rtol=1e-5
    )
    assert int(state_scan.iteration) == int(state_seq.iteration) == 4
    # loose overall + tight on the meaningful params, for the same reason as
    # test_gt_bank_step_matches_explicit_images: adam amplifies cross-program
    # ulp grad noise (esp. exact-zero BN-absorbed bias grads) to ~lr scale
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(state_seq.params),
        jax.tree_util.tree_leaves_with_path(state_scan.params),
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=2e-2,
                                   err_msg=str(ka))
    np.testing.assert_allclose(
        np.asarray(state_seq.params["pose_embedding"]),
        np.asarray(state_scan.params["pose_embedding"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state_seq.params["geo_feature"]),
        np.asarray(state_scan.params["geo_feature"]), atol=1e-4,
    )
