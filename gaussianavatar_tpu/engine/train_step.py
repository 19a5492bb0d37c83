"""The fused jitted train/render step.

One XLA program per step: embedding lookup -> SMPL LBS -> POP decode ->
skinning -> vmapped tile rasterization over the batch -> L1 + SSIM (+LPIPS)
+ regularizers -> grads -> multi-group optax update (train.py:63-97 and
avatar_model.py:272-367 collapsed into a single compiled function; the
reference instead runs a Python loop with one CUDA launch per batch item,
avatar_model.py:332-365).

Epoch-dependent scalars (regularizer decay w_rgl, pose-optimization gate,
LPIPS gate) are traced inputs so one compiled step serves all epochs.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gaussianavatar_tpu.models.avatar import (
    AvatarAssets,
    AvatarNet,
    gaussian_attributes,
    pose_gaussians,
    scale_warmup,
)
from gaussianavatar_tpu.models.body import BodyModel
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
from gaussianavatar_tpu.ops.ssim import l1_loss, ssim


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    iteration: jax.Array  # int32


def make_render_views(H: int, W: int, bg_color, raster_cfg: RasterizeConfig):
    """Batched renderer: the whole batch rides one Pallas launch. Returns
    (images, overflow) — overflow is the gaussian-tile pairs dropped by the
    tile-capacity caps (0 = exact coverage); the train step logs it."""
    from gaussianavatar_tpu.ops.rasterize import rasterize_views

    bg = jnp.asarray(bg_color, jnp.float32)

    def render(means, colors, scales3, rotations, opacity, wvt, fpt, tanx, tany,
               caps=None):
        return rasterize_views(
            means, colors, scales3, rotations, opacity,
            wvt, fpt, tanx, tany, H, W, bg, config=raster_cfg,
            return_overflow=True, caps=caps,
        )

    return render


def _forward_gaussians(net, variables, body_model, assets, batch, iteration, train, mutable):
    """Shared forward: batch dict -> (world points, colors, scales3, rot,
    opacity, aux losses dict, new batch_stats)."""
    idx = batch["pose_idx"]
    B = idx.shape[0]
    inp = batch.get("inp_pos_map")

    # Stage 1's decoder sees no per-frame input (the geometry featmap is the
    # only source), so its output is identical for every batch item: decode
    # ONCE and broadcast. The broadcast's backward sums the per-item
    # cotangents — exactly the gradient of the replicated compute — and
    # BatchNorm statistics over identical copies are unchanged. (The
    # reference re-runs the decoder per batch item, avatar_model.py:302.)
    dedup = net.train_stage == 1 and inp is None
    B_dec = 1 if dedup else B

    def apply_fn(vs):
        def run(module):
            if "pose_data" in batch:  # free-render path: poses from the dataset
                pose, transl = batch["pose_data"], batch["transl_data"]
            else:
                pose, transl = module.lookup(idx)
            res, scales, shs, pose_featmap = module.decode(
                assets, B_dec, inp_posmap=inp, train=train
            )
            return res, scales, shs, pose, transl, pose_featmap

        if mutable:
            return net.apply(vs, method=run, mutable=["batch_stats"])
        return net.apply(vs, method=run), vs.get("batch_stats", {})

    (res, scales, shs, pose, transl, pose_featmap), new_state = apply_fn(variables)
    if dedup and B != 1:
        res = jnp.broadcast_to(res, (B,) + res.shape[1:])
        scales = jnp.broadcast_to(scales, (B,) + scales.shape[1:])
        shs = jnp.broadcast_to(shs, (B,) + shs.shape[1:])

    world = pose_gaussians(
        body_model, assets, pose, transl, res, rest_pose=batch.get("rest_pose")
    )
    # scale warm-up is a stage-1 mechanism only (avatar_model.py:316-319 vs :416)
    scales_w = scale_warmup(scales, iteration) if net.train_stage == 1 else scales
    scales3, rotations, opacity = gaussian_attributes(assets, scales_w, shs)

    aux = {
        "offsets": res,
        "offset_loss": jnp.mean(res**2),
        "scale_loss": jnp.mean(scales3),
        "pose_loss": jnp.mean(pose_featmap**2) if pose_featmap is not None else jnp.float32(0.0),
    }
    new_bs = new_state.get("batch_stats", {}) if isinstance(new_state, dict) else new_state
    return world, shs, scales3, rotations, opacity, aux, new_bs


def make_train_step(
    net: AvatarNet,
    body_model: BodyModel,
    assets: AvatarAssets,
    tx,
    opt_cfg,
    H: int,
    W: int,
    bg_color,
    raster_cfg: RasterizeConfig,
    train_stage: int = 1,
    lpips_fn: Optional[Callable] = None,
    jit: bool = True,
    aiap_nn=None,
    gt_bank: Optional[jax.Array] = None,
    inp_bank: Optional[jax.Array] = None,
):
    """gt_bank/inp_bank: device-resident per-frame GT images ((N,3,H,W) uint8
    — lossless, PNGs are 8-bit) and stage-2 input posmaps, indexed by the
    batch's pose_idx inside the step. With them the per-step host->device
    payload is a few KB of indices/cameras instead of the full image batch —
    essential when the host link is thin (measured 10 MB/s through the axon
    tunnel: a 6MB 512^2 B=2 GT batch would cost 600ms/step)."""
    render_views = make_render_views(H, W, bg_color, raster_cfg)

    def train_step(state: TrainState, batch, w_rgl, pose_opt_gate, lpips_gate):
        iteration = state.iteration + 1
        if gt_bank is not None:
            batch = dict(
                batch,
                original_image=gt_bank[batch["pose_idx"]].astype(jnp.float32) / 255.0,
            )
        if inp_bank is not None:
            ii = batch["pose_idx"] * 0 if inp_bank.shape[0] == 1 else batch["pose_idx"]
            batch = dict(batch, inp_pos_map=inp_bank[ii])

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            world, shs, scales3, rotations, opacity, aux, new_bs = _forward_gaussians(
                net, variables, body_model, assets, batch, iteration, True, True
            )
            images, overflow = render_views(
                world, shs, scales3, rotations, opacity,
                batch["world_view_transform"], batch["full_proj_transform"],
                batch["tan_fovx"], batch["tan_fovy"],
                caps=(batch["tile_caps"].reshape(-1)
                      if "tile_caps" in batch else None),
            )
            gt = batch["original_image"]

            Ll1 = (1.0 - opt_cfg.lambda_dssim) * l1_loss(images, gt)
            ssim_loss = opt_cfg.lambda_dssim * (1.0 - ssim(images, gt))
            offset_loss = w_rgl * aux["offset_loss"]
            if train_stage == 1:
                geo_loss = jnp.mean(params["geo_feature"] ** 2)
                scale_loss = opt_cfg.lambda_scale * aux["scale_loss"]
                loss = scale_loss + offset_loss + Ll1 + ssim_loss + geo_loss
                terms = dict(l1=Ll1, ssim=ssim_loss, scale=scale_loss,
                             offset=offset_loss, geo=geo_loss)
            else:
                pose_loss = aux["pose_loss"] * opt_cfg.lambda_pose
                loss = offset_loss + Ll1 + ssim_loss + pose_loss
                terms = dict(l1=Ll1, ssim=ssim_loss, offset=offset_loss, pose=pose_loss)

            if aiap_nn is not None:
                from gaussianavatar_tpu.ops.knn import aiap_loss

                nv = assets.num_valid
                cano = assets.query_points[None, :nv] + aux["offsets"][:, :nv]
                aiap = opt_cfg.lambda_aiap * aiap_loss(cano, world[:, :nv], aiap_nn)
                loss = loss + aiap
                terms["aiap"] = aiap
            if lpips_fn is not None:
                vgg = opt_cfg.lambda_lpips * lpips_fn((images - 0.5) * 2, (gt - 0.5) * 2)
                loss = loss + lpips_gate * vgg
                terms["vgg"] = vgg
            terms["total"] = loss
            # truncation is surfaced, never silent: rides metrics.jsonl
            terms["raster_overflow"] = jax.lax.stop_gradient(overflow).astype(jnp.float32)
            return loss, (new_bs, terms, images)

        grads, (new_bs, terms, images) = jax.grad(loss_fn, has_aux=True)(state.params)

        # epoch gate for pose optimization: zero grads -> sparse adam no-ops
        for k in ("pose_embedding", "transl_embedding"):
            grads[k] = grads[k] * pose_opt_gate

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            iteration=iteration,
        )
        return new_state, terms, images

    return jax.jit(train_step, donate_argnums=0) if jit else train_step


def make_train_step_scan(
    net: AvatarNet,
    body_model: BodyModel,
    assets: AvatarAssets,
    tx,
    opt_cfg,
    H: int,
    W: int,
    bg_color,
    raster_cfg: RasterizeConfig,
    train_stage: int = 1,
    lpips_fn: Optional[Callable] = None,
    aiap_nn=None,
    gt_bank: Optional[jax.Array] = None,
    inp_bank: Optional[jax.Array] = None,
):
    """Multi-step dispatch: lax.scan S train steps inside one XLA program,
    same trajectory as S sequential steps (equivalence test in
    tests/test_train_step.py). Amortizes per-dispatch host latency; with the
    device-resident GT bank the per-step feed is a few KB, so this is what
    closes the wall-vs-fused throughput gap (measured 14.6 -> 19.5 it/s wall
    at 512^2 going S=1 -> 8 through the axon tunnel). The stacked batch has
    a leading step axis (S, B, ...)."""
    single = make_train_step(
        net, body_model, assets, tx, opt_cfg, H, W, bg_color, raster_cfg,
        train_stage=train_stage, lpips_fn=lpips_fn, jit=False, aiap_nn=aiap_nn,
        gt_bank=gt_bank, inp_bank=inp_bank,
    )

    @functools.partial(jax.jit, donate_argnums=0)
    def train_steps(state: TrainState, stacked_batch, w_rgl, pose_opt_gate, lpips_gate):
        def body(st, batch):
            st2, terms, images = single(st, batch, w_rgl, pose_opt_gate, lpips_gate)
            return st2, (terms, images)

        new_state, (terms, images) = jax.lax.scan(body, state, stacked_batch)
        # terms are stacked (S,) scalars; images from the last step only
        return new_state, terms, images[-1]

    return train_steps


def make_render_fn(
    net: AvatarNet,
    body_model: BodyModel,
    assets: AvatarAssets,
    H: int,
    W: int,
    bg_color,
    raster_cfg: RasterizeConfig,
    with_overflow: bool = False,
):
    """Jitted inference render (render_free_stage1/2 equivalent,
    avatar_model.py:467-649): poses come either from the batch
    ('pose_data'/'transl_data') or the trained embeddings.
    `with_overflow=True` returns (image, overflow) so quality reports can
    state whether capacity truncation touched the rendered pixels."""
    render_views = make_render_views(H, W, bg_color, raster_cfg)

    @jax.jit
    def render(params, batch_stats, batch, iteration=jnp.int32(10**6)):
        variables = {"params": params, "batch_stats": batch_stats}
        world, shs, scales3, rotations, opacity, _, _ = _forward_gaussians(
            net, variables, body_model, assets, batch, iteration, False, False
        )
        out = render_views(
            world, shs, scales3, rotations, opacity,
            batch["world_view_transform"], batch["full_proj_transform"],
            batch["tan_fovx"], batch["tan_fovy"],
            caps=(batch["tile_caps"].reshape(-1)
                  if "tile_caps" in batch else None),
        )
        return out if with_overflow else out[0]

    return render


def make_debug_points_fn(net: AvatarNet, body_model: BodyModel, assets: AvatarAssets):
    """Posed world points of the first batch item — the reference's periodic
    PLY dump payload (train.py:107-111)."""

    @jax.jit
    def points(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        world, *_ = _forward_gaussians(
            net, variables, body_model, assets, batch, jnp.int32(10**6), False, False
        )
        return world[0, : assets.num_valid]

    return points


def precompute_canonical(net: AvatarNet, assets: AvatarAssets, params, batch_stats):
    """Stage-1 decoder outputs are pose-independent: compute the canonical
    offsets/scales/colors ONCE for inference (the reference re-runs the whole
    decoder per frame, render_free_stage1 avatar_model.py:495-497)."""
    variables = {"params": params, "batch_stats": batch_stats}

    def run(module):
        return module.decode(assets, 1, train=False)

    res, scales, shs, _ = net.apply(variables, method=run)
    return res[0], scales[0], shs[0]  # (Nv, ...)


def make_cached_render_fn(
    net: AvatarNet,
    body_model: BodyModel,
    assets: AvatarAssets,
    H: int,
    W: int,
    bg_color,
    raster_cfg: RasterizeConfig,
    with_overflow: bool = False,
):
    """Stage-1 novel-pose renderer over a precomputed canonical cache:
    per frame only LBS -> skinning -> splatting runs (~2x the full-decode
    path at the benchmark workload)."""
    render_views = make_render_views(H, W, bg_color, raster_cfg)

    @jax.jit
    def render(cache, params, batch, iteration=jnp.int32(10**6)):
        res, scales, shs = cache
        idx = batch["pose_idx"]
        B = idx.shape[0]
        if "pose_data" in batch:
            pose, transl = batch["pose_data"], batch["transl_data"]
        else:
            pose = params["pose_embedding"][idx]
            transl = params["transl_embedding"][idx]
        res_b = jnp.broadcast_to(res[None], (B,) + res.shape)
        world = pose_gaussians(
            body_model, assets, pose, transl, res_b, rest_pose=batch.get("rest_pose")
        )
        scales_w = scale_warmup(scales[None], iteration)
        scales3, rotations, opacity = gaussian_attributes(
            assets, jnp.broadcast_to(scales_w, (B,) + scales.shape), shs
        )
        shs_b = jnp.broadcast_to(shs[None], (B,) + shs.shape)
        out = render_views(
            world, shs_b, scales3, rotations, opacity,
            batch["world_view_transform"], batch["full_proj_transform"],
            batch["tan_fovx"], batch["tan_fovy"],
            caps=(batch["tile_caps"].reshape(-1)
                  if "tile_caps" in batch else None),
        )
        return out if with_overflow else out[0]

    return render


def init_state(
    net: AvatarNet,
    assets: AvatarAssets,
    tx,
    rng=None,
    batch_size: int = 2,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    idx = jnp.zeros((batch_size,), jnp.int32)
    inp = (
        jnp.zeros((batch_size, net.inp_posmap_size, net.inp_posmap_size, 3))
        if net.train_stage == 2
        else None
    )
    variables = net.init(rng, assets, idx, inp_posmap=inp, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        iteration=jnp.zeros((), jnp.int32),
    )
