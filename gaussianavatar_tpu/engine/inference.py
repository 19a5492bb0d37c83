"""Shared inference bootstrap for eval / novel-pose / novel-view CLIs:
rebuild the avatar from a saved config + checkpoint, return a jitted
render function (render_free_stage1/2 equivalent)."""

from __future__ import annotations

from os.path import join
from typing import NamedTuple, Optional

import numpy as np

from gaussianavatar_tpu.config import Config
from gaussianavatar_tpu.engine import checkpoint as ckpt
from gaussianavatar_tpu.engine.loop import raster_config
from gaussianavatar_tpu.engine.optim import build_optimizer
from gaussianavatar_tpu.engine.setup import AvatarBundle, setup_avatar
from gaussianavatar_tpu.engine.train_step import (
    TrainState,
    init_state,
    make_cached_render_fn,
    make_render_fn,
    precompute_canonical,
)


class InferenceBundle(NamedTuple):
    cfg: Config
    bundle: AvatarBundle
    state: TrainState
    epoch: int


def load_trained(cfg: Config, epoch: Optional[int] = None) -> InferenceBundle:
    bundle = setup_avatar(cfg, train=False)
    steps_per_epoch = max(len(bundle.train_dataset) // cfg.model.batch_size, 1)

    class _TX0:
        def init(self, p):
            return None

    state = init_state(bundle.net, bundle.assets, _TX0(), batch_size=1)
    tx = build_optimizer(state.params, cfg.opt, steps_per_epoch, cfg.model.train_stage)
    state = state.replace(opt_state=tx.init(state.params))

    if epoch is None:
        epoch = ckpt.latest_epoch(cfg.model.model_path)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {cfg.model.model_path}/net")
    state = ckpt.load_checkpoint(cfg.model.model_path, epoch, state)
    return InferenceBundle(cfg=cfg, bundle=bundle, state=state, epoch=epoch)


def make_renderer(inf: InferenceBundle, height: int, width: int,
                  with_overflow: bool = False):
    """Returns render(params, batch_stats, batch, iteration=...). Stage-1
    models render from a precomputed canonical-gaussian cache (the decoder is
    pose-independent); stage 2 runs the full decode per frame.
    `with_overflow=True` makes the renderer return (image, overflow) —
    eval.py records it so quality numbers always say whether the capacity
    cascade truncated anything."""
    cfg, bundle = inf.cfg, inf.bundle
    bg = (1.0, 1.0, 1.0) if cfg.model.white_background else (0.0, 0.0, 0.0)
    if cfg.model.train_stage == 1:
        cache = precompute_canonical(
            bundle.net, bundle.assets, inf.state.params, inf.state.batch_stats
        )
        cached = make_cached_render_fn(
            bundle.net, bundle.body_model, bundle.assets,
            height, width, bg, raster_config(cfg), with_overflow=with_overflow,
        )

        def render(params, batch_stats, batch, *a, **kw):
            return cached(cache, params, batch, *a, **kw)

        return render
    return make_render_fn(
        bundle.net, bundle.body_model, bundle.assets,
        height, width, bg, raster_config(cfg), with_overflow=with_overflow,
    )


def load_fixed_inp(cfg: Config):
    """The static input posmap for --fixed_inp stage-2 models (or None)."""
    if cfg.model.train_stage != 2 or not cfg.model.fixed_inp:
        return None
    path = join(
        cfg.model.source_path, "train",
        f"query_posemap_{cfg.model.inp_posmap_size}_cano_{cfg.model.smpl_type}.npz",
    )
    return np.load(path)["posmap" + str(cfg.model.inp_posmap_size)].astype(np.float32)


def batch_from_item(item: dict, fix_inp=None) -> dict:
    """Dataset item -> single-frame batch for the jitted renderer."""
    drop = {"FovX", "FovY", "height", "width", "projection_matrix",
            "camera_center", "original_image"}
    batch = {k: np.asarray(v)[None] for k, v in item.items() if k not in drop}
    if fix_inp is not None:
        batch["inp_pos_map"] = fix_inp[None]
    elif "inp_pos_map" in batch and batch["inp_pos_map"].shape[1] == 3:
        batch["inp_pos_map"] = batch["inp_pos_map"].transpose(0, 2, 3, 1)
    return batch
