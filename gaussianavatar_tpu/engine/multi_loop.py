"""Multi-subject training loop: S independent avatars trained side by side on
a `(subject, dp)` device grid — the product form of BASELINE config #5
('4-subject data-parallel training across ICI').

NEW capability over the strictly single-GPU reference (SURVEY.md §2.4). The
per-subject training semantics are the single-subject fused step's
(engine/train_step.py, reference train.py:22-132); this module only stacks
S of them along a leading subject axis, shards that axis over the mesh, and
(with dp > 1) additionally shards each subject's frame batch over its mesh
row, letting the XLA partitioner place the per-subject gradient reductions
on ICI (parallel/grid.py).

Checkpoints are written as S ordinary single-subject directories
(engine/checkpoint.save_stacked_checkpoint), so `eval.py -m <out>/<subject>`
and every other single-subject tool work on each subject unchanged, and a
multi-subject run resumes from them exactly.

Subjects may have different frame counts: the per-frame pose/transl
embedding tables are padded to the largest subject (extra rows are never
indexed, and SparseAdam leaves untouched rows' moments at zero), so the
stacked parameter pytrees share one shape.
"""

from __future__ import annotations

import os
import time
from os.path import join
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.config import Config
from gaussianavatar_tpu.data.dataset import BatchLoader
from gaussianavatar_tpu.engine import checkpoint as ckpt
from gaussianavatar_tpu.engine.logging_utils import MetricsLogger
from gaussianavatar_tpu.engine.loop import (
    adjust_loss_weights,
    device_prefetch,
    lpips_gate_value,
    pose_opt_gate_value,
    raster_config,
    save_image_grid,
    stage_load,
)
from gaussianavatar_tpu.engine.optim import build_optimizer
from gaussianavatar_tpu.engine.setup import AvatarBundle, setup_avatar
from gaussianavatar_tpu.engine.train_step import TrainState, init_state
from gaussianavatar_tpu.parallel.grid import make_grid_mesh, make_grid_step
from gaussianavatar_tpu.parallel.multi_subject import stack_assets, stack_subjects

DROP_KEYS = {"FovX", "FovY", "height", "width", "projection_matrix", "camera_center"}


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr
    pad = np.zeros((n - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def build_subject_bundles(cfgs: Sequence[Config]) -> List[AvatarBundle]:
    """Per-subject bundles with embedding tables padded to the largest
    subject so the parameter pytrees stack."""
    bundles = [setup_avatar(c, train=True) for c in cfgs]

    b0, c0 = bundles[0], cfgs[0]
    for b, c in zip(bundles[1:], cfgs[1:]):
        if c.model.smpl_type != c0.model.smpl_type:
            raise ValueError("subjects must share smpl_type")
        if b.train_dataset.pose_data.shape[1] != b0.train_dataset.pose_data.shape[1]:
            raise ValueError("subjects must share the pose dimensionality")
        if b.assets.num_valid != b0.assets.num_valid or b.assets.query_res != b0.assets.query_res:
            raise ValueError("subjects must share a UV atlas (query_posmap_size)")

    n_max = max(len(b.train_dataset) for b in bundles)
    out = []
    for b in bundles:
        net = b.net.clone(
            num_frames=n_max,
            pose_init=_pad_rows(b.train_dataset.pose_data, n_max),
            transl_init=_pad_rows(b.train_dataset.transl_data, n_max),
        )
        out.append(b._replace(net=net))
    return out


def train_multi(
    cfgs: Sequence[Config],
    saving_epochs: Sequence[int],
    checkpoint_epochs: Sequence[int] = (),
    dp: int = 1,
    max_steps: Optional[int] = None,
) -> TrainState:
    """Train len(cfgs) subjects in lockstep; returns the stacked final state.
    Each cfg carries its own source_path/model_path; opt/net/raster params
    must match (the first subject's are used for the shared step)."""
    S = len(cfgs)
    cfg0 = cfgs[0]
    opt = cfg0.opt
    if cfg0.model.batch_size % dp:
        raise ValueError(
            f"batch_size ({cfg0.model.batch_size}) must be a multiple of dp ({dp})"
        )
    mesh = make_grid_mesh(S, dp)

    loggers = []
    for cfg in cfgs:
        os.makedirs(join(cfg.model.model_path, "log"), exist_ok=True)
        cfg.save(join(cfg.model.model_path, "cfg_args.json"))
        loggers.append(MetricsLogger(cfg.model.model_path))

    bundles = build_subject_bundles(cfgs)
    loaders = [
        BatchLoader(b.train_dataset, cfg.model.batch_size, shuffle=True, seed=s)
        for s, (b, cfg) in enumerate(zip(bundles, cfgs))
    ]
    steps_per_epoch = min(len(ld) for ld in loaders)

    probe = bundles[0].train_dataset[0]
    H, W = int(probe["height"]), int(probe["width"])
    for b in bundles[1:]:
        hw = b.train_dataset.image_hw()
        if hw != (H, W):
            raise ValueError(f"subjects must share the image size ({hw} vs {(H, W)})")
    bg = (1.0, 1.0, 1.0) if cfg0.model.white_background else (0.0, 0.0, 0.0)

    class _TX0:
        def init(self, p):
            return None

    singles = [
        init_state(b.net, b.assets, _TX0(), rng=jax.random.PRNGKey(s),
                   batch_size=cfg0.model.batch_size)
        for s, b in enumerate(bundles)
    ]
    tx = build_optimizer(singles[0].params, opt, steps_per_epoch, cfg0.model.train_stage)
    singles = [st.replace(opt_state=tx.init(st.params)) for st in singles]

    epoch_start = 0
    model_paths = [cfg.model.model_path for cfg in cfgs]
    frame_counts = [len(b.train_dataset) for b in bundles]
    if checkpoint_epochs:
        epoch_start = checkpoint_epochs[0]
        stacked_state = ckpt.load_stacked_checkpoint(model_paths, epoch_start, singles[0])
    else:
        if cfg0.model.train_stage == 2:
            singles = [
                stage_load(st, cfg.model.stage1_out_path)
                for st, cfg in zip(singles, cfgs)
            ]
        stacked_state = stack_subjects(singles)

    stacked_assets = stack_assets([b.assets for b in bundles])
    step, place_subject, place_batch = make_grid_step(
        bundles[0].net, bundles[0].body_model, stacked_assets, tx, opt,
        H, W, bg, raster_config(cfg0, train=True), mesh,
        train_stage=cfg0.model.train_stage,
    )
    del place_batch  # feeds are placed by the prefetcher with this sharding:
    from jax.sharding import NamedSharding, PartitionSpec

    from gaussianavatar_tpu.parallel.mesh import DATA_AXIS
    from gaussianavatar_tpu.parallel.multi_subject import SUBJECT_AXIS

    state = place_subject(stacked_state)
    batch_sharding = NamedSharding(mesh, PartitionSpec(SUBJECT_AXIS, DATA_AXIS))

    def make_feeds():
        """Zip per-subject loaders into (S, B, ...) stacked feeds."""
        for per_subject in zip(*loaders):
            feeds = []
            for batch in per_subject:
                feed = {k: v for k, v in batch.items() if k not in DROP_KEYS}
                if "inp_pos_map" in feed and feed["inp_pos_map"].shape[1] == 3:
                    feed["inp_pos_map"] = feed["inp_pos_map"].transpose(0, 2, 3, 1)
                feeds.append(feed)
            yield {k: np.stack([f[k] for f in feeds]) for k in feeds[0]}

    first_iter = epoch_start * steps_per_epoch
    t_start = time.time()
    done = False
    terms = {}

    for epoch in range(epoch_start + 1, opt.epochs + 1):
        w_rgl = adjust_loss_weights(opt.lambda_rgl, epoch, "decay", epoch_start, 20)
        pose_gate = pose_opt_gate_value(cfg0.model.train_stage, epoch, opt)
        lpips_gate = lpips_gate_value(False, epoch, opt)

        for feed in device_prefetch(make_feeds(), depth=2, sharding=batch_sharding):
            state, terms, images = step(
                state, feed, jnp.float32(w_rgl), jnp.float32(pose_gate),
                jnp.float32(lpips_gate),
            )
            first_iter += 1
            if first_iter == epoch_start * steps_per_epoch + 1:
                jax.block_until_ready(terms["total"])
                t_start = time.time()  # exclude compile from it/s
            if first_iter % 10 == 0 or first_iter == epoch_start * steps_per_epoch + 1:
                totals = np.asarray(terms["total"])  # (S,)
                dt = time.time() - t_start
                steps_done = max(first_iter - epoch_start * steps_per_epoch - 1, 1)
                print(
                    f"iter {first_iter} epoch {epoch} "
                    f"loss/subject {np.array2string(totals, precision=4)} "
                    f"({steps_done / max(dt, 1e-9):.2f} it/s x {S} subjects)"
                )
                host_terms = {k: np.asarray(v) for k, v in terms.items()}
                for s, logger in enumerate(loggers):
                    logger.log(first_iter, {k: float(v[s]) for k, v in host_terms.items()})
            if (first_iter - 1) % opt.log_iter == 0:
                # one grid PNG per subject: its batch's predictions
                imgs = np.asarray(images)
                for s, cfg in enumerate(cfgs):
                    save_image_grid(
                        join(cfg.model.model_path, "log", f"{first_iter:05d}_pred.png"),
                        imgs[s],
                    )
            if max_steps is not None and first_iter >= max_steps:
                done = True
                break

        if (epoch > saving_epochs[0]) and epoch % cfg0.model.save_epoch == 0:
            print(f"[Epoch {epoch}] saving {S} subject checkpoints")
            ckpt.save_stacked_checkpoint(model_paths, epoch, state, frame_counts)
        if done:
            break

    ckpt.save_stacked_checkpoint(model_paths, min(epoch, opt.epochs), state, frame_counts)
    for logger in loggers:
        logger.close()
    return state
