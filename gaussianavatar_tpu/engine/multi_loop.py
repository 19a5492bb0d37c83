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


def shared_chunk_budget(banks: Sequence[np.ndarray], CB: int, T_img: int,
                        B: int) -> int:
    """Size the grid step's shared static chunk budget (avg rows/tile) from
    per-subject caps tables: the worst SUBJECT's worst batch (its B chunk-
    heaviest frames together) + 15% drift headroom.

    Fairness contract (measured in tests/test_multi_budget_fairness.py and
    scripts/multi_budget_fairness.py): because the budget is MAX-sized over
    subjects — not pooled/averaged — a transparency-deep subject stacked
    with shallow ones is never theta-clipped below its own caps at probe
    time (`rasterize_ragged._budget_theta` returns >= max(caps) whenever the
    caps' chunk total fits the slab, which the max-sizing guarantees per
    subject). The cost of heterogeneity is the SHALLOW subjects' slab
    under-use (every subject's vmapped step gathers the same C chunks),
    i.e. wasted compute, not lost coverage."""
    worst = 0
    for nb in banks:
        ch = (-(-nb.astype(np.int64) // CB)).sum(axis=1)
        worst = max(worst, int(np.sort(ch)[::-1][:B].sum()))
    C = int(worst * 1.15) + B
    C = -(-C // 256) * 256 if C >= 256 else -(-C // 8) * 8
    return int(np.ceil(C * CB / (B * T_img)))


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
    rcfg_train = raster_config(cfg0, train=True)

    # --- Multi-subject saturation-probe auto-tune (RasterParams.auto_cascade;
    # single-subject rationale in engine/loop.py). The grid step is ONE
    # compiled program shared by every subject, so the static knobs (tiers /
    # chunk budget / footprint M) are tuned to the WORST subject, while the
    # ragged path's per-tile capacities stay per-subject per-frame DATA
    # (tile_caps rides the stacked feed, vmapped over the subject axis).
    need_banks = None  # per subject: (F_s, T) int32 caps tables
    build_need_banks = budget_for = footprint_for = tune_pooled = None
    B = cfg0.model.batch_size
    if getattr(cfg0.raster, "auto_cascade", 0):
        from gaussianavatar_tpu.data.dataset import collate
        from gaussianavatar_tpu.engine.inference import (
            PROBE_CAPACITY, make_counts_fn,
        )
        from gaussianavatar_tpu.ops.cascade import tune_tiers

        ts_r = rcfg_train.tile_size
        T_img = (-(-W // ts_r)) * (-(-H // ts_r))
        CBr = int(rcfg_train.ragged_chunk)
        margin = float(getattr(cfg0.raster, "ragged_margin", 1.5) or 1.5)
        fp_full = int(rcfg_train.max_tiles_per_gaussian)
        fp_target = int(getattr(
            cfg0.raster, "render_max_tiles_per_gaussian", 0) or 0)
        fp_adapt = (bool(getattr(cfg0.raster, "train_footprint_adapt", 0))
                    and getattr(rcfg_train, "ragged", False)
                    and 0 < fp_target < fp_full)
        fp_eps = float(getattr(cfg0.raster, "train_footprint_eps", 1e-3))

        def _probe_feed(pb):
            feed = {k: v for k, v in pb.items()
                    if k not in DROP_KEYS and k != "original_image"}
            if "inp_pos_map" in feed and feed["inp_pos_map"].shape[1] == 3:
                feed["inp_pos_map"] = feed["inp_pos_map"].transpose(0, 2, 3, 1)
            return feed

        probe_feeds = []  # per subject: [(frame idxs, feed), ...] covering F_s
        for b in bundles:
            F_s = len(b.train_dataset)
            fs = []
            for i in range(0, F_s, B):
                idxs = [(i + j) % F_s for j in range(B)]
                pb = collate([b.train_dataset[int(k)] for k in idxs])
                fs.append((idxs, _probe_feed(pb)))
            probe_feeds.append(fs)

        def build_counts_fns(rc):
            return [make_counts_fn(b, H, W, rc, probe_capacity=PROBE_CAPACITY,
                                   cand_m=fp_target if fp_adapt else 0)
                    for b in bundles]

        counts_fns = build_counts_fns(rcfg_train)

        def subject_state(st, s):
            take = lambda x: np.asarray(x[s])
            return jax.tree.map(take, st.params), jax.tree.map(take, st.batch_stats)

        if getattr(rcfg_train, "ragged", False):

            def build_need_banks(st, prev=None):
                """-> (per-subject caps tables, worst candidate-footprint
                clip fraction). With `prev` also logs pooled need drift —
                see engine/loop.py build_need_bank."""
                banks, worst_frac = [], None
                exceed = grew = 0
                for s, (b, fs) in enumerate(zip(bundles, probe_feeds)):
                    F_s = len(b.train_dataset)
                    nb = np.zeros((F_s, T_img), np.int32)
                    got = np.zeros(F_s, bool)
                    drop = tot = 0
                    p, bs = subject_state(st, s)
                    for idxs, feed in fs:
                        out = counts_fns[s](p, bs, feed)
                        needed = np.asarray(out[1]).reshape(B, T_img)
                        if fp_adapt:
                            drop += int(out[2])
                            tot += int(out[3])
                        for row, k in zip(needed, idxs):
                            if not got[k]:
                                nb[k] = row
                                got[k] = True
                    if prev is not None:
                        exceed += int(np.maximum(
                            nb.astype(np.int64) - prev[s], 0).sum())
                        grew += int(nb.sum())
                    if fp_adapt:
                        frac = drop / max(tot, 1)
                        worst_frac = frac if worst_frac is None else max(
                            worst_frac, frac)
                    banks.append(np.minimum(
                        np.ceil(nb * margin).astype(np.int64), PROBE_CAPACITY
                    ).astype(np.int32))
                if prev is not None:
                    drift = exceed / max(grew, 1)
                    for lg in loggers:
                        lg.log_event("ragged_drift", f"{drift:.2e}")
                    print(f"ragged need drift since last retune: {drift:.2e}")
                return banks, worst_frac

            def budget_for(banks):
                # shared static budget: the worst subject's worst batch
                # (max-sized, so no subject is clipped below its own caps —
                # see shared_chunk_budget's fairness contract)
                return shared_chunk_budget(banks, CBr, T_img, B)

            def footprint_for(frac, cur_m):
                if frac is None:
                    return cur_m
                if cur_m > fp_target and frac <= fp_eps:
                    return fp_target
                if cur_m < fp_full and frac >= 3.0 * fp_eps:
                    return fp_full
                return cur_m

            def log_fairness(banks, budget):
                """Per-subject budget-fairness telemetry (VERDICT round-4
                weak #6): under the shared max-sized slab, report each
                subject's worst-batch theta clip and slab utilization. The
                fairness contract (shared_chunk_budget docstring) predicts
                clipped_rows == 0 for every subject at probe time; shallow
                subjects show low slab_util (wasted compute, not lost
                coverage). Telemetry, not enforcement — drift between
                retunes can still clip (counted in raster_overflow)."""
                from gaussianavatar_tpu.ops.rasterize_ragged import (
                    budget_theta_host,
                    chunk_slab,
                )

                C_total = chunk_slab(B * T_img, int(budget), CBr)
                for s, nb in enumerate(banks):
                    ch = (-(-nb.astype(np.int64) // CBr)).sum(axis=1)
                    worst = np.argsort(ch)[::-1][:B]
                    caps = nb[worst].reshape(-1).astype(np.int64)
                    theta = budget_theta_host(caps, CBr, C_total)
                    clipped = int(np.maximum(caps - theta, 0).sum())
                    util = float((-(-caps // CBr)).sum()) / max(C_total, 1)
                    loggers[s].log_event(
                        "budget_fairness",
                        f"max_caps {int(caps.max(initial=0))} theta {theta} "
                        f"clipped_rows {clipped} slab_util {util:.3f}")

            need_banks, fp_frac = build_need_banks(stacked_state)
            new_m = footprint_for(fp_frac, rcfg_train.max_tiles_per_gaussian)
            if new_m != rcfg_train.max_tiles_per_gaussian:
                rcfg_train = rcfg_train._replace(max_tiles_per_gaussian=new_m)
                counts_fns = build_counts_fns(rcfg_train)
                for lg in loggers:
                    lg.log_event("footprint_adapt",
                                 f"M {new_m} clip_frac {fp_frac:.2e}")
                print(f"train footprint: M={new_m} "
                      f"(worst candidate clip fraction {fp_frac:.2e})")
            rcfg_train = rcfg_train._replace(ragged_budget=budget_for(need_banks))
            for lg in loggers:
                lg.log_event(
                    "ragged_need_bank",
                    f"subjects {S} budget {rcfg_train.ragged_budget} rows/tile")
            log_fairness(need_banks, rcfg_train.ragged_budget)
            print(f"ragged need tables: {S} subjects, shared budget "
                  f"{rcfg_train.ragged_budget} rows/tile")
        else:

            def tune_pooled(st):
                # pool every subject's first probe batch: one shared tier
                # set sized for the worst tiles anywhere in the fleet
                needs, cnts = [], []
                for s in range(S):
                    p, bs = subject_state(st, s)
                    _, feed = probe_feeds[s][0]
                    out = counts_fns[s](p, bs, feed)
                    cnts.append(np.asarray(out[0]))
                    needs.append(np.asarray(out[1]))
                return tune_tiers(np.concatenate(needs), margin=1.5,
                                  max_capacity=PROBE_CAPACITY,
                                  order_by=np.concatenate(cnts))

            tiers = tune_pooled(stacked_state)
            rcfg_train = rcfg_train._replace(tiers=tiers)
            for lg in loggers:
                lg.log_event("auto_cascade", str(tiers))
            print(f"auto_cascade (multi-subject pooled): tiers {tiers}")

    def build_step(rc):
        return make_grid_step(
            bundles[0].net, bundles[0].body_model, stacked_assets, tx, opt,
            H, W, bg, rc, mesh, train_stage=cfg0.model.train_stage,
        )

    step, place_subject, place_batch = build_step(rcfg_train)
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
            for s, batch in enumerate(per_subject):
                feed = {k: v for k, v in batch.items() if k not in DROP_KEYS}
                if "inp_pos_map" in feed and feed["inp_pos_map"].shape[1] == 3:
                    feed["inp_pos_map"] = feed["inp_pos_map"].transpose(0, 2, 3, 1)
                if need_banks is not None:
                    # per-subject per-frame ragged caps (vmapped over the
                    # subject axis by the grid step, sharded P(subject, dp))
                    feed["tile_caps"] = need_banks[s][batch["pose_idx"]]
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

        if (need_banks is not None or tune_pooled is not None) and not done and (
            epoch == epoch_start + 1 or epoch % cfg0.model.save_epoch == 0
        ):
            # save-boundary retune, mirroring engine/loop.py: saturation
            # evolves during training; only static-knob changes recompile
            if need_banks is not None:
                need_banks, fp_frac = build_need_banks(state, prev=need_banks)
                rebuild = False
                new_m = footprint_for(fp_frac, rcfg_train.max_tiles_per_gaussian)
                if new_m != rcfg_train.max_tiles_per_gaussian:
                    rcfg_train = rcfg_train._replace(max_tiles_per_gaussian=new_m)
                    counts_fns = build_counts_fns(rcfg_train)
                    for lg in loggers:
                        lg.log_event("footprint_adapt",
                                     f"M {new_m} clip_frac {fp_frac:.2e}")
                    print(f"train footprint (epoch-{epoch} retune): M={new_m}")
                    rebuild = True
                newb = budget_for(need_banks)
                if newb > rcfg_train.ragged_budget or newb < int(
                        rcfg_train.ragged_budget * 0.9):
                    rcfg_train = rcfg_train._replace(ragged_budget=newb)
                    for lg in loggers:
                        lg.log_event("ragged_rebudget", str(newb))
                    print(f"ragged need tables (epoch-{epoch} retune): "
                          f"shared budget {newb} rows/tile")
                    rebuild = True
                log_fairness(need_banks, rcfg_train.ragged_budget)
                if rebuild:
                    step, place_subject, _ = build_step(rcfg_train)
            else:
                new_tiers = tune_pooled(state)
                if new_tiers != rcfg_train.tiers:
                    rcfg_train = rcfg_train._replace(tiers=new_tiers)
                    for lg in loggers:
                        lg.log_event("auto_cascade_retuned", str(new_tiers))
                    print(f"auto_cascade (multi, epoch-{epoch} retune): {new_tiers}")
                    step, place_subject, _ = build_step(rcfg_train)

        if (epoch > saving_epochs[0]) and epoch % cfg0.model.save_epoch == 0:
            print(f"[Epoch {epoch}] saving {S} subject checkpoints")
            ckpt.save_stacked_checkpoint(model_paths, epoch, state, frame_counts)
        if done:
            break

    ckpt.save_stacked_checkpoint(model_paths, min(epoch, opt.epochs), state, frame_counts)
    for logger in loggers:
        logger.close()
    return state
