"""Training loop — reference train.py:22-132 parity on top of the fused step:
two-stage flow, per-epoch regularizer decay (0.85 every 20 epochs), epoch
gates for pose optimization and LPIPS, EMA progress logging, periodic PLY/PNG
debug dumps, checkpoint cadence (plus a guaranteed final-epoch save the
reference forgets: 200 % 30 != 0, train.py:130)."""

from __future__ import annotations

import os
import time
from os.path import join
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.config import Config
from gaussianavatar_tpu.data.dataset import BatchLoader
from gaussianavatar_tpu.engine import checkpoint as ckpt
from gaussianavatar_tpu.engine.logging_utils import MetricsLogger
from gaussianavatar_tpu.engine.optim import build_optimizer
from gaussianavatar_tpu.engine.setup import AvatarBundle, setup_avatar
from gaussianavatar_tpu.engine.train_step import (
    TrainState,
    init_state,
    make_debug_points_fn,
    make_train_step,
    make_train_step_scan,
)
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
from gaussianavatar_tpu.utils.obj_io import save_ply_points


def adjust_loss_weights(init_weight, current_epoch, mode="decay", start=0, every=20):
    """reference utils/general_utils.py:261-280."""
    if current_epoch < start:
        return init_weight * (1e-6 if mode == "rise" else 1.0)
    if every == 0:
        return init_weight
    factor = 1.05 if mode == "rise" else 0.85
    return init_weight * factor ** ((current_epoch - start) // every)


def pose_opt_gate_value(train_stage: int, epoch: int, opt) -> float:
    """Stage-1 per-frame pose refinement is epoch-gated (the reference
    compares pose_op_start_iter against EPOCH, avatar_model.py:262,269)."""
    return float(train_stage == 1 and epoch > opt.pose_op_start_iter)


def lpips_gate_value(lpips_active: bool, epoch: int, opt) -> float:
    """The 0.2*LPIPS term joins the loss after lpips_start_iter epochs
    (reference train.py:89-91: `if epoch > 30`)."""
    return float(lpips_active and epoch > opt.lpips_start_iter)


def device_prefetch(feed_iter, depth: int = 2, sharding=None):
    """Device-side double buffering: `jax.device_put` batch t+1 while step t
    runs. Transfers are async, so keeping `depth` batches in flight overlaps
    the host->device copy (the tunnel's dominant per-step latency) with
    compute instead of serializing it into each dispatch. With `sharding`
    every array leaf is placed with it (the --dp path shards the leading
    batch axis across the mesh)."""
    import collections

    put = (lambda f: jax.device_put(f, sharding)) if sharding is not None else jax.device_put
    q = collections.deque()
    for feed in feed_iter:
        q.append(put(feed))
        if len(q) > depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def save_image_grid(path: str, images: np.ndarray):
    """(B, 3, H, W) in [0,1] -> horizontal grid PNG."""
    from PIL import Image

    arr = np.clip(np.asarray(images), 0, 1)
    arr = (arr.transpose(0, 2, 3, 1) * 255).astype(np.uint8)
    grid = np.concatenate(list(arr), axis=1)
    Image.fromarray(grid).save(path)


def raster_config(cfg: Config, train: bool = False) -> RasterizeConfig:
    """train=True selects the leaner heavy tier for the fused train step
    (see RasterParams.train_tile_capacity_hi); eval/render keep the
    fidelity-tuned cascade."""
    r = cfg.raster
    render_M = int(getattr(r, "render_max_tiles_per_gaussian", 0)) or r.max_tiles_per_gaussian
    return RasterizeConfig(
        tile_size=r.tile_size,
        tile_capacity=r.tile_capacity,
        max_tiles_per_gaussian=r.max_tiles_per_gaussian if train else render_M,
        backend=r.backend,
        tile_capacity_hi=getattr(r, "train_tile_capacity_hi", r.tile_capacity_hi)
        if train else r.tile_capacity_hi,
        heavy_fraction=getattr(r, "train_heavy_fraction", r.heavy_fraction)
        if train else r.heavy_fraction,
        sort_stable=bool(getattr(r, "sort_stable", 1)) if train
        else bool(getattr(r, "render_sort_stable", 1)),
        gather_flat=bool(getattr(r, "gather_flat", 0)),
        gather_window=bool(getattr(r, "gather_window", 0)),
        # ragged is a TRAIN-side knob: render/eval keep the cascade (novel
        # poses carry no cached per-tile need)
        ragged=bool(getattr(r, "ragged", 0)) if train else False,
        ragged_chunk=int(getattr(r, "ragged_chunk", 128) or 128),
        ragged_budget=int(getattr(r, "ragged_budget", 0) or 0),
        blend_vec=bool(getattr(r, "blend_vec", 0)),
    )


def train(
    cfg: Config,
    saving_epochs: Sequence[int],
    checkpoint_epochs: Sequence[int] = (),
    lpips_fn=None,
    max_steps: Optional[int] = None,
    lpips_note: Optional[str] = None,
    dp: int = 1,
) -> TrainState:
    """`dp > 1` trains data-parallel over frames: the global batch is sharded
    across a `dp`-device mesh (params/assets replicated, gradients psum-reduced
    over ICI by the XLA partitioner — equivalence with the unsharded step is
    proven in tests/test_frame_dp.py). NEW capability over the strictly
    single-GPU reference (SURVEY.md §2.4)."""
    mp, opt = cfg.model, cfg.opt
    mesh = feed_sharding = None
    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from gaussianavatar_tpu.parallel import DATA_AXIS, make_mesh, replicate

        if mp.batch_size % dp:
            raise ValueError(
                f"--batch_size ({mp.batch_size}) must be a multiple of --dp ({dp})"
            )
        mesh = make_mesh(dp)
        feed_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        stack_sharding = NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))
        repl_sharding = NamedSharding(mesh, PartitionSpec())
        print(f"data-parallel: batch {mp.batch_size} sharded over {dp} devices")
    os.makedirs(join(mp.model_path, "log"), exist_ok=True)
    cfg.save(join(mp.model_path, "cfg_args.json"))
    logger = MetricsLogger(mp.model_path)
    from gaussianavatar_tpu.ops.lpips import lpips_status

    # run-fact for metrics.jsonl: "active" only when the term is actually in
    # the loss; a caller-supplied note (e.g. "disabled (--no_lpips)") wins
    # over re-probing the filesystem, which would claim "active" for weights
    # the user explicitly turned off
    logger.log_event(
        "lpips",
        "active" if lpips_fn is not None
        else (lpips_note or lpips_status(mp.project_path)),
    )

    bundle: AvatarBundle = setup_avatar(cfg, train=True)
    loader = BatchLoader(bundle.train_dataset, mp.batch_size, shuffle=True)
    steps_per_epoch = len(loader)

    probe = bundle.train_dataset[0]
    H, W = int(probe["height"]), int(probe["width"])
    bg = (1.0, 1.0, 1.0) if mp.white_background else (0.0, 0.0, 0.0)

    class _TX0:
        def init(self, p):
            return None

    state = init_state(bundle.net, bundle.assets, _TX0(), batch_size=mp.batch_size)
    tx = build_optimizer(state.params, opt, steps_per_epoch, mp.train_stage)
    state = state.replace(opt_state=tx.init(state.params))

    epoch_start = 0
    if checkpoint_epochs:
        state = ckpt.load_checkpoint(mp.model_path, checkpoint_epochs[0], state)
        epoch_start = checkpoint_epochs[0]
    if mp.train_stage == 2:
        state = stage_load(state, mp.stage1_out_path)
    if mesh is not None:
        state = replicate(state, mesh)

    fix_inp = None
    if mp.train_stage == 2 and mp.fixed_inp:
        # reference fixed_inp: one static input posmap for every frame
        # (avatar_model.py:70-72): the canonical posmap at inp resolution
        path = os.path.join(
            mp.source_path, "train",
            f"query_posemap_{mp.inp_posmap_size}_cano_{mp.smpl_type}.npz",
        )
        fix_inp = np.load(path)["posmap" + str(mp.inp_posmap_size)].astype(np.float32)
        print(f"fixed_inp: using static posmap {path}")

    # --- Train-side cascade auto-tune (RasterParams.auto_cascade). The
    # hand-swept default cascade was tuned at the 256-query workload; at
    # other resolutions it can silently truncate a large share of
    # gaussian-tile pairs EVERY STEP (measured at 512-query: the converged
    # scene holds ~550k pairs/image with busy tiles 5-14k deep; the fixed
    # 128+768@.25 covers ~11%). Capacities are sized from the SATURATION
    # probe (per-tile depth where CUDA-parity early termination stops,
    # engine/inference.make_counts_fn) rather than raw counts: on a trained
    # avatar most binned pairs sit behind saturated transmittance, so the
    # needed depth is far cheaper than full coverage while giving exactly
    # the pairs (fwd AND bwd) the uncapped CUDA rasterizer would touch.
    # Opacity — hence saturation — evolves during training, so re-tune at
    # every save_epoch boundary and rebuild the compiled step when the
    # tiers move (capacities/fractions are quantized in tune_tiers to keep
    # most retunes program-identical).
    rcfg_train = raster_config(cfg, train=True)
    tune_now = None
    need_bank = None  # (F, T) int32 per-frame per-tile needed depths (ragged)
    build_need_bank = budget_for = None
    if (getattr(rcfg_train, "ragged", False)
            and not getattr(cfg.raster, "auto_cascade", 0)
            and not getattr(rcfg_train, "ragged_budget", 0)):
        print("WARNING: --ragged without --auto_cascade or --ragged_budget "
              "sizes the chunk grid for the worst case (every binned pair); "
              "at production scale pair --ragged 1 with --auto_cascade 1 "
              "(per-frame need table) or set --ragged_budget")
    if getattr(cfg.raster, "auto_cascade", 0):
        from gaussianavatar_tpu.engine.inference import (
            PROBE_CAPACITY, make_counts_fn,
        )
        from gaussianavatar_tpu.ops.cascade import tune_tiers

        # adaptive train footprint (ragged path): candidate M the probe
        # also evaluates a clip count for — see RasterParams docstring
        fp_full = int(rcfg_train.max_tiles_per_gaussian)
        fp_target = int(getattr(cfg.raster, "render_max_tiles_per_gaussian", 0) or 0)
        fp_adapt = (bool(getattr(cfg.raster, "train_footprint_adapt", 0))
                    and getattr(rcfg_train, "ragged", False)
                    and 0 < fp_target < fp_full)
        fp_eps = float(getattr(cfg.raster, "train_footprint_eps", 1e-3))

        def build_counts_fn(rc):
            return make_counts_fn(bundle, H, W, rc,
                                  probe_capacity=PROBE_CAPACITY,
                                  cand_m=fp_target if fp_adapt else 0)

        counts_fn = build_counts_fn(rcfg_train)

        def _probe_feed(pb):
            feed = {
                k: v for k, v in pb.items()
                if k not in ("FovX", "FovY", "height", "width",
                             "projection_matrix", "camera_center",
                             "original_image")
            }
            if fix_inp is not None:
                feed["inp_pos_map"] = np.broadcast_to(
                    fix_inp[None], (mp.batch_size,) + fix_inp.shape)
            elif "inp_pos_map" in feed and feed["inp_pos_map"].shape[1] == 3:
                feed["inp_pos_map"] = feed["inp_pos_map"].transpose(0, 2, 3, 1)
            return feed

        if getattr(rcfg_train, "ragged", False):
            # Ragged mode: instead of a global capacity cascade, maintain a
            # per-frame NEED table — each train frame's saturation probe
            # (the depth where CUDA-parity early termination stops per
            # tile). The step then blends exactly the ranks the uncapped
            # CUDA rasterizer would touch for ITS frames, with no tier
            # quantization or count-rank order premium. Probe feeds are
            # snapshotted now: after the GT bank is built the dataset stops
            # serving images/inp maps, but retunes still need every frame.
            from gaussianavatar_tpu.data.dataset import collate

            F = len(bundle.train_dataset)
            ts_r = rcfg_train.tile_size
            T_img = (-(-W // ts_r)) * (-(-H // ts_r))
            CBr = int(rcfg_train.ragged_chunk)
            probe_feeds = []
            for i in range(0, F, mp.batch_size):
                idxs = [(i + j) % F for j in range(mp.batch_size)]
                pb = collate([bundle.train_dataset[int(k)] for k in idxs])
                probe_feeds.append((idxs, _probe_feed(pb)))

            def build_need_bank(st, prev_caps=None, feeds=None):
                """-> (need bank (F, T) int32, candidate-footprint clip
                fraction over the probed frames — None without fp_adapt,
                measured drift — None without prev_caps, probed frame idxs).

                With `prev_caps` (the caps table this retune replaces) it
                also logs the measured NEED DRIFT: the fraction of
                contributing pairs whose raw need outgrew the previous caps
                during the window — i.e. what the margin failed to cover
                (pairs actually dropped just before this retune), the
                empirical justification for the ragged_margin value.

                With `feeds` (a subset of probe_feeds — the SAMPLED retune
                path) only those frames are re-probed; unprobed frames keep
                their previous caps, and the drift/clip fractions describe
                the probed subset."""
                nb = (np.array(prev_caps, np.int64) if prev_caps is not None
                      and feeds is not None else np.zeros((F, T_img), np.int64))
                got = np.zeros(F, bool)
                raw = np.zeros((F, T_img), np.int64)
                drop = tot = 0
                for idxs, feed in (probe_feeds if feeds is None else feeds):
                    out = counts_fn(st.params, st.batch_stats, feed)
                    needed = np.asarray(out[1]).reshape(mp.batch_size, T_img)
                    if fp_adapt:
                        drop += int(out[2])
                        tot += int(out[3])
                    for row, k in zip(needed, idxs):
                        if not got[k]:
                            raw[k] = row
                            got[k] = True
                probed = np.flatnonzero(got)
                drift = None
                if prev_caps is not None:
                    exceed = int(np.maximum(
                        raw[probed] - prev_caps[probed], 0).sum())
                    drift = exceed / max(int(raw[probed].sum()), 1)
                    scope = "" if feeds is None else f" ({len(probed)}/{F} frames sampled)"
                    logger.log_event("ragged_drift", f"{drift:.2e}{scope}")
                    print(f"ragged need drift since last retune: {drift:.2e} "
                          f"of contributing pairs outgrew the caps{scope}")
                # margin: saturation evolves between retunes and gradients
                # flow only through blended ranks (ragged_margin knob)
                m = float(getattr(cfg.raster, "ragged_margin", 1.5) or 1.5)
                nb[probed] = np.ceil(raw[probed] * m)
                nb = np.minimum(nb, PROBE_CAPACITY).astype(np.int32)
                return (nb, (drop / max(tot, 1) if fp_adapt else None),
                        drift, probed)

            def footprint_for(frac, cur_m):
                """Hysteresis M decision: shrink to the render footprint
                when the measured clip fraction is negligible, widen back
                past 3x the threshold (scene grew between retunes)."""
                if frac is None:
                    return cur_m
                if cur_m > fp_target and frac <= fp_eps:
                    return fp_target
                if cur_m < fp_full and frac >= 3.0 * fp_eps:
                    return fp_full
                return cur_m

            def budget_for(nb):
                # static chunk budget: the worst batch is the B chunk-
                # heaviest frames together; 15% headroom for drift
                ch = (-(-nb.astype(np.int64) // CBr)).sum(axis=1)  # (F,)
                top = int(np.sort(ch)[::-1][: mp.batch_size].sum())
                C = int(top * 1.15) + mp.batch_size
                C = -(-C // 256) * 256 if C >= 256 else -(-C // 8) * 8
                return int(np.ceil(C * CBr / (mp.batch_size * T_img)))

            need_bank, fp_frac, _, _ = build_need_bank(state)
            retune_idx = 0  # rotates the sampled-retune batch offset
            new_m = footprint_for(fp_frac, rcfg_train.max_tiles_per_gaussian)
            if new_m != rcfg_train.max_tiles_per_gaussian:
                rcfg_train = rcfg_train._replace(max_tiles_per_gaussian=new_m)
                counts_fn = build_counts_fn(rcfg_train)
                logger.log_event(
                    "footprint_adapt", f"M {new_m} clip_frac {fp_frac:.2e}")
                print(f"train footprint: M={new_m} "
                      f"(candidate clip fraction {fp_frac:.2e})")
            rcfg_train = rcfg_train._replace(ragged_budget=budget_for(need_bank))
            fp_note = "" if fp_frac is None else f" fp_clip {fp_frac:.2e}"
            logger.log_event(
                "ragged_need_bank",
                f"frames {F} budget {rcfg_train.ragged_budget} rows/tile"
                + fp_note)
            print(f"ragged need table: {F} frames, budget "
                  f"{rcfg_train.ragged_budget} rows/tile "
                  f"(mean need {need_bank.mean():.0f}{fp_note})")
        else:
            pb = next(iter(BatchLoader(bundle.train_dataset, mp.batch_size,
                                       shuffle=False)))
            probe_feed = _probe_feed(pb)

            def tune_now(st):
                cnts, needed = counts_fn(st.params, st.batch_stats, probe_feed)
                # 1.5x margin at train time: the scene keeps evolving between
                # retunes and gradients flow only through blended ranks.
                # order_by: the runtime hands tiers out by count rank, so the
                # needed-depth curve must be optimized in that order
                return tune_tiers(np.asarray(needed), margin=1.5,
                                  max_capacity=PROBE_CAPACITY,
                                  order_by=np.asarray(cnts))

            tiers = tune_now(state)
            rcfg_train = rcfg_train._replace(tiers=tiers)
            logger.log_event("auto_cascade", str(tiers))
            print(f"auto_cascade (train): tiers {tiers}")

    # Device-resident GT bank: upload every frame ONCE (uint8, lossless for
    # 8-bit PNG sources), gather by pose_idx inside the jitted step. The
    # per-step host->device payload drops from the full image batch to a few
    # KB — the win is dramatic on thin host links (axon tunnel: 10 MB/s
    # measured; streaming 512^2 GT capped training at ~8 it/s vs 22 fused).
    gt_bank = inp_bank = None
    n_frames = len(bundle.train_dataset)
    bank_mb = n_frames * 3 * H * W / 2**20
    if bool(getattr(mp, "cache_frames", 1)) and bank_mb <= 4096:
        # decode straight into the bank: the dataset's own frame cache would
        # hold a SECOND uint8 copy of every frame during this loop (peak host
        # memory doubled on long sequences), and the bank replaces it anyway
        bundle.train_dataset._cache_frames = False
        imgs = np.empty((n_frames, 3, H, W), np.uint8)
        inps = []
        for i in range(n_frames):
            item = bundle.train_dataset[i]
            imgs[i] = np.clip(np.rint(item["original_image"] * 255.0), 0, 255).astype(np.uint8)
            if "inp_pos_map" in item:
                pm = item["inp_pos_map"]
                inps.append(pm.transpose(1, 2, 0) if pm.shape[0] == 3 else pm)
        # dp: the bank is replicated; the per-shard pose_idx gather then keeps
        # the gathered GT sharded with the batch
        put = (lambda x: jax.device_put(x, repl_sharding)) if mesh is not None \
            else jax.device_put
        gt_bank = put(imgs)
        if fix_inp is not None:
            inp_bank = put(fix_inp[None])
        elif inps:
            inp_bank = put(np.stack(inps))
        print(f"GT bank on device: {n_frames} frames, {bank_mb:.0f} MB uint8")
        # the device bank is now the only GT consumer: stop the dataset from
        # decoding/caching frames per batch (pure host-side waste from here)
        bundle.train_dataset.drop_image_cache()
        if inp_bank is not None:
            bundle.train_dataset.include_inp = False

    aiap_nn = None
    if getattr(opt, "use_aiap", False):
        from gaussianavatar_tpu.ops.knn import host_knn

        pts = np.asarray(bundle.assets.query_points[: bundle.assets.num_valid])
        aiap_nn = jnp.asarray(host_knn(pts, k=5))
        print(f"AIAP regularizer on: {pts.shape[0]} points, k=5")

    spd = max(int(getattr(opt, "steps_per_dispatch", 1)), 1)

    def build_steps(rcfg):
        sf = make_train_step(
            bundle.net, bundle.body_model, bundle.assets, tx, opt,
            H, W, bg, rcfg, train_stage=mp.train_stage,
            lpips_fn=lpips_fn, aiap_nn=aiap_nn, gt_bank=gt_bank, inp_bank=inp_bank,
        )
        mf = None
        if spd > 1:
            mf = make_train_step_scan(
                bundle.net, bundle.body_model, bundle.assets, tx, opt,
                H, W, bg, rcfg, train_stage=mp.train_stage,
                lpips_fn=lpips_fn, aiap_nn=aiap_nn, gt_bank=gt_bank, inp_bank=inp_bank,
            )
        return sf, mf

    step_fn, multi_fn = build_steps(rcfg_train)

    debug_points = make_debug_points_fn(bundle.net, bundle.body_model, bundle.assets)

    first_iter = epoch_start * steps_per_epoch
    ema_loss = 0.0
    t_start = time.time()
    drop_keys = {"FovX", "FovY", "height", "width", "projection_matrix", "camera_center"}
    done = False

    for epoch in range(epoch_start + 1, opt.epochs + 1):
        w_rgl = adjust_loss_weights(opt.lambda_rgl, epoch, "decay", epoch_start, 20)
        pose_gate = pose_opt_gate_value(mp.train_stage, epoch, opt)
        lpips_gate = lpips_gate_value(lpips_fn is not None, epoch, opt)

        def make_feeds():
            for batch in loader:
                feed = {k: v for k, v in batch.items() if k not in drop_keys}
                if gt_bank is not None:
                    feed.pop("original_image", None)  # gathered on device
                if inp_bank is not None:
                    feed.pop("inp_pos_map", None)
                elif fix_inp is not None:
                    feed["inp_pos_map"] = np.broadcast_to(
                        fix_inp[None], (batch["pose_idx"].shape[0],) + fix_inp.shape
                    )
                elif "inp_pos_map" in feed and feed["inp_pos_map"].shape[1] == 3:
                    feed["inp_pos_map"] = feed["inp_pos_map"].transpose(0, 2, 3, 1)
                if need_bank is not None:
                    # per-frame per-tile needed depths -> the ragged
                    # rasterizer's caps (train_step reshapes to (B*T,))
                    feed["tile_caps"] = need_bank[batch["pose_idx"]]
                yield feed

        feed_iter = device_prefetch(make_feeds(), depth=2, sharding=feed_sharding)
        while True:
            # clamp the final group so max_steps is exact (with spd > 1 a full
            # dispatch group would overshoot by up to spd-1 optimizer steps);
            # a partial group falls through to the single-step path below
            target = spd if multi_fn is not None else 1
            if max_steps is not None:
                target = max(min(target, max_steps - first_iter), 1)
            feeds = []
            for feed in feed_iter:
                feeds.append(feed)
                if len(feeds) == target:
                    break
            if not feeds:
                break
            if multi_fn is not None and len(feeds) == spd:
                stacked = {k: jnp.stack([f[k] for f in feeds]) for k in feeds[0]}
                if mesh is not None:
                    # pin the (S, B, ...) layout to (replicated, dp): GSPMD's
                    # eager stack usually propagates this, but don't rely on it
                    stacked = jax.device_put(stacked, stack_sharding)
                state, terms_s, images = multi_fn(
                    state, stacked, jnp.float32(w_rgl), jnp.float32(pose_gate), jnp.float32(lpips_gate)
                )
                terms = {k: v[-1] for k, v in terms_s.items()}
                first_iter += spd
            else:
                for feed in feeds:
                    state, terms, images = step_fn(
                        state, feed, jnp.float32(w_rgl), jnp.float32(pose_gate), jnp.float32(lpips_gate)
                    )
                    first_iter += 1
            if first_iter <= epoch_start * steps_per_epoch + spd:
                jax.block_until_ready(terms["total"])
                t_start = time.time()  # exclude the first-step compile from it/s
            # fetch losses only on log steps: a per-step float() sync stalls
            # the async dispatch pipeline (~4x wall slowdown over the tunnel)
            if first_iter % 10 < spd or first_iter <= epoch_start * steps_per_epoch + spd:
                loss = float(terms["total"])
                ema_loss = 0.4 * loss + 0.6 * ema_loss if ema_loss else loss
                dt = time.time() - t_start
                steps_done = max(first_iter - epoch_start * steps_per_epoch - 1, 1)
                print(f"iter {first_iter} epoch {epoch} loss {ema_loss:.5f} ({steps_done / max(dt, 1e-9):.2f} it/s)")
                logger.log(first_iter, {**{k: float(v) for k, v in terms.items()},
                                        "iter_time": dt / max(first_iter - epoch_start * steps_per_epoch, 1)})
            # fire when a log boundary falls inside this dispatch group (with
            # spd > 1, first_iter advances in strides of spd and would never
            # hit the boundary exactly)
            if (first_iter - 1) % opt.log_iter < spd:
                save_image_grid(join(mp.model_path, "log", f"{first_iter:05d}_pred.png"), np.asarray(images))
                if gt_bank is not None:
                    gt_png = np.asarray(gt_bank[feeds[-1]["pose_idx"]]).astype(np.float32) / 255.0
                else:
                    gt_png = np.asarray(feeds[-1]["original_image"])
                save_image_grid(join(mp.model_path, "log", f"{first_iter:05d}_gt.png"), gt_png)
                # posed point-cloud dump (reference train.py:106-111)
                if debug_points is not None:
                    dbg = dict(feeds[-1])
                    if inp_bank is not None:
                        ii = dbg["pose_idx"] * 0 if inp_bank.shape[0] == 1 else dbg["pose_idx"]
                        dbg["inp_pos_map"] = inp_bank[ii]
                    pts = np.asarray(debug_points(state.params, state.batch_stats, dbg))
                    save_ply_points(join(mp.model_path, "log", f"pred_{first_iter:05d}.ply"), pts)
            if max_steps is not None and first_iter >= max_steps:
                done = True
                break

        if (tune_now is not None or need_bank is not None) and not done and (
            epoch == epoch_start + 1 or epoch % mp.save_epoch == 0
        ):
            # re-tune after the warm-up epoch and at every save boundary:
            # opacities (hence saturation depths) evolve during training.
            # Only a tier CHANGE costs a recompile — tune_tiers quantizes
            # capacities/fractions so consecutive retunes usually agree,
            # and the persistent XLA cache makes repeats across runs free.
            if need_bank is not None:
                # Sampled retune fast path: probe every retune_sample-th
                # probe batch (rotating offset so successive retunes cover
                # different frames) and skip the full-dataset probe + any
                # rebudget/recompile when the sample shows (a) drift within
                # retune_drift_eps, (b) the footprint decision unchanged,
                # and (c) the merged-table budget inside the 10% shrink
                # hysteresis and not above the current budget. Probed
                # frames still adopt their fresh caps (caps are data — no
                # recompile). The epoch-1 retune always probes fully: it
                # sizes the grid for the transparency-deep warm-up scene.
                ns = int(getattr(cfg.raster, "retune_sample", 0) or 0)
                sampled_ok = False
                if ns >= 2 and epoch != epoch_start + 1 \
                        and len(probe_feeds) > ns:
                    sub = probe_feeds[retune_idx % ns::ns]
                    nb_s, fp_s, drift_s, _ = build_need_bank(
                        state, prev_caps=need_bank, feeds=sub)
                    newb_s = budget_for(nb_s)
                    d_eps = float(getattr(
                        cfg.raster, "retune_drift_eps", 2e-2))
                    cur_b = rcfg_train.ragged_budget
                    if (drift_s is not None and drift_s <= d_eps
                            and footprint_for(
                                fp_s, rcfg_train.max_tiles_per_gaussian)
                            == rcfg_train.max_tiles_per_gaussian
                            and cur_b * 0.9 <= newb_s <= cur_b):
                        need_bank = nb_s
                        sampled_ok = True
                        logger.log_event(
                            "retune_sampled",
                            f"epoch {epoch} drift {drift_s:.2e} "
                            f"budget {newb_s}/{cur_b}")
                        print(f"retune (epoch {epoch}): sampled probe clean"
                              f" (drift {drift_s:.2e}, budget {newb_s} in "
                              f"[{int(cur_b*0.9)}, {cur_b}]) — full probe "
                              f"skipped")
                retune_idx += 1
            if need_bank is not None and not sampled_ok:
                need_bank, fp_frac, _, _ = build_need_bank(
                    state, prev_caps=need_bank)
                newb = budget_for(need_bank)
                rebuild = False
                # adaptive footprint: once the probe shows the render-profile
                # cap (M=4) would clip ~nothing of this scene, train with it
                # — 2.25x fewer binning keys (measured -11% raster step,
                # BASELINE.md round-4). The probe ran at the OLD M; pair
                # enumeration only shrinks with M, so the measured clip
                # fraction is exact for the shrink direction.
                new_m = footprint_for(fp_frac, rcfg_train.max_tiles_per_gaussian)
                if new_m != rcfg_train.max_tiles_per_gaussian:
                    rcfg_train = rcfg_train._replace(max_tiles_per_gaussian=new_m)
                    counts_fn = build_counts_fn(rcfg_train)
                    logger.log_event(
                        "footprint_adapt", f"M {new_m} clip_frac {fp_frac:.2e}")
                    print(f"train footprint (epoch-{epoch} retune): M={new_m} "
                          f"(candidate clip fraction {fp_frac:.2e})")
                    rebuild = True
                # caps are data (no recompile); a budget CHANGE rebuilds the
                # compiled step. Growth applies immediately (correctness
                # headroom); shrink only past a 10% hysteresis so converged-
                # need jitter doesn't thrash recompiles. Shrinks matter: the
                # epoch-1 retune sizes the grid for the transparency-deep
                # warm-up scene (1472 rows/tile at the canonical campaign vs
                # ~700 converged need), and holding that grid pays ~2x the
                # necessary gather/blend/grad rows every step for the other
                # 199 epochs; one recompile per save boundary is amortized
                # by the persistent XLA cache (BASELINE.md round-4).
                if newb > rcfg_train.ragged_budget or newb < int(
                        rcfg_train.ragged_budget * 0.9):
                    rcfg_train = rcfg_train._replace(ragged_budget=newb)
                    logger.log_event("ragged_rebudget", str(newb))
                    print(f"ragged need table (epoch-{epoch} retune): "
                          f"budget {newb} rows/tile")
                    rebuild = True
                if rebuild:
                    step_fn, multi_fn = build_steps(rcfg_train)
            elif need_bank is None:
                new_tiers = tune_now(state)
                if new_tiers != rcfg_train.tiers:
                    rcfg_train = rcfg_train._replace(tiers=new_tiers)
                    logger.log_event("auto_cascade_retuned", str(new_tiers))
                    print(f"auto_cascade (train, epoch-{epoch} retune): {new_tiers}")
                    step_fn, multi_fn = build_steps(rcfg_train)

        if (epoch > saving_epochs[0]) and epoch % mp.save_epoch == 0:
            print(f"[Epoch {epoch}] saving model")
            ckpt.save_checkpoint(mp.model_path, epoch, state)
        if done:
            break

    ckpt.save_checkpoint(mp.model_path, min(epoch, opt.epochs), state)
    logger.close()
    return state


def stage_load(state: TrainState, stage1_path: str) -> TrainState:
    """Boot stage 2 from a stage-1 checkpoint directory
    (AvatarModel.stage_load, avatar_model.py:210-221): copy net/geo_feature/
    pose/transl params; pose_encoder keeps its fresh init."""
    from flax import serialization

    path = join(stage1_path, ckpt.CKPT_NAME)
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = dict(state.params)
    for key in ("pop", "geo_feature", "pose_embedding", "transl_embedding"):
        if key in raw["params"]:
            params[key] = jax.tree.map(jnp.asarray, raw["params"][key])
    bs = raw.get("batch_stats", state.batch_stats)
    new_bs = dict(state.batch_stats)
    if isinstance(bs, dict) and "pop" in bs:
        new_bs["pop"] = jax.tree.map(jnp.asarray, bs["pop"])
    return state.replace(params=params, batch_stats=new_bs)
