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
                  with_overflow: bool = False, raster_override=None):
    """Returns render(params, batch_stats, batch, iteration=...). Stage-1
    models render from a precomputed canonical-gaussian cache (the decoder is
    pose-independent); stage 2 runs the full decode per frame.
    `with_overflow=True` makes the renderer return (image, overflow) —
    eval.py records it so quality numbers always say whether the capacity
    cascade truncated anything. `raster_override` replaces the config-derived
    RasterizeConfig (the auto-tuned cascade path)."""
    cfg, bundle = inf.cfg, inf.bundle
    rcfg = raster_override if raster_override is not None else raster_config(cfg)
    bg = (1.0, 1.0, 1.0) if cfg.model.white_background else (0.0, 0.0, 0.0)
    if cfg.model.train_stage == 1:
        cache = precompute_canonical(
            bundle.net, bundle.assets, inf.state.params, inf.state.batch_stats
        )
        cached = make_cached_render_fn(
            bundle.net, bundle.body_model, bundle.assets,
            height, width, bg, rcfg, with_overflow=with_overflow,
        )

        def render(params, batch_stats, batch, *a, **kw):
            return cached(cache, params, batch, *a, **kw)

        return render
    return make_render_fn(
        bundle.net, bundle.body_model, bundle.assets,
        height, width, bg, rcfg, with_overflow=with_overflow,
    )


def make_counts_fn(bundle: AvatarBundle, height: int, width: int, rcfg,
                   probe_capacity: int = 0, cand_m: int = 0):
    """Jitted cascade-tuner probe: decode the avatar on a batch, run the
    binning, and return per-tile load histograms. With `probe_capacity=0`
    returns only the TRUE per-tile counts (BinContext.full_counts); with
    `probe_capacity>0` runs the saturation probe (one deep blend pass,
    rasterize_tile.probe_tile_depths) and returns (counts, NEEDED depths)
    — the depth at which CUDA-parity early termination stopped consuming
    gaussians, the histogram the tuner should size TRAIN/EVAL capacities
    from. `rcfg` supplies tile_size and max_tiles_per_gaussian, so the
    probe sees the same pair enumeration the real render/train step will.

    `cand_m > 0` appends (dropped_pairs, total_pairs) for a CANDIDATE
    footprint cap of cand_m tiles/gaussian on the same batch — the
    adaptive-footprint decision input (loop.py shrinks the train footprint
    to the render profile once the cap would clip ~nothing)."""
    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_tile import (
        _bin_gaussians, footprint_drop, probe_tile_depths,
    )
    from gaussianavatar_tpu.engine.train_step import _forward_gaussians

    ts = rcfg.tile_size
    MW = int(np.sqrt(rcfg.max_tiles_per_gaussian))

    @jax.jit
    def counts(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        world, shs, scales3, rotations, opacity, _, _ = _forward_gaussians(
            bundle.net, variables, bundle.body_model, bundle.assets, batch,
            jnp.int32(10_000_000), False, False,
        )
        B, N = world.shape[:2]
        if rotations.ndim == 2:
            rotations = jnp.broadcast_to(rotations[None], (B,) + rotations.shape)
        opac = opacity.reshape(-1, N)
        if opac.shape[0] == 1:
            opac = jnp.broadcast_to(opac, (B, N))
        projs = jax.vmap(
            lambda m, s, r, wvt, fpt, tx, ty: project_gaussians(
                m, s, r, wvt, fpt, tx, ty, height, width
            )
        )(world, scales3, rotations, batch["world_view_transform"],
          batch["full_proj_transform"], batch["tan_fovx"], batch["tan_fovy"])
        extra = ()
        if cand_m > 0:
            extra = footprint_drop(projs, opac, height, width, ts, cand_m)
        if probe_capacity > 0:
            return probe_tile_depths(projs, shs, opac, height, width, rcfg,
                                     probe_capacity) + extra
        ctx = _bin_gaussians(projs, shs, opac, height, width, ts, MW, MW)
        return (ctx.full_counts,) + extra if extra else ctx.full_counts

    return counts


# deep-pass capacity of the saturation probe: bounds both the probe's own
# cost and the largest tier the tuner can hand back
PROBE_CAPACITY = 4096


def autotune_raster(inf: InferenceBundle, height: int, width: int, batch):
    """One-shot cascade auto-tune (RasterParams.auto_cascade): run the
    saturation probe on a batch, read the per-tile NEEDED-depth histogram
    (where CUDA-parity early termination actually stops), and derive the
    capacity tiers from it (ops/cascade.tune_tiers) instead of the
    hand-swept defaults. Returns the RasterizeConfig to pass as
    `make_renderer(..., raster_override=...)`."""
    from gaussianavatar_tpu.ops.cascade import tune_tiers

    rcfg = raster_config(inf.cfg)
    counts = make_counts_fn(inf.bundle, height, width, rcfg,
                            probe_capacity=PROBE_CAPACITY)
    cnts, needed = counts(inf.state.params, inf.state.batch_stats, batch)
    # 1.25x margin: the probe batch is a handful of frames; unseen poses
    # shift tile loads a little (overflow stays reported regardless).
    # order_by: runtime tier assignment ranks tiles by binned count
    tiers = tune_tiers(np.asarray(needed), margin=1.25,
                       max_capacity=PROBE_CAPACITY,
                       order_by=np.asarray(cnts))
    return rcfg._replace(tiers=tiers)


def ragged_probe_setup(inf: InferenceBundle, height: int, width: int,
                       override=None):
    """Probe-exact rendering (`--ragged_eval`, shared by eval and the
    novel-pose/novel-view CLIs): returns (raster_override, counts_probe).
    Per batch, run `counts_probe` and feed the NEEDED depths as
    `batch["tile_caps"]` — each tile then blends exactly the ranks the
    uncapped CUDA rasterizer's early termination would touch
    (/root/reference/gaussian_renderer/__init__.py:40-48), measured
    bit-identical to a genuinely uncapped deep render on the canonical
    checkpoint (BASELINE.md round-4 truncation fidelity). The probe doubles
    the render work; offline rendering trades that for exactness."""
    base_rcfg = override if override is not None else raster_config(inf.cfg)
    override = base_rcfg._replace(ragged=True, tiers=())
    counts_probe = make_counts_fn(inf.bundle, height, width, override,
                                  probe_capacity=PROBE_CAPACITY)
    return override, counts_probe


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
