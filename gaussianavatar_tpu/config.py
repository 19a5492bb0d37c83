"""Typed configuration with CLI parity to the reference argparse groups
(/root/reference/arguments/__init__.py:55-144). Same flag names, same
defaults, same `-s`/`-m` shorthands, same cfg_args save/merge behavior —
but as plain dataclasses serialized to JSON instead of eval()'d Namespaces.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


def smpl_canonical_pose() -> np.ndarray:
    """Canonical pose for SMPL: legs splayed +-30 deg (hip z rotations).
    Matches reference arguments/__init__.py:51-53."""
    leg_angle = 30.0
    cpose = np.zeros(72, dtype=np.float32)
    cpose[5] = leg_angle / 180.0 * math.pi
    cpose[8] = -leg_angle / 180.0 * math.pi
    return cpose


def smplx_canonical_pose() -> np.ndarray:
    """Canonical pose for SMPL-X (165-dim full pose), reference :45-47."""
    leg_angle = 30.0
    cpose = np.zeros(165, dtype=np.float32)
    cpose[5] = leg_angle / 180.0 * math.pi
    cpose[8] = -leg_angle / 180.0 * math.pi
    return cpose


@dataclass
class ModelParams:
    source_path: str = ""          # -s
    model_path: str = ""           # -m
    project_path: str = field(default_factory=os.getcwd)
    smpl_model_path: str = ""      # defaults to <project>/assets/smpl_files/smpl
    smplx_model_path: str = ""
    test_folder: str = ""          # defaults to <project>/assets/test_pose
    stage1_out_path: str = ""
    save_epoch: int = 30
    train_stage: int = 1
    dataset_type: str = "peeplesnapshot"
    smpl_gender: str = "neutral"
    smpl_type: str = "smpl"
    no_mask: int = 0
    fixed_inp: int = 0
    train_mode: int = 0
    cam_static: int = 1
    cache_frames: int = 1  # RAM-cache decoded frames (uint8, ~6.2MB per 1080p
                           # frame, capped at 4 GiB) + device GT bank in train
    white_background: bool = True  # -w
    bullet_pose_list: List[int] = field(default_factory=lambda: [112, 217, 755])
    batch_size: int = 2
    query_posmap_size: int = 512
    inp_posmap_size: int = 128

    def __post_init__(self):
        if not self.smpl_model_path:
            self.smpl_model_path = os.path.join(self.project_path, "assets/smpl_files/smpl")
        if not self.smplx_model_path:
            self.smplx_model_path = os.path.join(self.project_path, "assets/smpl_files/smplx")
        if not self.test_folder:
            self.test_folder = os.path.join(self.project_path, "assets/test_pose")


@dataclass
class NetworkParams:
    c_pose: int = 64
    c_geom: int = 64
    hsize: int = 128
    nf: int = 32
    up_mode: str = "upconv"
    use_dropout: int = 0
    pos_encoding: int = 0
    num_emb_freqs: int = 6
    posemb_incl_input: int = 0
    geom_layer_type: str = "conv"
    gaussian_kernel_size: int = 5
    # run the ShapeDecoder matmuls AND inter-layer activations (BatchNorm
    # normalize + softplus) in bf16; params and the BN mean/var statistics
    # stay f32 (models/decoder.py). Default ON since round 5: measured
    # 1.63x the decoder fwd+bwd at the canonical MLP shape
    # (scripts/decoder_bench.py), quality-gated by a full 200-epoch
    # canonical campaign (docs/campaigns/qgbf512: 43.25 PSNR endpoint,
    # tail-mean 43.12 +/- 0.28 dB — in-family with the four f32-decoder
    # campaigns at 43.2-43.7). `--bf16_decoder 0` restores the
    # bit-identical-to-reference f32 program.
    bf16_decoder: int = 1
    # 1 = ShapeDecoderFused: fold BatchNorm into the Dense matmuls with
    # analytically-computed batch statistics (one (C,C) stats matmul per
    # stage instead of reducing over the materialized pre-activation), fuse
    # the activation into the matmul epilogue, and recompute its backward
    # from the output. ~3 HBM passes per stage vs ~5 — the decoder is
    # activation-bandwidth-bound (BASELINE.md round-4/5). Float-tolerance
    # vs the reference stage, identical param pytree (checkpoints
    # interoperate). Composes with bf16_decoder.
    fused_decoder: int = 0


@dataclass
class OptimizationParams:
    epochs: int = 200
    lambda_dssim: float = 0.2
    lambda_scale: float = 3e-2
    lambda_lpips: float = 0.2
    lambda_aiap: float = 0.1
    lambda_pose: float = 10.0
    lambda_rgl: float = 1e1
    log_iter: int = 2000
    lpips_start_iter: int = 30      # epoch-gated, like the reference (train.py:89)
    pose_op_start_iter: int = 1800  # epoch-gated, like the reference (avatar_model.py:262)
    lr_net: float = 3e-3
    lr_geomfeat: float = 5e-4
    lr_pose: float = 5e-3           # SparseAdam lr (avatar_model.py:113)
    steps_per_dispatch: int = 8     # lax.scan S optimizer steps per device
                                    # dispatch; same trajectory as sequential
                                    # steps (tests/test_train_step.py). With
                                    # the GT bank the per-step feed is a few
                                    # KB, so dispatch latency dominates:
                                    # measured 14.6 -> 19.5 it/s wall @512^2
                                    # going 1 -> 8. Logging granularity
                                    # becomes S steps; set 1 to disable.
    sched_milestones: List[int] = field(default_factory=list)
    # The reference calls MultiStepLR.step() per ITERATION with epoch-unit
    # milestones (avatar_model.py:267 + arguments:142) so the LR actually
    # decays after 66/133 iterations; `sched_unit='iteration'` replicates that
    # effective behavior. Set 'epoch' for the (likely intended) schedule.
    sched_unit: str = "iteration"
    use_aiap: bool = False          # AIAP regularizer (dead code in reference)

    def __post_init__(self):
        if not self.sched_milestones:
            self.sched_milestones = [self.epochs // 3, self.epochs * 2 // 3]


@dataclass
class RasterParams:
    """TPU rasterizer knobs (new; no reference analog)."""
    tile_size: int = 32                 # pixels per tile side (VPU-native 32x32=8x128)
    tile_capacity: int = 128            # base max gaussians blended per tile (depth-first)
    max_tiles_per_gaussian: int = 9     # static cap on tile footprint during binning
                                        # (3x3 tiles = 96px span at ts=32; cuts the
                                        # binning sort 30%; any cut pairs are counted
                                        # in the reported overflow)
    backend: str = "auto"               # auto | pallas | xla | brute
    # two-tier default (measured round 2, v5e @512^2): 128+768@0.25 renders
    # 99.9 FPS at 23.6 dB-vs-deep truncation fidelity vs the old single-tier
    # 512 at 72.5 FPS / 19.0 dB — faster AND closer to the uncapped CUDA
    tile_capacity_hi: int = 768         # two-tier: extra depth ranks for busy tiles
    heavy_fraction: float = 0.25        # fraction of tiles granted the hi capacity
    # Optional train-only heavy-tier override. A leaner train tier was
    # measured (640@.125: 48.6 -> 41.5 ms/step, +17% it/s) and REJECTED:
    # converged held-out PSNR dropped 31.9 -> 29.0 (controls: cap 768->640
    # costs ~2 dB, fraction .25->.125 costs ~0.8 dB — gradient fidelity in
    # busy tiles matters; see BASELINE.md). Defaults equal the render tier.
    train_tile_capacity_hi: int = 768
    train_heavy_fraction: float = 0.25
    # binning-sort stability (1 = ties blend in gaussian-index order, CUDA
    # radix parity; 0 = ~35% faster unstable sort, deterministic-but-
    # arbitrary tie order). Training keeps 1; render/eval flip to 0 via
    # render_sort_stable after the trained-avatar fidelity probe measured
    # the fast profile bit-comparable to the deep render (BASELINE.md).
    sort_stable: int = 1
    render_sort_stable: int = 0
    # render-side gaussian footprint cap (0 = same as max_tiles_per_gaussian).
    # Trained-avatar gaussians are ~1cm: spans beyond 2x2 tiles are rare, so
    # the render path halves the binning sort with M=4 (179 vs 130 FPS).
    render_max_tiles_per_gaussian: int = 4
    # 1 = derive the capacity cascade from the scene's own per-tile load
    # histogram at CLI startup (ops/cascade.tune_tiers) instead of the
    # hand-swept tile_capacity/_hi defaults — eval/render CLIs only
    auto_cascade: int = 0
    # 1 = gather per-tile parameter slabs as dense 16-element slices from the
    # flat view of the packed table. 1/8 the HBM bytes of the lane-padded row
    # gather but measured 17x SLOWER (XLA TPU serializes that gather form) —
    # keep 0; knob retained as the measured record (BASELINE.md round 3)
    gather_flat: int = 0
    # 1 = permute the packed table into sorted order once per render, then
    # build each tile's slab as ONE contiguous compact window of its flat
    # view (vs one lane-padded row gather per rank — 8x the bytes, random
    # order). Bit-exact forward; see BASELINE.md round-3 gather experiments
    # for the measured verdict
    gather_window: int = 0
    # 1 = TRAIN with the ragged slot-stream rasterizer (ops/rasterize_ragged):
    # per-tile data-dependent capacities instead of capacity tiers. With
    # auto_cascade=1 the loop maintains a per-frame NEED table (saturation
    # probe over every train frame, refreshed at save boundaries) and feeds
    # each step exactly its frames' needed depths — the pairs the uncapped
    # CUDA rasterizer would blend, with no tier quantization or count-rank
    # order premium. Render/eval keep the cascade (novel poses have no
    # cached need).
    ragged: int = 0
    ragged_chunk: int = 128   # rows per Pallas grid step (ragged backend)
    # static chunk budget, avg rows/tile (0 = auto: sized from the need
    # table with headroom when auto_cascade, else worst case)
    ragged_budget: int = 0
    # headroom multiplier on the per-frame needed depths (the scene keeps
    # evolving between save-boundary retunes; gradients only flow through
    # blended ranks). Rows scale with it: 1.5 costs ~50% over exact need
    ragged_margin: float = 1.5
    # Adaptive TRAIN footprint (ragged + auto_cascade retunes only): shrink
    # max_tiles_per_gaussian to the render profile's
    # render_max_tiles_per_gaussian at a save-boundary retune once the
    # probe measures the smaller cap would clip <= train_footprint_eps of
    # the batch's binned pairs (grow back past 3x eps). Warm-up-scale
    # gaussians span many tiles and need the wide footprint for full
    # gradients; converged avatar gaussians are ~1cm and a 2x2 32px-tile
    # footprint clips nothing — while cutting the binning key count 2.25x
    # (measured: 95.2 -> 84.3 ms raster fwd+bwd at the converged canonical
    # workload, BASELINE.md round-4). Any clipped pair still lands in the
    # reported overflow.
    train_footprint_adapt: int = 1
    train_footprint_eps: float = 1e-3
    # Sampled save-boundary retunes (ragged + auto_cascade): probe every
    # N-th probe batch first (rotating offset) and SKIP the full-dataset
    # saturation probe + any rebudget/recompile when the sampled drift is
    # <= retune_drift_eps, the footprint decision is unchanged, and the
    # sampled chunk cost moved < 10% (the budget hysteresis). Retunes cost
    # ~48 s each at the canonical campaign (48-frame probes + recompiles,
    # ~430 s across 9 retunes — BASELINE.md round-4); converged-scene
    # retunes measure drift ~0, so most become a cheap sample. The first
    # (epoch-1) retune always probes fully. 0/1 = always full probe.
    retune_sample: int = 6
    retune_drift_eps: float = 2e-2
    # 1 = eval.py probes each eval batch's saturation depths and renders
    # ragged with caps = exactly those depths: CUDA-exact coverage (every
    # contributing pair blended) at the minimum possible slab cost. The
    # probe doubles eval render work — eval is offline, exactness wins
    ragged_eval: int = 0
    # 1 = row-VECTORIZED blend kernels (ops/blend_vec): whole 128-row chunks
    # computed at once with the transmittance chain as a 7-step scan, vs the
    # sequential kernels' one-row-at-a-time walk. Identical gating semantics
    # (1/255 floor, 0.99 clamp, 1e-4 termination); results agree to float
    # tolerance, not bit-exactly (tree-reassociated products/sums) — the
    # sequential kernels stay as the CUDA-parity bit-exactness lock
    # (blend_vec=0 restores them). Default ON: measured 1.42-1.50x on the
    # canonical ragged train step and 1.32x on the render forward (v5e,
    # BASELINE.md round-4 "row-vectorized blend"), quality-gated by a full
    # canonical campaign.
    blend_vec: int = 1


# The fixed swept cascade (tile_capacity/_hi defaults above) was tuned and
# quality-validated at the 256-query workload. At the reference's canonical
# 512-query default (/root/reference/arguments/__init__.py:87) it drops ~89%
# of contributing gaussian-tile pairs EVERY STEP and converges ~16 dB low
# (27.2 vs 43.2 held-out PSNR — BASELINE.md rounds 3-4), while the uncapped
# CUDA rasterizer it replaces never truncates
# (/root/reference/gaussian_renderer/__init__.py:40-48). Training above the
# sweep point therefore defaults to the campaign-validated ragged
# need-table path (four 200-epoch canonical campaigns at 43.2-43.7 PSNR).
SWEPT_CASCADE_MAX_QUERY = 256


def resolve_train_raster_defaults(cfg: "Config", args: Optional[Namespace] = None):
    """Apply the quality-correct TRAIN defaults for the workload and return
    human-readable notes. Called by the train CLIs after `extract_config`.

    - `query_posmap_size > SWEPT_CASCADE_MAX_QUERY` and the user did not set
      `--ragged` / `--auto_cascade` explicitly -> default both to 1 (the
      campaign-validated configuration). An explicit `--ragged 0` or
      `--auto_cascade 0` is respected as an opt-out.
    - Training above the sweep point with the fixed cascade (however it was
      reached) prints a loud starvation warning citing the measured loss.
    """
    notes = []
    explicit = lambda name: args is not None and getattr(args, name, None) is not None
    r, q = cfg.raster, cfg.model.query_posmap_size
    if q > SWEPT_CASCADE_MAX_QUERY:
        if not r.ragged and not explicit("ragged"):
            r.ragged = 1
            notes.append(
                f"raster defaults: query_posmap_size {q} > {SWEPT_CASCADE_MAX_QUERY}"
                " -> ragged=1 (per-tile need-table rasterizer; the fixed swept"
                " cascade is only validated at <=256-query. Opt out: --ragged 0)")
        if not r.auto_cascade and not explicit("auto_cascade"):
            r.auto_cascade = 1
            notes.append(
                "raster defaults: auto_cascade=1 (size capacities from the"
                " scene's own saturation probe. Opt out: --auto_cascade 0)")
        if not r.ragged and not r.auto_cascade and not r.ragged_budget:
            notes.append(
                "*** WARNING: training at query_posmap_size "
                f"{q} with the FIXED swept capacity cascade "
                f"(tuned at {SWEPT_CASCADE_MAX_QUERY}-query). At the canonical "
                "512-query workload this configuration measurably drops ~89% "
                "of contributing gaussian-tile pairs every step and converges "
                "~16 dB below the validated recipe (27.2 vs 43.2 held-out "
                "PSNR, BASELINE.md). Use --ragged 1 --auto_cascade 1 unless "
                "you are reproducing that experiment. ***")
    return notes


def _add_group(parser: ArgumentParser, cls, name: str, shorthands: dict):
    group = parser.add_argument_group(name)
    for f in dataclasses.fields(cls):
        flag = "--" + f.name
        default = None  # fill at extract time so cfg_args merging can detect "unset"
        names = [flag] + ([shorthands[f.name]] if f.name in shorthands else [])
        if f.type in ("bool", bool):
            group.add_argument(*names, default=None, action="store_true")
        elif f.type in ("List[int]", List[int]):
            group.add_argument(*names, nargs="+", type=int, default=None)
        else:
            ftype = {"int": int, "float": float, "str": str}.get(f.type, None)
            if ftype is None:
                ftype = f.type if isinstance(f.type, type) else str
            group.add_argument(*names, default=default, type=ftype)


_SHORTHANDS = {"source_path": "-s", "model_path": "-m", "white_background": "-w"}


def build_parser(parser: Optional[ArgumentParser] = None) -> ArgumentParser:
    parser = parser or ArgumentParser()
    _add_group(parser, ModelParams, "Loading Parameters", _SHORTHANDS)
    _add_group(parser, NetworkParams, "Network Parameters", {})
    _add_group(parser, OptimizationParams, "Optimization Parameters", {})
    _add_group(parser, RasterParams, "Rasterizer Parameters", {})
    return parser


def _extract(cls, args: Namespace, overrides: Optional[dict] = None):
    kwargs = {}
    names = {f.name for f in dataclasses.fields(cls)}
    if overrides:
        kwargs.update({k: v for k, v in overrides.items() if k in names})
    for k, v in vars(args).items():
        if k in names and v is not None:
            kwargs[k] = v
    return cls(**kwargs)


@dataclass
class Config:
    model: ModelParams
    net: NetworkParams
    opt: OptimizationParams
    raster: RasterParams

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "model": dataclasses.asdict(self.model),
            "net": dataclasses.asdict(self.net),
            "opt": dataclasses.asdict(self.opt),
            "raster": dataclasses.asdict(self.raster),
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)

    @staticmethod
    def load(path: str) -> "Config":
        with open(path) as f:
            payload = json.load(f)
        return Config(
            model=ModelParams(**payload["model"]),
            net=NetworkParams(**payload["net"]),
            opt=OptimizationParams(**payload["opt"]),
            raster=RasterParams(**payload.get("raster", {})),
        )


def extract_config(args: Namespace, saved: Optional[Config] = None) -> Config:
    """Build a Config from parsed args; CLI flags override `saved` (the
    cfg_args-equivalent written at train time), which overrides defaults.
    Mirrors reference `get_combined_args` (arguments/__init__.py:146-166)."""
    ov = lambda c: dataclasses.asdict(c) if saved else None
    return Config(
        model=_extract(ModelParams, args, ov(saved.model) if saved else None),
        net=_extract(NetworkParams, args, ov(saved.net) if saved else None),
        opt=_extract(OptimizationParams, args, ov(saved.opt) if saved else None),
        raster=_extract(RasterParams, args, ov(saved.raster) if saved else None),
    )
