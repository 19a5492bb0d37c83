"""Truncation-fidelity probe on a TRAINED avatar: render the test split with
the adopted capacity cascade AND a deep (effectively uncapped) configuration,
then report

  - PSNR between the two renders (the direct fidelity number),
  - PSNR vs GT under each config (does truncation move the quality metric?),
  - overflow counts (deep overflow 0 proves the deep render is exact).

This closes the gap the round-2 fidelity table left open: that table was
measured on an UNTRAINED warm-up-scale scene ("pathologically
transparency-deep"); the claim that on converged avatars the truncated pairs
hide behind saturated transmittance (bench.py) needs measuring on a converged
checkpoint. The CUDA reference blends uncapped
(/root/reference/gaussian_renderer/__init__.py:40-48), so "deep ≈ uncapped"
is the parity target.

    python scripts/truncation_fidelity.py -m /tmp/qg/stage1 --epoch 200
"""

import json
import os
import sys
from argparse import ArgumentParser
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from gaussianavatar_tpu.config import Config, build_parser, extract_config

    parser = ArgumentParser(description="Trained-avatar truncation fidelity")
    build_parser(parser)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--deep_capacity", type=int, default=4096,
                        help="single-tier capacity for the 'uncapped' render")
    parser.add_argument("--out", default=None,
                        help="JSON report path (default <model>/truncation_fidelity.json)")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    saved = None
    cfg_path = join(args.model_path or "", "cfg_args.json")
    if args.model_path and os.path.exists(cfg_path):
        saved = Config.load(cfg_path)
    cfg = extract_config(args, saved)

    from gaussianavatar_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp

    from gaussianavatar_tpu.data.dataset import MonoDatasetTest
    from gaussianavatar_tpu.engine.inference import (
        batch_from_item,
        load_fixed_inp,
        load_trained,
        make_renderer,
    )
    from gaussianavatar_tpu.ops.ssim import psnr

    inf = load_trained(cfg, args.epoch)
    test_ds = MonoDatasetTest(cfg.model)
    item0 = test_ds[0]
    H, W = int(item0["height"]), int(item0["width"])
    fix_inp = load_fixed_inp(cfg)

    def render_split(render):
        EVAL_B = 4
        outs, overflow = [], 0
        n = len(test_ds)
        for start in range(0, n, EVAL_B):
            idxs = list(range(start, min(start + EVAL_B, n)))
            pad = [idxs[-1]] * (EVAL_B - len(idxs))
            items = [test_ds[i] for i in idxs + pad]
            singles = [batch_from_item(it, fix_inp) for it in items]
            batch = {k: np.concatenate([s[k] for s in singles]) for k in singles[0]}
            imgs, ov = render(inf.state.params, inf.state.batch_stats, batch)
            overflow += int(ov)
            imgs = np.clip(np.asarray(imgs), 0.0, 1.0)
            outs.extend(imgs[j] for j in range(len(idxs)))
        return np.stack(outs), overflow

    # pass 1: the conservative cascade (train-parity M=9 footprint + stable
    # sort) — the round-2 eval profile
    cfg.raster.render_max_tiles_per_gaussian = 9
    cfg.raster.render_sort_stable = 1
    render = make_renderer(inf, H, W, with_overflow=True)
    cascade_imgs, cascade_overflow = render_split(render)

    # pass 2: the fast render profile (M=4 footprint + unstable sort —
    # measured 179 vs 130 FPS @512² B=4 on v5e); fidelity vs deep decides
    # whether it stays the render-CLI default
    cfg.raster.render_max_tiles_per_gaussian = 4
    cfg.raster.render_sort_stable = 0
    render_fast = make_renderer(inf, H, W, with_overflow=True)
    fast_imgs, fast_overflow = render_split(render_fast)

    # pass 3: deep single tier — "uncapped" when its overflow comes back 0
    cfg.raster.render_max_tiles_per_gaussian = 9
    cfg.raster.render_sort_stable = 1
    cfg.raster.tile_capacity = int(args.deep_capacity)
    cfg.raster.tile_capacity_hi = 0
    render_deep = make_renderer(inf, H, W, with_overflow=True)
    deep_imgs, deep_overflow = render_split(render_deep)

    gts = np.stack([np.asarray(test_ds[i]["original_image"]) for i in range(len(test_ds))])

    def mean_psnr(a, b):
        return float(np.mean([float(psnr(a[i:i+1], b[i:i+1])[0, 0]) for i in range(len(a))]))

    report = {
        "epoch": inf.epoch,
        "n_frames": len(test_ds),
        "cascade": {
            "tiers": f"{saved.raster.tile_capacity if saved else cfg.raster.tile_capacity}"
                     f"+{saved.raster.tile_capacity_hi if saved else 0}"
                     f"@{saved.raster.heavy_fraction if saved else 0}",
            "overflow": cascade_overflow,
            "psnr_vs_gt": mean_psnr(cascade_imgs, gts),
        },
        "fast": {
            "profile": "M=4 footprint, unstable sort, same tiers",
            "overflow": fast_overflow,
            "psnr_vs_gt": mean_psnr(fast_imgs, gts),
        },
        "deep": {
            "capacity": int(args.deep_capacity),
            "overflow": deep_overflow,
            "psnr_vs_gt": mean_psnr(deep_imgs, gts),
        },
        "psnr_cascade_vs_deep": mean_psnr(cascade_imgs, deep_imgs),
        "psnr_fast_vs_deep": mean_psnr(fast_imgs, deep_imgs),
    }
    report["psnr_vs_gt_delta"] = abs(
        report["cascade"]["psnr_vs_gt"] - report["deep"]["psnr_vs_gt"]
    )
    out_path = args.out or join(cfg.model.model_path, "truncation_fidelity.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
