"""Evaluation CLI — reference eval.py parity: render the test split with the
frozen avatar, report mean PSNR / SSIM (/ LPIPS when weights are available)
into <model_path>/test_free/results.txt plus per-frame pred/gt PNGs.

    python eval.py -s <data_path> -m <out_path> --epoch 200
"""

import os
import sys
from argparse import ArgumentParser
from os.path import join

import numpy as np


def main(argv=None):
    from gaussianavatar_tpu.config import Config, build_parser, extract_config

    parser = ArgumentParser(description="Testing script parameters")
    build_parser(parser)
    parser.add_argument("--epoch", type=int, default=None)
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
    from gaussianavatar_tpu.ops.lpips import try_load_lpips
    from gaussianavatar_tpu.ops.ssim import psnr, ssim
    from PIL import Image

    inf = load_trained(cfg, args.epoch)
    print(f"evaluating epoch {inf.epoch}")

    test_ds = MonoDatasetTest(cfg.model)
    item0 = test_ds[0]
    H, W = int(item0["height"]), int(item0["width"])
    fix_inp = load_fixed_inp(cfg)
    override = None
    if getattr(cfg.raster, "auto_cascade", 0):
        from gaussianavatar_tpu.engine.inference import autotune_raster

        override = autotune_raster(inf, H, W, batch_from_item(item0, fix_inp))
        print(f"auto_cascade tiers: {override.tiers}")
    counts_probe = None
    if getattr(cfg.raster, "ragged_eval", 0):
        # probe-then-render: each batch's saturation depths become exact
        # per-tile ragged capacities — every contributing pair blends (the
        # uncapped CUDA rasterizer's coverage) at minimum slab cost
        from gaussianavatar_tpu.engine.inference import ragged_probe_setup

        override, counts_probe = ragged_probe_setup(inf, H, W, override)
        print("ragged eval: per-batch saturation probe -> exact per-tile caps")
    render = make_renderer(inf, H, W, with_overflow=True, raster_override=override)
    lpips_fn = try_load_lpips(cfg.model.project_path)

    out_dir = join(cfg.model.model_path, "test_free")
    os.makedirs(join(out_dir, "renders"), exist_ok=True)
    os.makedirs(join(out_dir, "gt"), exist_ok=True)

    # render the split in fixed-size batches (pad the tail by repeating the
    # last frame; padded outputs are discarded) — one compiled program total
    EVAL_B = 4
    psnrs, ssims, lpipss = [], [], []
    total_overflow = 0
    n = len(test_ds)
    for start in range(0, n, EVAL_B):
        idxs = list(range(start, min(start + EVAL_B, n)))
        pad = [idxs[-1]] * (EVAL_B - len(idxs))
        items = [test_ds[i] for i in idxs + pad]
        singles = [batch_from_item(it, fix_inp) for it in items]
        batch = {k: np.concatenate([s[k] for s in singles]) for k in singles[0]}
        if counts_probe is not None:
            _, needed = counts_probe(inf.state.params, inf.state.batch_stats, batch)
            batch["tile_caps"] = np.asarray(needed).reshape(EVAL_B, -1)
        imgs, overflow = render(inf.state.params, inf.state.batch_stats, batch)
        imgs = np.clip(np.asarray(imgs), 0.0, 1.0)
        total_overflow += int(overflow)

        for j, i in enumerate(idxs):
            img = imgs[j : j + 1]
            gt = items[j]["original_image"][None]
            psnrs.append(float(psnr(img, gt)[0, 0]))
            ssims.append(float(ssim(jnp.asarray(img), jnp.asarray(gt))))
            if lpips_fn is not None:
                lpipss.append(float(lpips_fn(jnp.asarray(img) * 2 - 1, jnp.asarray(gt) * 2 - 1)))
            for name, arr in (("renders", img[0]), ("gt", gt[0])):
                png = (np.clip(arr, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
                Image.fromarray(png).save(join(out_dir, name, f"{i:04d}.png"))
            print(f"frame {i}: psnr {psnrs[-1]:.2f} ssim {ssims[-1]:.4f}")

    from gaussianavatar_tpu.ops.lpips import lpips_status

    lines = [
        f"psnr: {np.mean(psnrs):.6f}",
        f"ssim: {np.mean(ssims):.6f}",
    ]
    if lpipss:
        lines.append(f"lpips: {np.mean(lpipss):.6f}")
    else:
        # make the skipped metric visible instead of silently omitting it
        lines.append(f"lpips: {lpips_status(cfg.model.project_path)}")
    # truncation is never silent: gaussian-tile pairs beyond the capacity
    # cascade across the whole split (0 = these numbers are truncation-free;
    # the CUDA reference is uncapped, gaussian_renderer/__init__.py:40-48)
    lines.append(f"raster_overflow: {total_overflow}")
    if counts_probe is not None:
        # with probe-exact ragged caps every DROPPED pair sits at ranks the
        # blend's early termination never reaches: overflow here counts
        # saturated-transmittance pairs, not lost contributions
        lines.append("raster_overflow_note: ragged_eval caps = probe-exact "
                     "saturation depths (dropped pairs are non-contributing)")
    report = "\n".join(lines)
    with open(join(out_dir, "results.txt"), "w") as f:
        f.write(report + "\n")
    print(report)


if __name__ == "__main__":
    main()
