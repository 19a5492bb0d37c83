"""Novel-pose animation CLI — reference render_novel_pose.py parity:
drive the trained avatar with an external pose sequence (assets/test_pose
by default: 480 SMPL poses, static camera, 1024x1024).

    python render_novel_pose.py -s <data_path> -m <out_path> --epoch 200
"""

import os
import sys
from argparse import ArgumentParser
from os.path import join

import numpy as np


def main(argv=None):
    from gaussianavatar_tpu.config import Config, build_parser, extract_config
    from gaussianavatar_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    parser = ArgumentParser(description="Novel pose rendering parameters")
    build_parser(parser)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--image_size", type=int, default=1024)
    parser.add_argument("--video", action="store_true", help="also write an mp4")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    saved = None
    cfg_path = join(args.model_path or "", "cfg_args.json")
    if args.model_path and os.path.exists(cfg_path):
        saved = Config.load(cfg_path)
    cfg = extract_config(args, saved)

    from PIL import Image

    from gaussianavatar_tpu.data.dataset import MonoDatasetNovelPose
    from gaussianavatar_tpu.engine.inference import (
        batch_from_item,
        load_fixed_inp,
        load_trained,
        make_renderer,
    )

    inf = load_trained(cfg, args.epoch)
    ds = MonoDatasetNovelPose(cfg.model, height=args.image_size, width=args.image_size)
    fix_inp = load_fixed_inp(cfg)
    override = None
    if getattr(cfg.raster, "auto_cascade", 0):
        from gaussianavatar_tpu.engine.inference import autotune_raster

        override = autotune_raster(inf, args.image_size, args.image_size,
                                   batch_from_item(ds[0], fix_inp))
        print(f"auto_cascade tiers: {override.tiers}")
    counts_probe = None
    if getattr(cfg.raster, "ragged_eval", 0):
        # probe-exact rendering, same coverage guarantee as eval.py
        # --ragged_eval: the flagship demo path (480 poses @1024^2,
        # /root/reference/scene/dataset_mono.py:492) can now carry it too
        from gaussianavatar_tpu.engine.inference import ragged_probe_setup

        override, counts_probe = ragged_probe_setup(
            inf, args.image_size, args.image_size, override)
        print("ragged render: per-batch saturation probe -> exact per-tile caps")
    render = make_renderer(inf, args.image_size, args.image_size,
                           raster_override=override)

    out_dir = join(cfg.model.model_path, "novel_pose")
    os.makedirs(out_dir, exist_ok=True)
    print(f"rendering {len(ds)} novel poses at {args.image_size}^2 (epoch {inf.epoch})")

    # animation rendering is a batch workload: 4 frames per device dispatch
    REN_B = 4
    n = len(ds)
    import time

    render_s = 0.0
    for start in range(0, n, REN_B):
        idxs = list(range(start, min(start + REN_B, n)))
        pad = [idxs[-1]] * (REN_B - len(idxs))
        singles = [batch_from_item(ds[i], fix_inp) for i in idxs + pad]
        batch = {k: np.concatenate([s[k] for s in singles]) for k in singles[0]}
        t0 = time.perf_counter()
        if counts_probe is not None:
            _, needed = counts_probe(inf.state.params, inf.state.batch_stats, batch)
            batch["tile_caps"] = np.asarray(needed).reshape(REN_B, -1)
        imgs = np.asarray(render(inf.state.params, inf.state.batch_stats, batch))
        render_s += time.perf_counter() - t0
        for j, i in enumerate(idxs):
            png = (np.clip(imgs[j], 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
            Image.fromarray(png).save(join(out_dir, f"{i:05d}.png"))
        if start % 48 == 0:
            print(f"frame {start}/{n}")
    # device-side rate (PNG encode excluded); first dispatch carries compile
    steps = -(-n // REN_B)
    if steps > 1 and render_s > 0:
        print(f"render rate: {n / render_s:.1f} FPS @{args.image_size}^2 "
              f"(incl. first-dispatch compile"
              + (", probe-exact ragged caps" if counts_probe is not None else "")
              + ")")

    if args.video:
        from gaussianavatar_tpu.utils.video import save_video

        save_video(out_dir, join(out_dir, "novel_pose.mp4"),
                   (args.image_size, args.image_size))
    print("done:", out_dir)


if __name__ == "__main__":
    main()
