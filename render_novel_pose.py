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
    render = make_renderer(inf, args.image_size, args.image_size)
    fix_inp = load_fixed_inp(cfg)

    out_dir = join(cfg.model.model_path, "novel_pose")
    os.makedirs(out_dir, exist_ok=True)
    print(f"rendering {len(ds)} novel poses at {args.image_size}^2 (epoch {inf.epoch})")

    for i in range(len(ds)):
        batch = batch_from_item(ds[i], fix_inp)
        img = np.asarray(render(inf.state.params, inf.state.batch_stats, batch))[0]
        png = (np.clip(img, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(png).save(join(out_dir, f"{i:05d}.png"))
        if i % 50 == 0:
            print(f"frame {i}/{len(ds)}")

    if args.video:
        from gaussianavatar_tpu.utils.video import save_video

        save_video(out_dir, join(out_dir, "novel_pose.mp4"),
                   (args.image_size, args.image_size))
    print("done:", out_dir)


if __name__ == "__main__":
    main()
