"""Novel-view (bullet-time) rendering: orbit the camera around a fixed pose
(the reference ships MonoDataset_novel_view + bullet_pose_list for this,
dataset_mono.py:524-674 / arguments:83, without a CLI — this completes it).

    python render_novel_view.py -s <data> -m <out> --epoch 200 \
        [--bullet_pose_list 112 217 755] [--frames 60]
"""

import os
import sys
from argparse import ArgumentParser
from os.path import join

import numpy as np


def main(argv=None):
    from gaussianavatar_tpu.config import Config, build_parser, extract_config

    parser = ArgumentParser(description="Novel view rendering parameters")
    build_parser(parser)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--frames", type=int, default=60, help="frames per orbit")
    parser.add_argument("--video", action="store_true")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    saved = None
    cfg_path = join(args.model_path or "", "cfg_args.json")
    if args.model_path and os.path.exists(cfg_path):
        saved = Config.load(cfg_path)
    cfg = extract_config(args, saved)

    from gaussianavatar_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    from PIL import Image

    from gaussianavatar_tpu.data.dataset import MonoDatasetNovelView
    from gaussianavatar_tpu.engine.inference import (
        batch_from_item,
        load_trained,
        make_renderer,
    )
    from gaussianavatar_tpu.models import body as body_mod

    inf = load_trained(cfg, args.epoch)
    ds = MonoDatasetNovelView(cfg.model)
    item0 = ds._load_image(ds.name_list[0][1])
    H, W = item0[1], item0[2]

    # orbit center: rest-pose pelvis (joint 0) + the frame's translation
    rest = body_mod.forward(
        inf.bundle.body_model,
        jnp.asarray(inf.bundle.betas[None]),
        jnp.zeros((1, 3)),
        jnp.zeros((1, inf.bundle.train_dataset.pose_data.shape[1] - 3)),
    )
    pelvis = np.asarray(rest.joints[0, 0])

    # the default bullet_pose_list (112/217/755) indexes People Snapshot
    # frames; on shorter sequences fall back to frame 0 instead of silently
    # rendering nothing
    pose_list = [p for p in cfg.model.bullet_pose_list if p < len(ds.pose_data)]
    skipped = [p for p in cfg.model.bullet_pose_list if p >= len(ds.pose_data)]
    for p in skipped:
        print(f"skipping bullet pose {p} (only {len(ds.pose_data)} frames)")
    if not pose_list:
        print("no bullet pose in range; falling back to pose 0")
        pose_list = [0]

    # build the renderer against a representative orbit frame of the first
    # bullet pose (auto-tune / probe-exact need a real batch to size from)
    ds.set_fixed_pose(pose_list[0], args.frames, pelvis)
    override = None
    if getattr(cfg.raster, "auto_cascade", 0):
        from gaussianavatar_tpu.engine.inference import autotune_raster

        override = autotune_raster(inf, H, W, batch_from_item(ds[0]))
        print(f"auto_cascade tiers: {override.tiers}")
    counts_probe = None
    if getattr(cfg.raster, "ragged_eval", 0):
        # probe-exact rendering: same per-frame coverage guarantee as
        # eval.py --ragged_eval (see inference.ragged_probe_setup)
        from gaussianavatar_tpu.engine.inference import ragged_probe_setup

        override, counts_probe = ragged_probe_setup(inf, H, W, override)
        print("ragged render: per-batch saturation probe -> exact per-tile caps")
    render = make_renderer(inf, H, W, raster_override=override)

    for pose_idx in pose_list:
        ds.set_fixed_pose(pose_idx, args.frames, pelvis)
        out_dir = join(cfg.model.model_path, "novel_view", f"pose_{pose_idx}")
        os.makedirs(out_dir, exist_ok=True)
        print(f"orbiting pose {pose_idx}: {args.frames} frames at {W}x{H}")
        for i in range(args.frames):
            batch = batch_from_item(ds[i])
            if counts_probe is not None:
                _, needed = counts_probe(
                    inf.state.params, inf.state.batch_stats, batch)
                batch["tile_caps"] = np.asarray(needed).reshape(1, -1)
            img = np.asarray(render(inf.state.params, inf.state.batch_stats, batch))[0]
            png = (np.clip(img, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
            Image.fromarray(png).save(join(out_dir, f"{i:05d}.png"))
        if args.video:
            from gaussianavatar_tpu.utils.video import save_video

            save_video(out_dir, join(out_dir, "orbit.mp4"), (W, H))
    print("done")


if __name__ == "__main__":
    main()
