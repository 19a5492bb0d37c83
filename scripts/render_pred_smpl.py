"""Visual QA: overlay the (optimized) SMPL body on the input frames — the
reference's scripts/render_pred_smpl.py pyrender flow, reimplemented with the
framework's own splatting renderer (vertices splatted as small gray gaussians
blended over the photo).

    python scripts/render_pred_smpl.py --source_path <data> [--synthetic ...]
        [--use_pred] [--out <dir>] [--n_frames 8]
"""

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_path", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--smpl_model_path", default="")
    ap.add_argument("--smpl_type", default="smpl")
    ap.add_argument("--smpl_gender", default="neutral")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--use_pred", action="store_true")
    ap.add_argument("--out", default="")
    ap.add_argument("--n_frames", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=0.6)
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from gaussianavatar_tpu.config import ModelParams
    from gaussianavatar_tpu.data.dataset import MonoDatasetTrain, load_smpl_parms
    from gaussianavatar_tpu.models import body as body_mod
    from gaussianavatar_tpu.models.body import load_body_model
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize
    from gaussianavatar_tpu.utils.synthetic import synthetic_body

    if args.synthetic:
        model, _ = synthetic_body()
    else:
        model = load_body_model(args.smpl_model_path, args.smpl_type, args.smpl_gender)

    mp = ModelParams(source_path=args.source_path, model_path="/tmp/_qa",
                     dataset_type="synthetic" if args.synthetic else "peeplesnapshot",
                     smpl_type=args.smpl_type, no_mask=1)
    mp.train_stage = 1
    ds = MonoDatasetTrain(mp)
    name = "smpl_parms_pred.pth" if args.use_pred else "smpl_parms.pth"
    parms = load_smpl_parms(join(args.source_path, args.split, name))
    betas = np.asarray(parms["beta"]).reshape(1, -1).astype(np.float32)
    poses = np.asarray(parms["body_pose"], np.float32)
    trans = np.asarray(parms["trans"], np.float32)

    out_dir = args.out or join(args.source_path, "qa_overlay")
    os.makedirs(out_dir, exist_ok=True)

    V = model.v_template.shape[0]
    gray = jnp.full((V, 3), 0.8)
    scales = jnp.full((V, 3), 0.01)
    quats = jnp.zeros((V, 4)).at[:, 0].set(1.0)
    opac = jnp.ones((V,))
    cfg = RasterizeConfig()

    for i in range(min(args.n_frames, len(ds))):
        item = ds[i]
        H, W = int(item["height"]), int(item["width"])
        cam = Camera(
            world_view_transform=jnp.asarray(item["world_view_transform"]),
            full_proj_transform=jnp.asarray(item["full_proj_transform"]),
            camera_center=jnp.asarray(item["camera_center"]),
            tan_fovx=jnp.float32(item["tan_fovx"]),
            tan_fovy=jnp.float32(item["tan_fovy"]),
            height=H, width=W,
        )
        out = body_mod.forward(
            model, jnp.asarray(betas),
            jnp.asarray(poses[i : i + 1, :3]), jnp.asarray(poses[i : i + 1, 3:]),
            transl=jnp.asarray(trans[i : i + 1]),
        )
        body_img = rasterize(out.vertices[0], gray, scales, quats, opac, cam,
                             jnp.zeros(3), config=cfg)
        mask_img = rasterize(out.vertices[0], jnp.ones((V, 3)), scales, quats, opac,
                             cam, jnp.zeros(3), config=cfg)
        body = np.asarray(body_img)
        m = np.clip(np.asarray(mask_img).max(0, keepdims=True), 0, 1) * args.alpha
        photo = item["original_image"]
        overlay = photo * (1 - m) + body * m
        png = (np.clip(overlay, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(png).save(join(out_dir, f"{i:05d}.png"))
        print(f"frame {i}")
    print("done ->", out_dir)


if __name__ == "__main__":
    main()
