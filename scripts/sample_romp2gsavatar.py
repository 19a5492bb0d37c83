"""Convert ROMP / InstantAvatar-style monocular capture outputs into the
framework's dataset layout — the reference's scripts/sample_romp2gsavatar.py
flow: read {images/, masks/, cameras.npz, poses_optimized.npz}, apply the
InstantAvatar train/test split rule, write
{split}/{images,masks,cam_parms.npz,smpl_parms.pth}.

    python scripts/sample_romp2gsavatar.py --input <romp_dir> --output <data>
"""

import argparse
import os
import shutil
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianavatar_tpu.utils.torch_pth import save_pth  # noqa: E402


def instantavatar_split(n: int):
    """InstantAvatar rule: first ~80% train (every frame), last 20% test."""
    n_train = int(n * 0.8)
    return list(range(n_train)), list(range(n_train, n))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="ROMP/InstantAvatar capture dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--poses_file", default="poses_optimized.npz")
    ap.add_argument("--cameras_file", default="cameras.npz")
    args = ap.parse_args()

    cams = np.load(join(args.input, args.cameras_file))
    intrinsic = np.asarray(cams["intrinsic"], np.float32).reshape(3, 3)
    extrinsic = np.asarray(cams["extrinsic"], np.float32).reshape(4, 4) \
        if "extrinsic" in cams else np.eye(4, dtype=np.float32)

    poses = np.load(join(args.input, args.poses_file))
    # ROMP keys: global_orient (N,3), body_pose (N,69), transl (N,3), betas
    if "body_pose" in poses and "global_orient" in poses:
        body_pose = np.concatenate(
            [np.asarray(poses["global_orient"]), np.asarray(poses["body_pose"])], axis=1
        )
    else:
        body_pose = np.asarray(poses["pose"] if "pose" in poses else poses["thetas"])
    trans = np.asarray(poses.get("transl", poses.get("trans")), np.float32)
    betas = np.asarray(poses.get("betas", poses.get("beta")), np.float32).reshape(1, -1)

    img_dir = join(args.input, "images")
    names = sorted(os.listdir(img_dir))
    n = min(len(names), len(body_pose))
    train_ids, test_ids = instantavatar_split(n)

    for split, ids in (("train", train_ids), ("test", test_ids)):
        d = join(args.output, split)
        os.makedirs(join(d, "images"), exist_ok=True)
        os.makedirs(join(d, "masks"), exist_ok=True)
        sp, st = [], []
        for new_i, i in enumerate(ids):
            base = names[i]
            dst = f"{new_i:08d}" + os.path.splitext(base)[1]
            shutil.copy(join(img_dir, base), join(d, "images", dst))
            mask_src = join(args.input, "masks", base)
            if not os.path.exists(mask_src):
                stem = os.path.splitext(base)[0]
                for ext in (".png", ".jpg"):
                    if os.path.exists(join(args.input, "masks", stem + ext)):
                        mask_src = join(args.input, "masks", stem + ext)
                        break
            shutil.copy(mask_src, join(d, "masks", f"{new_i:08d}.png"))
            sp.append(body_pose[i])
            st.append(trans[i])
        np.savez(join(d, "cam_parms.npz"), extrinsic=extrinsic, intrinsic=intrinsic)
        parms = {
            "beta": betas.astype(np.float32),
            "body_pose": np.stack(sp).astype(np.float32),
            "trans": np.stack(st).astype(np.float32),
        }
        save_pth(parms, join(d, "smpl_parms.pth"))
        print(f"{split}: {len(ids)} frames")
    print("done ->", args.output)


if __name__ == "__main__":
    main()
