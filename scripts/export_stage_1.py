"""Export the stage-1-optimized per-frame SMPL poses into
`smpl_parms_pred.pth` (reference scripts/export_stage_1_smpl.py:10-27) so the
stage-2 dataset reads the refined poses."""

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", "-m", required=True, help="stage-1 output dir")
    ap.add_argument("--source_path", "-s", required=True)
    ap.add_argument("--epoch", type=int, default=None)
    args = ap.parse_args()

    from flax import serialization

    from gaussianavatar_tpu.data.dataset import load_smpl_parms
    from gaussianavatar_tpu.engine import checkpoint as ckpt
    from gaussianavatar_tpu.utils.torch_pth import save_pth

    epoch = args.epoch or ckpt.latest_epoch(args.model_path)
    path = join(ckpt.ckpt_dir(args.model_path, epoch), ckpt.CKPT_NAME)
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    pose = np.asarray(raw["params"]["pose_embedding"])
    transl = np.asarray(raw["params"]["transl_embedding"])

    train_dir = join(args.source_path, "train")
    orig = load_smpl_parms(join(train_dir, "smpl_parms.pth"))
    out = {"beta": orig["beta"], "body_pose": pose, "trans": transl}

    save_pth({k: np.asarray(v) for k, v in out.items()},
             join(train_dir, "smpl_parms_pred.pth"))

    # the test split keeps its original (untouched) poses under the pred name
    test_dir = join(args.source_path, "test")
    if os.path.isdir(test_dir):
        torig = load_smpl_parms(join(test_dir, "smpl_parms.pth"))
        save_pth({k: np.asarray(v) for k, v in torig.items()},
                 join(test_dir, "smpl_parms_pred.pth"))
    print(f"exported epoch {epoch} poses: {pose.shape} -> smpl_parms_pred.pth")


if __name__ == "__main__":
    main()
