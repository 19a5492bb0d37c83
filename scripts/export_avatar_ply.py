"""Export a trained avatar's posed gaussians as a standard 3DGS PLY
(viewable in any gaussian-splatting viewer).

    python scripts/export_avatar_ply.py -m <model_path> [--epoch N]
        [--frame 0 | --pose_file <smpl_parms.pth> --pose_idx 0]
        [--out avatar.ply]
"""

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", "-m", required=True)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--frame", type=int, default=0, help="training frame index")
    ap.add_argument("--pose_file", default=None, help="external smpl_parms for the pose")
    ap.add_argument("--pose_idx", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gaussianavatar_tpu.config import Config
    from gaussianavatar_tpu.engine.export import export_gaussians_ply
    from gaussianavatar_tpu.engine.inference import load_trained
    from gaussianavatar_tpu.engine.train_step import _forward_gaussians
    from gaussianavatar_tpu.data.dataset import load_smpl_parms

    cfg = Config.load(join(args.model_path, "cfg_args.json"))
    cfg.model.model_path = args.model_path
    inf = load_trained(cfg, args.epoch)

    batch = {"pose_idx": jnp.asarray([args.frame], jnp.int32)}
    if args.pose_file:
        parms = load_smpl_parms(args.pose_file)
        batch["pose_data"] = jnp.asarray(parms["body_pose"][args.pose_idx : args.pose_idx + 1])
        batch["transl_data"] = jnp.asarray(parms["trans"][args.pose_idx : args.pose_idx + 1])

    variables = {"params": inf.state.params, "batch_stats": inf.state.batch_stats}
    world, shs, scales3, rotations, opacity, _, _ = _forward_gaussians(
        inf.bundle.net, variables, inf.bundle.body_model, inf.bundle.assets,
        batch, jnp.int32(10**6), False, False,
    )
    nv = inf.bundle.assets.num_valid
    out_path = args.out or join(args.model_path, f"avatar_frame{args.frame}.ply")
    export_gaussians_ply(
        out_path,
        np.asarray(world[0][:nv]),
        np.asarray(shs[0][:nv]),
        np.asarray(scales3[0][:nv]),
        np.asarray(opacity[:nv]),
        np.asarray(jnp.broadcast_to(rotations, (world.shape[1], 4))[:nv]),
    )
    print(f"wrote {out_path} ({nv} gaussians, epoch {inf.epoch})")


if __name__ == "__main__":
    main()
