"""Per-frame posed position maps for stage 2 — the reference's
`gen_pose_map_our_smpl.py` (SMPL forward per frame -> UV-space render of the
posed surface -> inp_map/inp_posemap_{S}_{idx:08d}.npz), GL-free.

    python scripts/gen_pose_map_frames.py --source_path <data> \
        [--synthetic | --smpl_model_path ... --uv_template ...] [--size 128]
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
    ap.add_argument("--smpl_model_path", default="")
    ap.add_argument("--uv_template", default="")
    ap.add_argument("--smpl_type", default="smpl", choices=["smpl", "smplx"])
    ap.add_argument("--smpl_gender", default="neutral")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--splits", nargs="+", default=["train", "test"])
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--use_pred", action="store_true", default=True,
                    help="read smpl_parms_pred.pth (stage-1 refined poses)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from gaussianavatar_tpu.data.dataset import load_smpl_parms
    from gaussianavatar_tpu.models import body as body_mod
    from gaussianavatar_tpu.models.body import load_body_model
    from gaussianavatar_tpu.ops.uv_raster import rasterize_uv_atlas
    from gaussianavatar_tpu.utils.obj_io import load_obj
    from gaussianavatar_tpu.utils.synthetic import synthetic_body

    if args.synthetic:
        model, uv = synthetic_body()
        uv_uvs, faces_v, faces_vt = uv.uvs, uv.faces_v, uv.faces_vt
    else:
        model = load_body_model(args.smpl_model_path, args.smpl_type, args.smpl_gender)
        mesh = load_obj(args.uv_template)
        uv_uvs, faces_v, faces_vt = mesh.uvs, mesh.faces_v, mesh.faces_vt

    S = args.size
    for split in args.splits:
        d = join(args.source_path, split)
        if not os.path.isdir(d):
            continue
        name = "smpl_parms_pred.pth" if args.use_pred else "smpl_parms.pth"
        if not os.path.exists(join(d, name)) and not os.path.exists(join(d, name + ".npz")):
            name = "smpl_parms.pth"
        parms = load_smpl_parms(join(d, name))
        betas = np.asarray(parms["beta"]).reshape(1, -1).astype(np.float32)
        poses = np.asarray(parms["body_pose"], np.float32)
        trans = np.asarray(parms["trans"], np.float32)
        n = len(os.listdir(join(d, "images"))) if os.path.isdir(join(d, "images")) else len(poses)
        os.makedirs(join(d, "inp_map"), exist_ok=True)
        for i in range(min(n, len(poses))):
            if args.smpl_type == "smplx":
                out = body_mod.forward(
                    model, jnp.asarray(betas),
                    jnp.asarray(poses[i : i + 1, :3]), jnp.asarray(poses[i : i + 1, 3:66]),
                    transl=jnp.asarray(trans[i : i + 1]),
                    jaw_pose=jnp.asarray(poses[i : i + 1, 66:69]),
                    leye_pose=jnp.asarray(poses[i : i + 1, 69:72]),
                    reye_pose=jnp.asarray(poses[i : i + 1, 72:75]),
                    left_hand_pose=jnp.asarray(poses[i : i + 1, 75:120]),
                    right_hand_pose=jnp.asarray(poses[i : i + 1, 120:165]),
                )
            else:
                out = body_mod.forward(
                    model, jnp.asarray(betas),
                    jnp.asarray(poses[i : i + 1, :3]), jnp.asarray(poses[i : i + 1, 3:]),
                    transl=jnp.asarray(trans[i : i + 1]),
                )
            raster = rasterize_uv_atlas(
                np.asarray(out.vertices[0]), uv_uvs, faces_v, faces_vt, S
            )
            np.savez(
                join(d, "inp_map", "inp_posemap_%s_%s.npz" % (S, str(i).zfill(8))),
                **{f"posmap{S}": raster.position_map},
            )
            if i % 50 == 0:
                print(f"{split} frame {i}/{n}")
    print("done")


if __name__ == "__main__":
    main()
