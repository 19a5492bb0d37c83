"""Generate the canonical-pose preprocessing artifacts — the reference's
`gen_pose_map_cano_smpl.py` (+ the downloadable uv_masks / lbs_map assets)
in one GL-free pass using the software UV rasterizer:

    {split}/query_posemap_{R}_cano_{smpl}.npz   ('posmap{R}')
    {split}/{smpl}_cano_joint_mat.pth           (J,4,4 canonical affines)
    assets/lbs_map_{smpl}_{R}.npy               (R*R, J skinning weights)
    assets/uv_masks/uv_mask{R}_with_faceid_{smpl}.npy
    cano_smpl.obj                               (canonical mesh export)

Usage:
    python scripts/gen_pose_map_cano.py --source_path <data> \
        --smpl_model_path assets/smpl_files/smpl \
        --uv_template assets/template_mesh_smpl_uv.obj [--smpl_type smpl]
    # or --synthetic for the procedural test body
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
    ap.add_argument("--project_path", default=os.getcwd())
    ap.add_argument("--smpl_model_path", default="")
    ap.add_argument("--uv_template", default="")
    ap.add_argument("--smpl_type", default="smpl", choices=["smpl", "smplx"])
    ap.add_argument("--smpl_gender", default="neutral")
    ap.add_argument("--sizes", nargs="+", type=int, default=[512, 128])
    ap.add_argument("--splits", nargs="+", default=["train", "test"])
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from gaussianavatar_tpu.config import smpl_canonical_pose, smplx_canonical_pose
    from gaussianavatar_tpu.data.dataset import load_smpl_parms
    from gaussianavatar_tpu.models import body as body_mod
    from gaussianavatar_tpu.models.body import load_body_model
    from gaussianavatar_tpu.ops.uv_raster import bary_interpolate, rasterize_uv_atlas
    from gaussianavatar_tpu.utils.obj_io import load_obj, save_obj
    from gaussianavatar_tpu.utils.torch_pth import save_pth
    from gaussianavatar_tpu.utils.synthetic import synthetic_body

    if args.synthetic:
        model, uv = synthetic_body()
        uv_verts, uv_uvs = uv.verts, uv.uvs
        faces_v, faces_vt = uv.faces_v, uv.faces_vt
        cano_pose = np.zeros(model.parents.shape[0] * 3, np.float32)
        cano_transl = None
    else:
        model = load_body_model(args.smpl_model_path, args.smpl_type, args.smpl_gender)
        mesh = load_obj(args.uv_template)
        uv_uvs, faces_v, faces_vt = mesh.uvs, mesh.faces_v, mesh.faces_vt
        cano_pose = (
            smplx_canonical_pose() if args.smpl_type == "smplx" else smpl_canonical_pose()
        )
        cano_transl = np.array([0.0, 0.3, 0.0], np.float32)

    smpl_data = load_smpl_parms(join(args.source_path, args.splits[0], "smpl_parms.pth"))
    betas = np.asarray(smpl_data["beta"]).reshape(1, -1).astype(np.float32)

    out = body_mod.forward(
        model,
        jnp.asarray(betas),
        jnp.asarray(cano_pose[None, :3]),
        jnp.asarray(cano_pose[None, 3:]),
        transl=None if cano_transl is None else jnp.asarray(cano_transl[None]),
    )
    cano_verts = np.asarray(out.vertices[0])
    A = np.asarray(out.A[0])
    J = A.shape[0]

    save_obj(join(args.source_path, "cano_smpl.obj"), cano_verts, model.faces)
    save_mat = lambda p: save_pth(A, p)

    os.makedirs(join(args.project_path, "assets", "uv_masks"), exist_ok=True)
    for R in args.sizes:
        raster = rasterize_uv_atlas(cano_verts, uv_uvs, faces_v, faces_vt, R)
        lbs_map = bary_interpolate(np.asarray(model.lbs_weights), faces_v, raster)
        np.save(
            join(args.project_path, "assets", f"lbs_map_{args.smpl_type}_{R}.npy"),
            lbs_map.reshape(R * R, J),
        )
        np.save(
            join(args.project_path, "assets", "uv_masks",
                 f"uv_mask{R}_with_faceid_{args.smpl_type}.npy"),
            raster.face_id.reshape(-1),
        )
        for split in args.splits:
            d = join(args.source_path, split)
            if not os.path.isdir(d):
                continue
            np.savez(
                join(d, f"query_posemap_{R}_cano_{args.smpl_type}.npz"),
                **{f"posmap{R}": raster.position_map},
            )
            save_mat(join(d, f"{args.smpl_type}_cano_joint_mat.pth"))
        print(f"size {R}: {int((raster.face_id >= 0).sum())} valid uv pixels")
    print("done")


if __name__ == "__main__":
    main()
