"""Bridge from Config to runtime objects: body model, avatar assets, network,
datasets. Mirrors AvatarModel.__init__'s asset wiring
(/root/reference/model/avatar_model.py:41-121) with two asset sources:

  1. reference-preprocessed files if present (query_posemap npz, lbs_map npy,
     cano_joint_mat pth, uv face-id mask — the assets.zip layout), or
  2. computed in-process from the body model + template UV mesh via the
     software UV rasterizer (`build_avatar_assets`) — no downloads, no GL.

`dataset_type == "synthetic"` swaps the licensed SMPL files for the
procedural body so the full pipeline runs hermetically.
"""

from __future__ import annotations

import os
from os.path import join
from typing import NamedTuple, Optional

import numpy as np

from gaussianavatar_tpu.config import Config, smpl_canonical_pose, smplx_canonical_pose
from gaussianavatar_tpu.data.dataset import MonoDatasetTrain
from gaussianavatar_tpu.models.avatar import AvatarAssets, AvatarNet, build_avatar_assets
from gaussianavatar_tpu.models.body import BodyModel, load_body_model
from gaussianavatar_tpu.ops.uv_raster import uv_coord_map
from gaussianavatar_tpu.utils.obj_io import load_obj
from gaussianavatar_tpu.utils.synthetic import synthetic_body


class AvatarBundle(NamedTuple):
    body_model: BodyModel
    assets: AvatarAssets
    net: AvatarNet
    train_dataset: MonoDatasetTrain
    betas: np.ndarray


def _load_reference_assets(mp, betas: np.ndarray, J: int) -> Optional[AvatarAssets]:
    """Load the reference's preprocessed artifacts if they all exist."""
    import jax.numpy as jnp

    R = mp.query_posmap_size
    st = mp.smpl_type
    split = "train"
    query_map_path = join(mp.source_path, split, f"query_posemap_{R}_cano_{st}.npz")
    lbs_path = join(mp.project_path, "assets", f"lbs_map_{st}_{R}.npy")
    mat_path = join(mp.source_path, split, f"{st}_cano_joint_mat.pth")
    mask_path = join(mp.project_path, "assets", "uv_masks", f"uv_mask{R}_with_faceid_{st}.npy")
    paths = [query_map_path, lbs_path, mat_path, mask_path]
    if not all(os.path.exists(p) for p in paths):
        return None

    from gaussianavatar_tpu.utils.torch_pth import load_pth

    query_map = np.load(query_map_path)["posmap" + str(R)].reshape(-1, 3)
    lbs_map = np.load(lbs_path).reshape(R * R, J)
    faceid = np.load(mask_path).reshape(-1)
    cano_mats = np.asarray(load_pth(mat_path))
    inv_mats = np.linalg.inv(cano_mats.reshape(J, 4, 4))

    valid_idx = np.flatnonzero(faceid != -1).astype(np.int32)
    uvc = uv_coord_map(R)[valid_idx]
    qp = query_map[valid_idx].astype(np.float32)
    ql = lbs_map[valid_idx].astype(np.float32)

    n = len(valid_idx)
    pad_to = 256
    n_pad = (-n) % pad_to
    if n_pad:
        qp = np.concatenate([qp, np.zeros((n_pad, 3), np.float32)])
        pad_lbs = np.zeros((n_pad, J), np.float32)
        pad_lbs[:, 0] = 1.0
        ql = np.concatenate([ql, pad_lbs])
        valid_idx = np.concatenate([valid_idx, np.zeros(n_pad, np.int32)])
        uvc = np.concatenate([uvc, np.zeros((n_pad, 2), np.float32)])

    return AvatarAssets(
        query_points=jnp.asarray(qp),
        query_lbs=jnp.asarray(ql),
        inv_mats=jnp.asarray(inv_mats.astype(np.float32)),
        valid_idx=jnp.asarray(valid_idx),
        uv_coords=jnp.asarray(uvc),
        betas=jnp.asarray(betas.astype(np.float32)),
        query_res=R,
        num_valid=n,
    )


def setup_avatar(cfg: Config, train: bool = True) -> AvatarBundle:
    mp, npar = cfg.model, cfg.net
    train_dataset = MonoDatasetTrain(mp)
    betas = np.asarray(train_dataset.smpl_data["beta"]).reshape(-1)
    num_frames = len(train_dataset)

    if mp.dataset_type == "synthetic":
        body_model, uv = synthetic_body()
        betas = np.zeros(body_model.shapedirs.shape[-1], np.float32)
        J = body_model.parents.shape[0]
        cano_pose = np.zeros(J * 3, np.float32)
        cano_transl = None
        uv_parts = (uv.verts, uv.uvs, uv.faces_v, uv.faces_vt)
    else:
        path = mp.smplx_model_path if mp.smpl_type == "smplx" else mp.smpl_model_path
        body_model = load_body_model(path, mp.smpl_type, mp.smpl_gender,
                                     num_betas=len(betas) if len(betas) else 10)
        J = body_model.parents.shape[0]
        cano_pose = (
            smplx_canonical_pose() if mp.smpl_type == "smplx" else smpl_canonical_pose()
        )
        # reference canonical forward adds +0.3y (gen_pose_map_cano_smpl.py:60-65)
        cano_transl = np.array([0.0, 0.3, 0.0], np.float32)
        obj_path = join(mp.project_path, "assets", f"template_mesh_{mp.smpl_type}_uv.obj")
        if os.path.exists(obj_path):
            mesh = load_obj(obj_path)
            uv_parts = (np.asarray(body_model.v_template), mesh.uvs, mesh.faces_v, mesh.faces_vt)
        else:
            uv_parts = None

    assets = _load_reference_assets(mp, betas, J)
    if assets is None:
        if uv_parts is None:
            raise FileNotFoundError(
                "no preprocessed assets found and no template UV mesh available; "
                "run scripts/gen_pose_map_cano.py or provide "
                f"assets/template_mesh_{mp.smpl_type}_uv.obj"
            )
        assets = build_avatar_assets(
            body_model, *uv_parts,
            cano_pose=cano_pose, betas=betas,
            query_res=mp.query_posmap_size, cano_transl=cano_transl,
        )

    net = AvatarNet(
        num_frames=num_frames,
        pose_dim=train_dataset.pose_data.shape[1],
        c_geom=npar.c_geom,
        c_pose=npar.c_pose,
        inp_posmap_size=mp.inp_posmap_size,
        hsize=npar.hsize,
        nf=npar.nf,
        geom_layer_type=npar.geom_layer_type or None,
        up_mode=npar.up_mode,
        use_dropout=bool(npar.use_dropout),
        pos_encoding=bool(npar.pos_encoding),
        num_emb_freqs=npar.num_emb_freqs,
        posemb_incl_input=bool(npar.posemb_incl_input),
        train_stage=mp.train_stage,
        compute_dtype="bfloat16" if getattr(npar, "bf16_decoder", 0) else "float32",
        decoder_impl="fused" if getattr(npar, "fused_decoder", 0) else "ref",
        pose_init=train_dataset.pose_data,
        transl_init=train_dataset.transl_data,
    )
    return AvatarBundle(
        body_model=body_model,
        assets=assets,
        net=net,
        train_dataset=train_dataset,
        betas=betas,
    )
