"""The avatar model: canonical-UV Gaussians + POP decoder + LBS re-posing.

Capability parity with reference `AvatarModel`
(/root/reference/model/avatar_model.py:19-367) redesigned as pure functions +
one Flax module:

  - `AvatarAssets` bundles what the reference loads from preprocessed files
    (canonical UV position map -> query_points, per-UV-pixel lbs weights,
    inverse canonical joint mats, valid-pixel indices, uv coords, betas;
    avatar_model.py:48-98). `build_avatar_assets` computes all of it from a
    body model + UV atlas with the software UV rasterizer — replacing both
    the GL preprocessing scripts and the downloadable assets.zip.
  - `AvatarNet` owns the learnables: geometry feature tensor (1,F,F,64 ~
    N(0,.01), avatar_model.py:136-137), per-frame pose/transl embedding
    tables (avatar_model.py:100-113), the POP decoder, and (stage 2) the
    UNet pose encoder.
  - `avatar_gaussians` is the fused forward: embeddings -> SMPL LBS ->
    decoder -> 0.02-scaled offsets -> skinning transform -> per-gaussian
    world positions/scales/colors, exactly the math of train_stage1/2
    (avatar_model.py:272-330) but batched and jit-compiled end to end.

Gaussian attributes follow the paper's simplification: opacity fixed at 1,
rotation fixed to identity, isotropic scale (sigmoid), colors precomputed
(avatar_model.py:79-83,316-326).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gaussianavatar_tpu.models import body as body_mod
from gaussianavatar_tpu.models.body import BodyModel
from gaussianavatar_tpu.models.layers import UnetNoCond5DS
from gaussianavatar_tpu.models.pop import POPDecoder
from gaussianavatar_tpu.ops.uv_raster import (
    bary_interpolate,
    rasterize_uv_atlas,
    uv_coord_map,
)


class AvatarAssets(NamedTuple):
    query_points: jax.Array   # (Nv, 3) canonical posed positions of valid UV px
    query_lbs: jax.Array      # (Nv, J) skinning weights per query point
    inv_mats: jax.Array       # (J, 4, 4) inverse canonical joint affines
    valid_idx: jax.Array      # (Nv,) int32 flat indices into R*R
    uv_coords: jax.Array      # (Nv, 2) normalized (row, col)/(R-1)
    betas: jax.Array          # (n_betas,)
    query_res: int            # R (static)
    num_valid: int            # true count before padding (static)


def build_avatar_assets(
    model: BodyModel,
    uv_verts: np.ndarray,
    uv_uvs: np.ndarray,
    uv_faces_v: np.ndarray,
    uv_faces_vt: np.ndarray,
    cano_pose: np.ndarray,     # (J*3,) canonical pose (legs +-30deg for SMPL)
    betas: np.ndarray,         # (n_betas,)
    query_res: int = 512,
    cano_transl: Optional[np.ndarray] = None,  # reference uses +0.3y (gen_pose_map_cano_smpl.py:60-65)
    pad_to: int = 256,
) -> AvatarAssets:
    """Run the offline preprocessing chain in-process:
    canonical-pose LBS -> UV position map -> per-pixel lbs weights ->
    valid-pixel gather. Point count is padded to a multiple of `pad_to`
    (padding points get zero lbs rows and are marked by opacity 0 downstream).
    """
    J = model.parents.shape[0]
    cano_pose = np.asarray(cano_pose, np.float32).reshape(1, -1)
    betas_a = jnp.asarray(np.asarray(betas, np.float32).reshape(1, -1))
    transl = None if cano_transl is None else jnp.asarray(np.asarray(cano_transl, np.float32).reshape(1, 3))

    out = body_mod.forward(
        model,
        betas=betas_a,
        global_orient=jnp.asarray(cano_pose[:, :3]),
        body_pose=jnp.asarray(cano_pose[:, 3:]),
        transl=transl,
    )
    cano_verts = np.asarray(out.vertices[0])
    A_cano = np.asarray(out.A[0])
    inv_mats = np.linalg.inv(A_cano)

    raster = rasterize_uv_atlas(cano_verts, uv_uvs, uv_faces_v, uv_faces_vt, query_res)
    lbs_map = bary_interpolate(np.asarray(model.lbs_weights), uv_faces_v, raster)

    valid_idx = np.flatnonzero(raster.face_id.reshape(-1) >= 0).astype(np.int32)
    qp = raster.position_map.reshape(-1, 3)[valid_idx]
    ql = lbs_map.reshape(-1, J)[valid_idx]
    uvc = uv_coord_map(query_res)[valid_idx]

    n = len(valid_idx)
    n_pad = (-n) % pad_to
    if n_pad:
        qp = np.concatenate([qp, np.zeros((n_pad, 3), np.float32)])
        # padding points follow joint 0 rigidly (finite transforms, opacity 0)
        pad_lbs = np.zeros((n_pad, J), np.float32)
        pad_lbs[:, 0] = 1.0
        ql = np.concatenate([ql, pad_lbs])
        valid_idx = np.concatenate([valid_idx, np.zeros(n_pad, np.int32)])
        uvc = np.concatenate([uvc, np.zeros((n_pad, 2), np.float32)])

    return AvatarAssets(
        query_points=jnp.asarray(qp),
        query_lbs=jnp.asarray(ql),
        inv_mats=jnp.asarray(inv_mats),
        valid_idx=jnp.asarray(valid_idx),
        uv_coords=jnp.asarray(uvc),
        betas=jnp.asarray(np.asarray(betas, np.float32)),
        query_res=query_res,
        num_valid=n,
    )


class AvatarNet(nn.Module):
    """Learnable state: geo featmap + POP decoder + per-frame pose/transl
    embeddings (+ stage-2 pose encoder)."""

    num_frames: int
    pose_dim: int               # 72 smpl / 66 smplx (dataset_mono.py:143,152)
    c_geom: int = 64
    c_pose: int = 64
    inp_posmap_size: int = 128
    hsize: int = 128
    nf: int = 32
    geom_layer_type: Optional[str] = "conv"
    up_mode: str = "upconv"
    use_dropout: bool = False
    pos_encoding: bool = False
    num_emb_freqs: int = 6
    posemb_incl_input: bool = False
    train_stage: int = 1
    compute_dtype: str = "float32"  # decoder matmul dtype (models/decoder.py)
    decoder_impl: str = "ref"       # "fused" = analytic-BN folded stages
    pose_init: Optional[np.ndarray] = None     # (num_frames, pose_dim)
    transl_init: Optional[np.ndarray] = None   # (num_frames, 3)

    def setup(self):
        F = self.inp_posmap_size
        self.geo_feature = self.param(
            "geo_feature",
            lambda key, shape: 0.01 * jax.random.normal(key, shape),
            (1, F, F, self.c_geom),
        )
        pose_init = self.pose_init
        transl_init = self.transl_init
        self.pose = self.param(
            "pose_embedding",
            (lambda key, shape: jnp.asarray(pose_init))
            if pose_init is not None
            else nn.initializers.zeros,
            (self.num_frames, self.pose_dim),
        )
        self.transl = self.param(
            "transl_embedding",
            (lambda key, shape: jnp.asarray(transl_init))
            if transl_init is not None
            else nn.initializers.zeros,
            (self.num_frames, 3),
        )
        self.pop = POPDecoder(
            c_geom=self.c_geom,
            geom_layer_type=self.geom_layer_type,
            nf=self.nf,
            hsize=self.hsize,
            up_mode=self.up_mode,
            use_dropout=self.use_dropout,
            pos_encoding=self.pos_encoding,
            num_emb_freqs=self.num_emb_freqs,
            posemb_incl_input=self.posemb_incl_input,
            compute_dtype=self.compute_dtype,
            decoder_impl=self.decoder_impl,
        )
        if self.train_stage == 2:
            self.pose_encoder = UnetNoCond5DS(
                output_nc=self.c_pose,
                nf=self.nf,
                up_mode=self.up_mode,
                use_dropout=False,
            )

    def lookup(self, idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Per-frame pose/transl embedding rows (avatar_model.py:277-278)."""
        return self.pose[idx], self.transl[idx]

    def decode(
        self,
        assets: AvatarAssets,
        batch_size: int,
        inp_posmap: Optional[jax.Array] = None,  # (B, F, F, 3) stage 2
        train: bool = True,
    ):
        """Run the POP decoder -> per-point (offsets*0.02, scales, colors)."""
        geom = jnp.broadcast_to(
            self.geo_feature, (batch_size,) + self.geo_feature.shape[1:]
        )
        pose_featmap = None
        if inp_posmap is not None:
            pose_featmap = self.pose_encoder(inp_posmap, train=train)
        offs, scales, shs = self.pop(
            geom,
            assets.uv_coords,
            assets.valid_idx,
            assets.query_res,
            pose_featmap=pose_featmap,
            train=train,
        )
        return offs * 0.02, scales, shs, pose_featmap

    def __call__(
        self,
        assets: AvatarAssets,
        idx: jax.Array,
        inp_posmap: Optional[jax.Array] = None,
        train: bool = True,
    ):
        # minimal forward used for initialization (touches every submodule)
        pose, transl = self.lookup(idx)
        res, scales, shs, _ = self.decode(
            assets, idx.shape[0], inp_posmap=inp_posmap, train=train
        )
        return res, scales, shs, pose, transl


def pose_gaussians(
    body_model: BodyModel,
    assets: AvatarAssets,
    pose: jax.Array,              # (B, pose_dim) axis-angle
    transl: jax.Array,            # (B, 3)
    point_offsets: jax.Array,     # (B, Nv, 3) already x0.02
    rest_pose: Optional[jax.Array] = None,  # (B, 99) smplx extras
) -> jax.Array:
    """LBS the canonical query points into world space (avatar_model.py:291-314).

    Returns (B, Nv, 3) world positions."""
    B = pose.shape[0]
    betas = jnp.broadcast_to(assets.betas[None], (B, assets.betas.shape[0]))
    kwargs = {}
    if body_model.model_type == "smplx":
        kwargs = dict(
            jaw_pose=rest_pose[:, :3],
            leye_pose=rest_pose[:, 3:6],
            reye_pose=rest_pose[:, 6:9],
            left_hand_pose=rest_pose[:, 9:54],
            right_hand_pose=rest_pose[:, 54:],
        )
    live = body_mod.forward(
        body_model, betas, pose[:, :3], pose[:, 3:], transl=transl, **kwargs
    )
    hi = jax.lax.Precision.HIGHEST
    cano2live = jnp.matmul(live.A, assets.inv_mats[None], precision=hi)  # (B,J,4,4)
    cano_pts = assets.query_points[None] + point_offsets                 # (B,Nv,3)
    pt_mats = jnp.einsum("nj,bjpq->bnpq", assets.query_lbs, cano2live, precision=hi)
    world = (
        jnp.einsum("bnpq,bnq->bnp", pt_mats[..., :3, :3], cano_pts, precision=hi)
        + pt_mats[..., :3, 3]
    )
    return world


def scale_warmup(scales: jax.Array, iteration: jax.Array) -> jax.Array:
    """Reference scale warm-up: scales * 1e-3 * iter while iter < 1000
    (avatar_model.py:316-319)."""
    factor = jnp.where(iteration < 1000, 1e-3 * iteration.astype(scales.dtype), 1.0)
    return scales * factor


def gaussian_attributes(assets: AvatarAssets, scales: jax.Array, shs: jax.Array):
    """Expand isotropic scales to 3 axes, fixed identity rotations and
    opacity=1 for valid points / 0 for padding (avatar_model.py:79-83)."""
    B, Nv = scales.shape[:2]
    scales3 = jnp.repeat(scales, 3, axis=-1)
    rotations = jnp.zeros((Nv, 4), scales.dtype).at[:, 0].set(1.0)
    pad_mask = (jnp.arange(Nv) < assets.num_valid).astype(scales.dtype)
    opacity = pad_mask  # (Nv,)
    return scales3, rotations, opacity
