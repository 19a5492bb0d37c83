"""POPDecoder — the avatar's geometry/appearance network, capability parity
with reference `POP_no_unet` (/root/reference/model/network.py:9-83):

  geometry feature tensor (B, F, F, C)
    -> optional smoother ('conv' | 'bottleneck' | 'unet', network.py:24-32)
    -> (+ pose feature map, stage 2)
    -> bilinear upsample to the query UV resolution (exact grid_sample parity
       via `pop_upsample`)
    -> gather the valid UV pixels       <- TPU design choice: the reference
       runs its MLP over ALL R^2 UV pixels then selects valid ones
       (avatar_model.py:308-309); the decoder is pointwise, so we gather
       first and run the MLP only on the ~40% valid points (2.6x less MXU
       work). BatchNorm statistics are then over valid points only.
    -> ShapeDecoder MLP -> (offsets, isotropic scales, colors) per point.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gaussianavatar_tpu.models.decoder import ShapeDecoder, ShapeDecoderFused
from gaussianavatar_tpu.models.layers import (
    GeomConvBottleneckLayers,
    GeomConvLayers,
    UnetNoCond5DS,
)
from gaussianavatar_tpu.ops.resample import pop_upsample


class POPDecoder(nn.Module):
    c_geom: int = 64
    geom_layer_type: Optional[str] = "conv"
    nf: int = 32
    hsize: int = 128
    up_mode: str = "upconv"
    use_dropout: bool = False
    pos_encoding: bool = False      # NeRF-encode the uv query coords
    num_emb_freqs: int = 6
    posemb_incl_input: bool = False
    compute_dtype: str = "float32"  # ShapeDecoder matmul dtype (see decoder.py)
    # "fused" = ShapeDecoderFused: analytic-BN matmul-folded stages (~3 HBM
    # passes/layer vs ~5; float-tolerance vs "ref", identical param pytree —
    # decoder.py). Checkpoints interoperate: the fused module is named
    # "ShapeDecoder_0" so either impl loads either checkpoint.
    decoder_impl: str = "ref"

    @nn.compact
    def __call__(
        self,
        geom_featmap: jax.Array,        # (B, F, F, C) NHWC
        uv_coords: jax.Array,           # (Nv, 2) normalized uv of the valid pixels
        valid_idx: jax.Array,           # (Nv,) int32 flat indices into R*R
        query_res: int,                 # R
        pose_featmap: Optional[jax.Array] = None,  # (B, F, F, C) stage 2
        train: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if self.geom_layer_type == "conv":
            geom_featmap = GeomConvLayers(self.c_geom, self.c_geom)(geom_featmap, train)
        elif self.geom_layer_type == "bottleneck":
            geom_featmap = GeomConvBottleneckLayers(self.c_geom, self.c_geom)(geom_featmap, train)
        elif self.geom_layer_type == "unet":
            geom_featmap = UnetNoCond5DS(self.c_geom, self.nf, self.up_mode, self.use_dropout)(geom_featmap, train)

        pix_feature = geom_featmap if pose_featmap is None else geom_featmap + pose_featmap

        B = pix_feature.shape[0]
        up = pop_upsample(pix_feature, query_res)           # (B, R, R, C)
        flat = up.reshape(B, query_res * query_res, -1)
        pts = flat[:, valid_idx, :]                          # (B, Nv, C)

        if self.pos_encoding:
            from gaussianavatar_tpu.ops.embedder import get_embedder

            embed, _ = get_embedder(
                self.num_emb_freqs, input_dims=2,
                include_input=self.posemb_incl_input,
            )
            uv_coords = embed(uv_coords)
        uv = jnp.broadcast_to(uv_coords[None], (B,) + uv_coords.shape)
        feats = jnp.concatenate([pts, uv], axis=-1)          # (B, Nv, C+uv)

        if self.decoder_impl == "fused":
            return ShapeDecoderFused(hsize=self.hsize,
                                     compute_dtype=self.compute_dtype,
                                     name="ShapeDecoder_0")(feats, train)
        return ShapeDecoder(hsize=self.hsize, compute_dtype=self.compute_dtype)(feats, train)
