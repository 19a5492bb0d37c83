"""ShapeDecoder — the POP-style per-point MLP head
(/root/reference/model/modules.py:508-582).

8 pointwise layers (torch Conv1d(k=1) == Dense over a points axis) with a
DeepSDF-style input skip into layer 5, BatchNorm1d (affine) + softplus after
every hidden layer, and three output branches:
  xyz offsets (raw), isotropic scale (1ch, sigmoid), rgb color (3ch, sigmoid).

TPU-first layout: points-last is replaced by channels-last (B, N, C) so each
layer is one big (B*N, C)x(C, H) MXU matmul; BatchNorm normalizes per-channel
over (B, N) exactly like torch BatchNorm1d on (B, C, N).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_BN_KW = dict(epsilon=1e-5, momentum=0.9, use_bias=True, use_scale=True)


class ShapeDecoder(nn.Module):
    hsize: int = 128
    actv_fn: str = "softplus"
    # "bfloat16" runs the Dense matmuls AND the inter-layer activations
    # (BatchNorm normalize + softplus) in bf16; params stay float32 (flax
    # casts per call) and the BN mean/var reductions are always computed
    # in float32 (flax _compute_stats force_float32_reductions) — the one
    # place bf16 accumulation over ~2e5 points would actually lose bits.
    # Output heads return float32. The decoder is activation-BANDWIDTH
    # bound (11 BN stages round-tripping (2·205k,128) activations between
    # 128-wide matmuls), so halving activation bytes is the lever, not the
    # matmul FLOPs — measured numbers in BASELINE.md round-4 "bf16 decoder
    # matmuls". Default float32 (bit-identical to the pre-knob program);
    # enable via NetworkParams.bf16_decoder.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """x: (B, N, in_size) per-point features (uv + pixel feature).

        Returns (xyz (B,N,3), scales (B,N,1), shs (B,N,3))."""
        cdt = jnp.bfloat16 if self.compute_dtype in ("bf16", "bfloat16") else jnp.float32
        actv = nn.relu if self.actv_fn == "relu" else nn.softplus
        bn = lambda: nn.BatchNorm(use_running_average=not train, axis=-1,
                                  dtype=cdt, **_BN_KW)
        dense = lambda f: nn.Dense(f, use_bias=True, dtype=cdt)

        x1 = actv(bn()(dense(self.hsize)(x)))
        x2 = actv(bn()(dense(self.hsize)(x1)))
        x3 = actv(bn()(dense(self.hsize)(x2)))
        x4 = actv(bn()(dense(self.hsize)(x3)))
        x5 = actv(bn()(dense(self.hsize)(jnp.concatenate([x, x4], axis=-1))))

        # position branch
        x6 = actv(bn()(dense(self.hsize)(x5)))
        x7 = actv(bn()(dense(self.hsize)(x6)))
        xyz = dense(3)(x7).astype(jnp.float32)

        # scale branch (isotropic, 1 channel)
        n6 = actv(bn()(dense(self.hsize)(x5)))
        n7 = actv(bn()(dense(self.hsize)(n6)))
        scales = nn.sigmoid(dense(1)(n7).astype(jnp.float32))

        # color branch
        s6 = actv(bn()(dense(self.hsize)(x5)))
        s7 = actv(bn()(dense(self.hsize)(s6)))
        shs = nn.sigmoid(dense(3)(s7).astype(jnp.float32))

        return xyz, scales, shs
