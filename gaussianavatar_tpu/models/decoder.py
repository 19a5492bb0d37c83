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
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9


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


class _RawDense(nn.Module):
    """Parameter-compatible stand-in for nn.Dense that hands back (kernel,
    bias) instead of applying them — the fused decoder folds the BatchNorm
    scale into the kernel BEFORE the matmul."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        W = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return W, b


class _RawBN(nn.Module):
    """Parameter/stat-compatible stand-in for nn.BatchNorm: owns scale/bias
    params and the running mean/var variables (same names, shapes, dtypes,
    momentum update as flax) but leaves normalization to the caller, which
    computes batch statistics analytically."""

    features: int

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        if batch_mean is None:  # eval: normalize with the running stats
            return scale, bias, ra_mean.value, ra_var.value
        if not self.is_initializing():
            m = _BN_MOMENTUM
            ra_mean.value = m * ra_mean.value + (1.0 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1.0 - m) * batch_var
        return scale, bias, batch_mean, batch_var


@jax.custom_vjp
def _softplus_sv(u):
    return jax.nn.softplus(u)


def _softplus_sv_fwd(u):
    z = jax.nn.softplus(u)
    return z, z


def _softplus_sv_bwd(z, g):
    # softplus is invertible: sigma(u) = 1 - exp(-softplus(u)), so the
    # backward needs only the OUTPUT — the (R, C) pre-activation residual
    # that standard AD would save is never materialized
    z32 = z.astype(jnp.float32)
    return ((g.astype(jnp.float32) * (1.0 - jnp.exp(-z32))).astype(g.dtype),)


_softplus_sv.defvjp(_softplus_sv_fwd, _softplus_sv_bwd)


@jax.custom_vjp
def _relu_sv(u):
    return jax.nn.relu(u)


def _relu_sv_fwd(u):
    z = jax.nn.relu(u)
    return z, z


def _relu_sv_bwd(z, g):
    return (jnp.where(z > 0, g, jnp.zeros_like(g)),)


_relu_sv.defvjp(_relu_sv_fwd, _relu_sv_bwd)


class ShapeDecoderFused(nn.Module):
    """ShapeDecoder with every (Dense -> BatchNorm -> softplus) stage fused
    into matmuls — the HBM-traffic rewrite of the decoder hot path.

    The reference stage (modules.py:508-582 semantics) materializes the
    pre-activation y = xW + b, reduces batch statistics over it, then
    normalizes + activates — ~5 full (R, 128) HBM passes per layer, which is
    why the decoder is activation-bandwidth-bound (BASELINE.md round-4). The
    fused stage exploits the affinity of Dense: with m = mean(x) and
    S = x^T x / R,

        E[y]   = m W + b
        var(y) = diag(W^T S W) + 2 b (m W) + b^2 - E[y]^2

    so the batch statistics come from ONE extra matmul that writes a (C, C)
    matrix instead of reducing over a materialized (R, C) array. BatchNorm
    then folds into the Dense as a column rescale of W and a bias shift, the
    activation fuses into the matmul epilogue, and its backward is
    recomputed from the OUTPUT (sigma(u) = 1 - exp(-softplus(u))) so no
    pre-activation residual is saved. Per stage: ~3 HBM passes (read x
    twice, write z once) and tiny stat tensors.

    Numerics: statistics are exact in f32 (flax's own E[y^2] - E[y]^2 form,
    computed analytically instead of from the rounded y), so outputs agree
    with ShapeDecoder to float tolerance, not bit-exactly. The parameter
    and batch_stats pytrees are IDENTICAL to ShapeDecoder's (same child
    names, shapes, init, momentum), so checkpoints interoperate both ways;
    construct with name="ShapeDecoder_0" where a ShapeDecoder is replaced.
    """

    hsize: int = 128
    actv_fn: str = "softplus"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> Tuple[jax.Array, jax.Array, jax.Array]:
        cdt = jnp.bfloat16 if self.compute_dtype in ("bf16", "bfloat16") else jnp.float32
        actv = _relu_sv if self.actv_fn == "relu" else _softplus_sv
        h = self.hsize
        di = iter(range(14))
        bi = iter(range(11))

        def fused(inp):
            W, b = _RawDense(h, name=f"Dense_{next(di)}")(inp.shape[-1])
            bn = _RawBN(h, name=f"BatchNorm_{next(bi)}")
            if train:
                R = inp.shape[0] * inp.shape[1]
                # f32 stats over the (possibly bf16) activations — the same
                # force_float32_reductions contract as flax BatchNorm
                m = jnp.mean(inp.astype(jnp.float32), axis=(0, 1))
                S = jnp.einsum("bni,bnj->ij", inp, inp,
                               preferred_element_type=jnp.float32) / R
                mw = m @ W
                mu = mw + b
                e2 = jnp.sum(W * (S @ W), axis=0) + 2.0 * b * mw + b * b
                var = jnp.maximum(e2 - mu * mu, 0.0)
                scale, bias, mu, var = bn(mu, var)
            else:
                scale, bias, mu, var = bn()
            s = scale * jax.lax.rsqrt(var + _BN_EPS)
            Wp = (W * s[None, :]).astype(cdt)
            bp = ((b - mu) * s + bias).astype(cdt)
            return actv(inp.astype(cdt) @ Wp + bp)

        def head(inp, f):
            W, b = _RawDense(f, name=f"Dense_{next(di)}")(inp.shape[-1])
            return (inp.astype(cdt) @ W.astype(cdt)
                    + b.astype(cdt)).astype(jnp.float32)

        x1 = fused(x)
        x2 = fused(x1)
        x3 = fused(x2)
        x4 = fused(x3)
        x5 = fused(jnp.concatenate([x.astype(x4.dtype), x4], axis=-1))

        x6 = fused(x5)
        x7 = fused(x6)
        xyz = head(x7, 3)

        n6 = fused(x5)
        n7 = fused(n6)
        scales = nn.sigmoid(head(n7, 1))

        s6 = fused(x5)
        s7 = fused(s6)
        shs = nn.sigmoid(head(s7, 3))

        return xyz, scales, shs
