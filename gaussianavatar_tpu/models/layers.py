"""Flax building blocks mirroring the reference torch modules
(/root/reference/model/modules.py:62-232,397-458) with identical math:
same kernel sizes/strides/padding, LeakyReLU(0.2)-before-conv blocks,
affine-free BatchNorm in conv blocks, UNet skip concatenation order.

Layout is NHWC (TPU-native); torch NCHW weights map via (O,I,kh,kw) ->
(kh,kw,I,O) (see tests/test_layers.py for the exact parity harness).
torch ConvTranspose2d(k=4,s=2,p=1) is expressed as an input-dilated
correlation (lhs_dilation=2, pad k-1-p=2) so its numerics match exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9)
_BN_KW = dict(epsilon=1e-5, momentum=0.9)


def conv_transpose_torch(x: jax.Array, kernel: jax.Array, stride: int = 2, torch_padding: int = 1) -> jax.Array:
    """torch ConvTranspose2d numerics: dilate input by `stride`, pad by
    (k-1-torch_padding), correlate. `kernel` is HWIO with spatial taps already
    stored flipped relative to the torch layout (we own initialization, so
    this only matters when porting torch weights)."""
    k = kernel.shape[0]
    pad = k - 1 - torch_padding
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ConvTranspose4x4s2(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1): exact 2x upsampler."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (4, 4, x.shape[-1], self.features),
        )
        y = conv_transpose_torch(x, kernel, stride=2, torch_padding=1)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class Conv2DBlock(nn.Module):
    """[LeakyReLU(0.2)] -> Conv(k,s,p) -> [BatchNorm(affine=False)]
    (reference modules.py:62-78; the activation comes FIRST)."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    use_bn: bool = True
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.use_relu:
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, use_bias=False, use_scale=False, **_BN_KW
            )(x)
        return x


class UpConv2DBlock(nn.Module):
    """ReLU -> upconv/upsample -> [BN(affine=False)] -> [Dropout] -> concat skip
    (reference modules.py:81-111)."""

    features: int
    use_bias: bool = False
    use_bn: bool = True
    up_mode: str = "upconv"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, skip_input=None, train: bool = True):
        x = nn.relu(x)
        if self.up_mode == "upconv":
            x = ConvTranspose4x4s2(self.features, use_bias=self.use_bias)(x)
        else:  # 'upsample': bilinear 2x (align_corners=False) + conv3x3
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
            x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True)(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, use_bias=False, use_scale=False, **_BN_KW
            )(x)
        if self.use_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        if skip_input is not None:
            x = jnp.concatenate([x, skip_input], axis=-1)
        return x


class GeomConvLayers(nn.Module):
    """3x conv5x5 (stride 1, pad 2, no bias) geometric feature smoother
    (reference modules.py:114-137)."""

    hidden_nc: int = 64
    output_nc: int = 64
    use_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, feats in enumerate([self.hidden_nc, self.hidden_nc, self.output_nc]):
            x = nn.Conv(feats, (5, 5), padding=[(2, 2), (2, 2)], use_bias=False)(x)
            if self.use_relu and i < 2:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class GeomConvBottleneckLayers(nn.Module):
    """U-net-like bottleneck smoother: 3 stride-2 convs down, 3 up
    (reference modules.py:140-165)."""

    hidden_nc: int = 64
    output_nc: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = lambda f: nn.Conv(f, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2, use_bias=False)
        x = c(self.hidden_nc)(x)
        x = c(self.hidden_nc * 2)(x)
        x = c(self.hidden_nc * 4)(x)
        x = ConvTranspose4x4s2(self.hidden_nc * 2, use_bias=False)(x)
        x = ConvTranspose4x4s2(self.hidden_nc, use_bias=False)(x)
        x = ConvTranspose4x4s2(self.output_nc, use_bias=False)(x)
        return x


class UnetNoCond5DS(nn.Module):
    """5-downsample UNet (reference modules.py:185-232). Used as the stage-2
    pose encoder (avatar_model.py:140-146) and optional geometry smoother."""

    output_nc: int = 3
    nf: int = 64
    up_mode: str = "upconv"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        d1 = Conv2DBlock(self.nf, use_bias=False, use_bn=False, use_relu=False)(x, train)
        d2 = Conv2DBlock(2 * self.nf)(d1, train)
        d3 = Conv2DBlock(4 * self.nf)(d2, train)
        d4 = Conv2DBlock(8 * self.nf)(d3, train)
        d5 = Conv2DBlock(8 * self.nf, use_bn=False)(d4, train)

        u1 = UpConv2DBlock(8 * self.nf, up_mode=self.up_mode)(d5, d4, train)
        u2 = UpConv2DBlock(4 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u1, d3, train)
        u3 = UpConv2DBlock(2 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u2, d2, train)
        u4 = UpConv2DBlock(1 * self.nf, up_mode=self.up_mode)(u3, d1, train)
        u5 = UpConv2DBlock(self.output_nc, use_bn=False, use_bias=True, up_mode=self.up_mode)(u4, None, train)
        return u5


class UnetNoCond6DS(nn.Module):
    """6-downsample UNet (reference modules.py:235-288)."""

    output_nc: int = 3
    nf: int = 64
    up_mode: str = "upconv"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        d1 = Conv2DBlock(self.nf, use_bias=False, use_bn=False, use_relu=False)(x, train)
        d2 = Conv2DBlock(2 * self.nf)(d1, train)
        d3 = Conv2DBlock(4 * self.nf)(d2, train)
        d4 = Conv2DBlock(8 * self.nf)(d3, train)
        d5 = Conv2DBlock(8 * self.nf)(d4, train)
        d6 = Conv2DBlock(8 * self.nf, use_bn=False)(d5, train)

        u1 = UpConv2DBlock(8 * self.nf, up_mode=self.up_mode)(d6, d5, train)
        u2 = UpConv2DBlock(8 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u1, d4, train)
        u3 = UpConv2DBlock(8 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u2, d3, train)
        u4 = UpConv2DBlock(4 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u3, d2, train)
        u5 = UpConv2DBlock(2 * self.nf, up_mode="upsample")(u4, d1, train)
        u6 = UpConv2DBlock(self.output_nc, use_bn=False, use_bias=True, up_mode="upsample")(u5, None, train)
        return u6


class UnetNoCond7DS(nn.Module):
    """7-downsample UNet (reference modules.py:397-458)."""

    output_nc: int = 3
    nf: int = 64
    up_mode: str = "upconv"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        d1 = Conv2DBlock(self.nf, use_bias=False, use_bn=False, use_relu=False)(x, train)
        d2 = Conv2DBlock(2 * self.nf)(d1, train)
        d3 = Conv2DBlock(4 * self.nf)(d2, train)
        d4 = Conv2DBlock(8 * self.nf)(d3, train)
        d5 = Conv2DBlock(8 * self.nf)(d4, train)
        d6 = Conv2DBlock(8 * self.nf)(d5, train)
        d7 = Conv2DBlock(8 * self.nf, use_bn=False)(d6, train)

        u1 = UpConv2DBlock(8 * self.nf, up_mode=self.up_mode)(d7, d6, train)
        u2 = UpConv2DBlock(8 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u1, d5, train)
        u3 = UpConv2DBlock(8 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u2, d4, train)
        u4 = UpConv2DBlock(4 * self.nf, up_mode=self.up_mode, use_dropout=self.use_dropout)(u3, d3, train)
        u5 = UpConv2DBlock(2 * self.nf, up_mode="upsample")(u4, d2, train)
        u6 = UpConv2DBlock(1 * self.nf, up_mode="upsample")(u5, d1, train)
        u7 = UpConv2DBlock(self.output_nc, use_bn=False, use_bias=True, up_mode="upsample")(u6, None, train)
        return u7
