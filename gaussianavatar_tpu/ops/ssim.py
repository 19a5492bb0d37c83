"""SSIM loss matching the reference implementation exactly
(/root/reference/utils/loss_utils.py:13-53): 11x11 Gaussian window, sigma 1.5,
depthwise conv with same-padding, C1=0.01^2, C2=0.03^2, mean over all pixels.
Differentiable; used inside the jitted train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_filter(img: jax.Array, g1d: jax.Array, pad: int) -> jax.Array:
    """(B, C, H, W) depthwise conv with the separable Gaussian window
    (outer(g, g) == conv by g along H then W), zero same-pad. Separability
    turns 121 taps into 22 — ~5x fewer MXU passes than the 2D window."""
    C = img.shape[1]
    k = g1d.shape[0]
    kh = jnp.broadcast_to(g1d.reshape(1, 1, k, 1), (C, 1, k, 1))
    kw = jnp.broadcast_to(g1d.reshape(1, 1, 1, k), (C, 1, 1, k))
    # HIGHEST precision is load-bearing: the sigma terms are E[x^2] - mu^2
    # cancellations; TPU bf16 convs make SSIM exceed 1 (observed 2.25).
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = conv(img, kh, padding=[(pad, pad), (0, 0)])
    return conv(x, kw, padding=[(0, 0), (pad, pad)])


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    size_average: bool = True,
) -> jax.Array:
    """Structural similarity of two (B, C, H, W) (or (C, H, W)) image batches."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    g1d = jnp.asarray(_gaussian_1d(window_size, 1.5), img1.dtype)
    pad = window_size // 2

    # one fused depthwise conv over all five moment maps
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1
    )
    C = img1.shape[1]
    f = _depthwise_filter(stacked, g1d, pad)
    mu1, mu2 = f[:, :C], f[:, C : 2 * C]

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = f[:, 2 * C : 3 * C] - mu1_sq
    sigma2_sq = f[:, 3 * C : 4 * C] - mu2_sq
    sigma12 = f[:, 4 * C :] - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-image PSNR over flattened pixels (reference utils/image_utils.py:7-9)."""
    b = img1.shape[0] if img1.ndim == 4 else 1
    mse = ((img1.reshape(b, -1) - img2.reshape(b, -1)) ** 2).mean(axis=1, keepdims=True)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def l1_loss(network_output: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.abs(network_output - gt).mean()


def l2_loss(network_output: jax.Array, gt: jax.Array) -> jax.Array:
    return ((network_output - gt) ** 2).mean()
