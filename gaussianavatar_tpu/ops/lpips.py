"""LPIPS (AlexNet backbone) in pure JAX.

The reference uses `lpips.LPIPS(net='alex')` as a training loss
(train.py:26,90) and torchmetrics LPIPS for eval (eval.py:20-25). Pretrained
AlexNet + LPIPS linear weights are NOT redistributable here, so this module
  - implements the exact forward (AlexNet features at relu1..relu5, channel
    unit-normalization, nonneg 1x1 linear heads, spatial mean, stage sum,
    input scaling shift/scale constants),
  - loads weights from `assets/lpips/lpips_alex.npz` if the user converted
    them (scripts/convert_lpips_weights.py does torch->npz), and
  - degrades gracefully (try_load_lpips -> None => the loss term is skipped,
    exactly like training with --no_lpips).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# lpips input normalization constants (ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX_CFG = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def lpips_forward(weights: Dict[str, jnp.ndarray], img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """img0/img1: (B, 3, H, W) in [-1, 1]. Returns mean LPIPS distance."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def feats(x):
        x = (x - shift) / scale
        outs = []
        for i, (_, k, s, p, pool) in enumerate(_ALEX_CFG):
            if pool:
                x = _maxpool3s2(x)
            x = _conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"], s, p)
            x = jax.nn.relu(x)
            outs.append(x)
        return outs

    f0, f1 = feats(img0), feats(img1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{i}"]  # (C,)
        val = jnp.sum(d * lin[None, :, None, None], axis=1, keepdims=True)
        total = total + val.mean(axis=(1, 2, 3))
    return total.mean()


def load_lpips_weights(path: str) -> Dict[str, jnp.ndarray]:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def try_load_lpips(project_path: str) -> Optional[Callable]:
    """Returns a jit-compatible lpips(img0, img1) -> scalar, or None."""
    for cand in (
        os.path.join(project_path, "assets", "lpips", "lpips_alex.npz"),
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                     "assets", "lpips", "lpips_alex.npz"),
    ):
        if os.path.exists(cand):
            weights = load_lpips_weights(cand)
            return partial(lpips_forward, weights)
    return None
