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


# torchvision AlexNet `features` indices of the 5 conv layers
_TV_CONV_IDX = (0, 3, 6, 8, 10)


def weights_from_pth(alexnet_pth: str, lins_pth: str) -> Dict[str, np.ndarray]:
    """Build the weight dict directly from the user-supplied raw torch files —
    the torchvision AlexNet state dict (`alexnet-owt-*.pth`) and the lpips
    v0.1 linear heads (`lpips/weights/v0.1/alex.pth`) — via the torch-free
    .pth reader. No torch, no lpips package, no network."""
    from gaussianavatar_tpu.utils.torch_pth import load_pth

    feat = load_pth(alexnet_pth)
    if isinstance(feat, dict) and "state_dict" in feat:
        feat = feat["state_dict"]
    lins = load_pth(lins_pth)
    if isinstance(lins, dict) and "state_dict" in lins:
        lins = lins["state_dict"]

    out: Dict[str, np.ndarray] = {}
    for i, li in enumerate(_TV_CONV_IDX):
        out[f"conv{i}_w"] = np.asarray(feat[f"features.{li}.weight"], np.float32)
        out[f"conv{i}_b"] = np.asarray(feat[f"features.{li}.bias"], np.float32)
        expect = _ALEX_CFG[i][0]
        if out[f"conv{i}_w"].shape[0] != expect:
            raise ValueError(
                f"{alexnet_pth}: features.{li}.weight has "
                f"{out[f'conv{i}_w'].shape[0]} out-channels, expected {expect}"
            )
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                  f"lin{i}.weight"):
            if k in lins:
                out[f"lin{i}"] = np.asarray(lins[k], np.float32).reshape(-1)
                break
        else:
            raise KeyError(f"{lins_pth}: no lin{i} weight found "
                           f"(keys: {sorted(lins)[:8]}...)")
    return out


_ALEXNET_PTH_NAMES = ("alexnet.pth", "alexnet-owt-7be5be79.pth",
                      "alexnet-owt-4df8aa71.pth")
_LINS_PTH_NAMES = ("alex.pth", "lpips_alex.pth", "alex_lins.pth")


def _find(dirpath: str, names) -> Optional[str]:
    for n in names:
        p = os.path.join(dirpath, n)
        if os.path.exists(p):
            return p
    return None


def try_load_lpips(project_path: str) -> Optional[Callable]:
    """Returns a jit-compatible lpips(img0, img1) -> scalar, or None.

    Search order per directory ({project}/assets/lpips, {repo}/assets/lpips):
      1. lpips_alex.npz — pre-converted;
      2. raw torch files dropped in by the user: a torchvision AlexNet state
         dict + the lpips v0.1 'alex.pth' linear heads (read torch-free)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    for d in (os.path.join(project_path, "assets", "lpips"),
              os.path.join(repo_root, "assets", "lpips")):
        npz = os.path.join(d, "lpips_alex.npz")
        if os.path.exists(npz):
            return partial(lpips_forward, load_lpips_weights(npz))
        alexnet = _find(d, _ALEXNET_PTH_NAMES)
        lins = _find(d, _LINS_PTH_NAMES)
        if alexnet and lins:
            weights = {k: jnp.asarray(v) for k, v in
                       weights_from_pth(alexnet, lins).items()}
            return partial(lpips_forward, weights)
    return None


def lpips_status(project_path: str) -> str:
    """Human-readable status string recorded in results.txt / metrics.jsonl
    so a silently-skipped LPIPS term is visible (round-1 weak point #3)."""
    if try_load_lpips(project_path) is not None:
        return "active"
    return ("inactive (no weights: drop lpips_alex.npz or "
            "alexnet*.pth + alex.pth under assets/lpips/)")
