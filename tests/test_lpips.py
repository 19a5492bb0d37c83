"""LPIPS architecture parity: our JAX forward vs an equivalent torch AlexNet
LPIPS built inline with the SAME (random) weights — validates every
architectural detail (pads, strides, pools, normalization, scaling layer)
without the license-gated pretrained files."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gaussianavatar_tpu.ops.lpips import _ALEX_CFG, _SCALE, _SHIFT, lpips_forward


def torch_lpips(weights, img0, img1):
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        outs = []
        for i, (_, k, s, p, pool) in enumerate(_ALEX_CFG):
            if pool:
                x = F.max_pool2d(x, 3, 2)
            w = torch.from_numpy(np.asarray(weights[f"conv{i}_w"]))
            b = torch.from_numpy(np.asarray(weights[f"conv{i}_b"]))
            x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
            outs.append(x)
        return outs

    f0, f1 = feats(img0), feats(img1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        lin = torch.from_numpy(np.asarray(weights[f"lin{i}"])).view(1, -1, 1, 1)
        total = total + (d * lin).sum(1, keepdim=True).mean(dim=(1, 2, 3))
    return total.mean()


def _random_weights(seed=0):
    rng = np.random.default_rng(seed)
    weights = {}
    in_ch = 3
    for i, (out_ch, k, s, p, pool) in enumerate(_ALEX_CFG):
        weights[f"conv{i}_w"] = (rng.normal(scale=0.05, size=(out_ch, in_ch, k, k))).astype(np.float32)
        weights[f"conv{i}_b"] = rng.normal(scale=0.01, size=(out_ch,)).astype(np.float32)
        weights[f"lin{i}"] = rng.uniform(0, 0.1, size=(out_ch,)).astype(np.float32)
        in_ch = out_ch
    return weights


def test_lpips_matches_torch_equivalent():
    weights = _random_weights()
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    ours = float(lpips_forward({k: jnp.asarray(v) for k, v in weights.items()},
                               jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch_lpips(weights, torch.from_numpy(a), torch.from_numpy(b)))
    assert abs(ours - ref) < 1e-4 * max(1.0, abs(ref)), (ours, ref)


def test_lpips_zero_for_identical():
    weights = _random_weights()
    a = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
    w = {k: jnp.asarray(v) for k, v in weights.items()}
    assert abs(float(lpips_forward(w, a, a))) < 1e-7


def test_lpips_differentiable():
    import jax

    weights = {k: jnp.asarray(v) for k, v in _random_weights().items()}
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
    g = jax.grad(lambda x: lpips_forward(weights, x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
