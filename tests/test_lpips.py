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


def _fake_raw_pth_pair(d):
    """Write a fake torchvision AlexNet state dict + lpips v0.1 lin heads in
    the real key layouts, via our torch-free writer."""
    from gaussianavatar_tpu.utils.torch_pth import save_pth

    rng = np.random.default_rng(7)
    tv_idx = (0, 3, 6, 8, 10)
    feat, lins = {}, {}
    in_ch = 3
    for i, (out_ch, k, s, p, pool) in enumerate(_ALEX_CFG):
        feat[f"features.{tv_idx[i]}.weight"] = rng.normal(
            scale=0.05, size=(out_ch, in_ch, k, k)).astype(np.float32)
        feat[f"features.{tv_idx[i]}.bias"] = rng.normal(
            scale=0.01, size=(out_ch,)).astype(np.float32)
        lins[f"lin{i}.model.1.weight"] = rng.uniform(
            0, 0.1, size=(1, out_ch, 1, 1)).astype(np.float32)
        in_ch = out_ch
    # classifier keys exist in real checkpoints; must be ignored
    feat["classifier.1.weight"] = np.zeros((4096, 9216), np.float32)[:2, :2]
    save_pth(feat, str(d / "alexnet.pth"))
    save_pth(lins, str(d / "alex.pth"))
    return feat, lins


def test_weights_from_pth(tmp_path):
    from gaussianavatar_tpu.ops.lpips import weights_from_pth

    feat, lins = _fake_raw_pth_pair(tmp_path)
    w = weights_from_pth(str(tmp_path / "alexnet.pth"), str(tmp_path / "alex.pth"))
    for i in range(5):
        np.testing.assert_array_equal(w[f"conv{i}_w"], feat[f"features.{(0,3,6,8,10)[i]}.weight"])
        np.testing.assert_array_equal(w[f"lin{i}"], lins[f"lin{i}.model.1.weight"].reshape(-1))


def test_try_load_lpips_accepts_raw_pth_pair(tmp_path):
    from gaussianavatar_tpu.ops.lpips import lpips_status, try_load_lpips

    project = tmp_path / "proj"
    assert try_load_lpips(str(project)) is None
    assert "inactive" in lpips_status(str(project))

    d = project / "assets" / "lpips"
    d.mkdir(parents=True)
    _fake_raw_pth_pair(d)
    fn = try_load_lpips(str(project))
    assert fn is not None
    assert lpips_status(str(project)) == "active"
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
    v = float(fn(a, b))
    assert np.isfinite(v) and v > 0
    assert abs(float(fn(a, a))) < 1e-7


def test_lpips_epoch_gate():
    """The 0.2*LPIPS term joins the loss only after lpips_start_iter epochs
    (reference train.py:89-91) and only when weights exist."""
    from gaussianavatar_tpu.config import OptimizationParams
    from gaussianavatar_tpu.engine.loop import lpips_gate_value

    opt = OptimizationParams()
    assert opt.lpips_start_iter == 30  # reference default
    assert lpips_gate_value(True, 30, opt) == 0.0
    assert lpips_gate_value(True, 31, opt) == 1.0
    assert lpips_gate_value(False, 31, opt) == 0.0


def test_train_step_applies_gated_lpips():
    """make_train_step with an lpips_fn: gate=0 excludes the term from the
    total, gate=1 adds exactly lambda_lpips * lpips."""
    import jax

    import __graft_entry__ as graft
    from gaussianavatar_tpu.engine.train_step import make_train_step

    net, model, assets, tx, opt, H, W, raster_cfg, state, batch = graft._build_tiny(
        query_res=32, image_hw=32, n_frames=2, batch_size=2
    )
    weights = {k: jnp.asarray(v) for k, v in _random_weights().items()}
    lpips_fn = lambda x, y: lpips_forward(weights, x, y)
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), raster_cfg,
        train_stage=1, lpips_fn=lpips_fn,
    )

    def copy(t):
        return jax.tree.map(jnp.array, t)

    _, t0, _ = step(copy(state), batch, jnp.float32(10.0), jnp.float32(0.0), jnp.float32(0.0))
    _, t1, _ = step(copy(state), batch, jnp.float32(10.0), jnp.float32(0.0), jnp.float32(1.0))
    vgg = float(t1["vgg"])
    assert vgg > 0
    # same data, same params: totals differ by exactly the gated vgg term
    np.testing.assert_allclose(
        float(t1["total"]) - float(t0["total"]), vgg, rtol=1e-4, atol=1e-6
    )
