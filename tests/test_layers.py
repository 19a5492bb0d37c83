"""Numerical parity of the Flax building blocks against torch equivalents
(torch built inline here via its public API — the test defines the expected
semantics the reference relies on: LeakyReLU-first conv blocks, affine-free
BatchNorm, ConvTranspose2d(4,2,1) upsampling, BatchNorm1d over points."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gaussianavatar_tpu.models.layers import (
    Conv2DBlock,
    ConvTranspose4x4s2,
    GeomConvLayers,
    UnetNoCond5DS,
    UnetNoCond6DS,
    UnetNoCond7DS,
)
from gaussianavatar_tpu.models.decoder import ShapeDecoder
from gaussianavatar_tpu.models.pop import POPDecoder


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def conv_w_to_flax(w):  # torch (O,I,kh,kw) -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def convT_w_to_flax(w):  # torch ConvTranspose (I,O,kh,kw) -> flipped HWIO
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def test_conv_block_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)

    tconv = torch.nn.Conv2d(8, 12, 4, 2, 1, bias=False)
    tbn = torch.nn.BatchNorm2d(12, affine=False)
    with torch.no_grad():
        y_t = tbn(tconv(F.leaky_relu(torch.from_numpy(x), 0.2)))

    blk = Conv2DBlock(features=12)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)))
    variables = {
        "params": {"Conv_0": {"kernel": jnp.asarray(conv_w_to_flax(tconv.weight.detach().numpy()))}},
        "batch_stats": variables["batch_stats"],
    }
    y_j, _ = blk.apply(variables, jnp.asarray(to_nhwc(x)), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(to_nhwc(y_t.numpy()), np.asarray(y_j), atol=1e-4)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(6, 10, 4, 2, 1, bias=False)
    with torch.no_grad():
        y_t = tconv(torch.from_numpy(x))

    mod = ConvTranspose4x4s2(features=10)
    variables = {"params": {"kernel": jnp.asarray(convT_w_to_flax(tconv.weight.detach().numpy()))}}
    y_j = mod.apply(variables, jnp.asarray(to_nhwc(x)))
    assert y_j.shape == (2, 16, 16, 10)
    np.testing.assert_allclose(to_nhwc(y_t.numpy()), np.asarray(y_j), atol=1e-4)


def test_bilinear_upsample_matches_torch():
    """The 'upsample' UpConv mode: torch nn.Upsample(bilinear, scale=2,
    align_corners=False) == jax.image.resize bilinear."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 7, 7)).astype(np.float32)
    with torch.no_grad():
        y_t = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=False)
    y_j = jax.image.resize(jnp.asarray(to_nhwc(x)), (1, 14, 14, 3), method="bilinear")
    np.testing.assert_allclose(to_nhwc(y_t.numpy()), np.asarray(y_j), atol=1e-5)


def test_batchnorm1d_points_semantics():
    """torch BatchNorm1d on (B,C,N) == flax BatchNorm on (B,N,C): stats over
    (B,N) per channel, affine applied, running stats momentum 0.1."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 40)).astype(np.float32)  # (B,C,N)
    tbn = torch.nn.BatchNorm1d(5)
    with torch.no_grad():
        tbn.weight[:] = torch.from_numpy(rng.normal(size=5).astype(np.float32))
        tbn.bias[:] = torch.from_numpy(rng.normal(size=5).astype(np.float32))
    tbn.train()
    y_t = tbn(torch.from_numpy(x)).detach().numpy()

    from flax import linen as nn

    bn = nn.BatchNorm(use_running_average=False, epsilon=1e-5, momentum=0.9)
    xj = jnp.asarray(np.transpose(x, (0, 2, 1)))  # (B,N,C)
    variables = bn.init(jax.random.PRNGKey(0), xj)
    variables["params"]["scale"] = jnp.asarray(tbn.weight.detach().numpy())
    variables["params"]["bias"] = jnp.asarray(tbn.bias.detach().numpy())
    y_j, new_state = bn.apply(variables, xj, mutable=["batch_stats"])
    np.testing.assert_allclose(np.transpose(y_t, (0, 2, 1)), np.asarray(y_j), atol=1e-4)
    # running stats: torch running_mean after one step = 0.9*0 + 0.1*batch_mean
    np.testing.assert_allclose(
        tbn.running_mean.numpy(),
        np.asarray(new_state["batch_stats"]["mean"]),
        atol=1e-4,
    )


def test_geom_conv_layers_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 64, 32, 32)).astype(np.float32)
    t1 = torch.nn.Conv2d(64, 64, 5, 1, 2, bias=False)
    t2 = torch.nn.Conv2d(64, 64, 5, 1, 2, bias=False)
    t3 = torch.nn.Conv2d(64, 64, 5, 1, 2, bias=False)
    with torch.no_grad():
        y_t = t3(t2(t1(torch.from_numpy(x))))

    mod = GeomConvLayers(hidden_nc=64, output_nc=64)
    params = {
        "params": {
            f"Conv_{i}": {"kernel": jnp.asarray(conv_w_to_flax(t.weight.detach().numpy()))}
            for i, t in enumerate([t1, t2, t3])
        }
    }
    y_j = mod.apply(params, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nhwc(y_t.numpy()), np.asarray(y_j), atol=2e-4)


def test_unet_shapes():
    """UNets must consume a 2^k-sized posmap and emit the same resolution
    (stage-2 pose encoder: 128x128x3 -> 128x128x64, avatar_model.py:140-146)."""
    x = jnp.zeros((2, 128, 128, 3))
    for cls in (UnetNoCond5DS, UnetNoCond6DS, UnetNoCond7DS):
        m = cls(output_nc=64, nf=32)
        variables = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 128, 128, 64), cls.__name__


def test_shape_decoder_outputs_and_ranges():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 300, 66)).astype(np.float32))
    m = ShapeDecoder(hsize=128)
    variables = m.init(jax.random.PRNGKey(0), x)
    (xyz, scales, shs), _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert xyz.shape == (2, 300, 3)
    assert scales.shape == (2, 300, 1)
    assert shs.shape == (2, 300, 3)
    assert float(scales.min()) >= 0 and float(scales.max()) <= 1
    assert float(shs.min()) >= 0 and float(shs.max()) <= 1
    # 19 dense layers: 8 trunk (incl. skip) + 2 heads x3 branches + 3 outputs
    n_dense = sum(1 for k in variables["params"] if k.startswith("Dense_"))
    assert n_dense == 14


def test_pop_decoder_end_to_end():
    rng = np.random.default_rng(6)
    B, F_, R = 2, 32, 64
    geom = jnp.asarray(rng.normal(scale=0.01, size=(B, F_, F_, 16)).astype(np.float32))
    valid = np.flatnonzero(rng.uniform(size=R * R) < 0.3).astype(np.int32)
    uv = jnp.asarray(
        np.stack([valid // R, valid % R], 1).astype(np.float32) / (R - 1)
    )
    m = POPDecoder(c_geom=16, hsize=32, nf=8)
    variables = m.init(jax.random.PRNGKey(0), geom, uv, jnp.asarray(valid), R)
    (xyz, scales, shs), _ = m.apply(
        variables, geom, uv, jnp.asarray(valid), R, train=True, mutable=["batch_stats"]
    )
    assert xyz.shape == (B, len(valid), 3)

    # gradient flows back to the geometry featmap
    def loss(g):
        (o, s, c), _ = m.apply(variables, g, uv, jnp.asarray(valid), R, train=True, mutable=["batch_stats"])
        return (o**2).mean() + (s.mean() - 0.3) ** 2

    grad = jax.grad(loss)(geom)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0


def test_shape_decoder_bf16_matches_f32():
    """The bf16 compute_dtype knob (NetworkParams.bf16_decoder) reuses the
    SAME f32 params/batch_stats pytree (flax casts per call) and must stay
    a rounding-level perturbation of the f32 program: outputs within bf16
    tolerance, BatchNorm statistics (updated in f32 on both paths)
    near-identical, grads finite, f32-dtyped, and directionally aligned."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 400, 66)).astype(np.float32))
    m32 = ShapeDecoder(hsize=128)
    m16 = ShapeDecoder(hsize=128, compute_dtype="bfloat16")
    variables = m32.init(jax.random.PRNGKey(1), x)
    # the identical pytree works for both modules (params stay f32 under bf16)
    (xyz32, sc32, sh32), mut32 = m32.apply(variables, x, train=True, mutable=["batch_stats"])
    (xyz16, sc16, sh16), mut16 = m16.apply(variables, x, train=True, mutable=["batch_stats"])
    assert xyz16.dtype == jnp.float32 and sc16.dtype == jnp.float32
    # bf16 keeps ~3 decimal digits; activations are O(1) after BN
    np.testing.assert_allclose(np.asarray(xyz16), np.asarray(xyz32), atol=0.05)
    np.testing.assert_allclose(np.asarray(sc16), np.asarray(sc32), atol=0.02)
    np.testing.assert_allclose(np.asarray(sh16), np.asarray(sh32), atol=0.02)
    # BN statistics are computed in f32 on both paths
    for v32, v16 in zip(
        jax.tree_util.tree_leaves(mut32["batch_stats"]),
        jax.tree_util.tree_leaves(mut16["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(v16), np.asarray(v32), atol=5e-3)

    def loss(m, params):
        (xyz, sc, sh), _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(xyz**2) + jnp.sum(sc) + jnp.sum(sh)

    g32 = jax.grad(lambda p: loss(m32, p))(variables["params"])
    g16 = jax.grad(lambda p: loss(m16, p))(variables["params"])
    l32, l16 = jax.tree_util.tree_leaves(g32), jax.tree_util.tree_leaves(g16)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in l16)
    flat32 = jnp.concatenate([g.reshape(-1) for g in l32])
    flat16 = jnp.concatenate([g.reshape(-1) for g in l16])
    assert flat16.dtype == jnp.float32
    cos = float(jnp.vdot(flat32, flat16)
                / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12))
    assert cos > 0.99, cos


def test_shape_decoder_fused_matches_ref():
    """ShapeDecoderFused (analytic-BN matmul-folded stages, decoder.py) must
    be a float-tolerance twin of ShapeDecoder on the SAME variables pytree:
    identical param/stat structure, matching outputs, matching updated
    BatchNorm statistics (the analytic E[y^2]-E[y]^2 equals flax's computed
    form), matching grads (incl. through the stats path), and matching
    eval-mode (running-stats) outputs."""
    from gaussianavatar_tpu.models.decoder import ShapeDecoderFused

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 400, 66)).astype(np.float32))
    ref = ShapeDecoder(hsize=128)
    fus = ShapeDecoderFused(hsize=128)
    vref = ref.init(jax.random.PRNGKey(1), x)
    vfus = fus.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(vref) == jax.tree_util.tree_structure(vfus)
    for a, b in zip(jax.tree_util.tree_leaves(vref), jax.tree_util.tree_leaves(vfus)):
        assert a.shape == b.shape and a.dtype == b.dtype

    (o_r, mut_r) = ref.apply(vref, x, train=True, mutable=["batch_stats"])
    (o_f, mut_f) = fus.apply(vref, x, train=True, mutable=["batch_stats"])
    for a, b in zip(o_r, o_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(mut_r["batch_stats"]),
        jax.tree_util.tree_leaves(mut_f["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)

    def loss(m, params):
        (xyz, sc, sh), _ = m.apply(
            {"params": params, "batch_stats": vref["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(xyz**2) + jnp.sum(sc) + jnp.sum(sh)

    g_r = jax.grad(lambda p: loss(ref, p))(vref["params"])
    g_f = jax.grad(lambda p: loss(fus, p))(vref["params"])
    flat_r = jnp.concatenate([g.reshape(-1) for g in jax.tree_util.tree_leaves(g_r)])
    flat_f = jnp.concatenate([g.reshape(-1) for g in jax.tree_util.tree_leaves(g_f)])
    assert bool(jnp.all(jnp.isfinite(flat_f)))
    cos = float(jnp.vdot(flat_r, flat_f)
                / (jnp.linalg.norm(flat_r) * jnp.linalg.norm(flat_f) + 1e-12))
    assert cos > 0.9999, cos

    # eval mode: running stats fold into a pure affine - must also agree
    e_r = ref.apply(vref, x, train=False)
    e_f = fus.apply(vref, x, train=False)
    for a, b in zip(e_r, e_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_pop_decoder_fused_impl_checkpoint_interop():
    """POPDecoder(decoder_impl='fused') must produce the same variables
    pytree as the reference impl (the fused module is named ShapeDecoder_0),
    so checkpoints load across impls in both directions."""
    geo = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 8)).astype(np.float32))
    uv = jnp.asarray(np.random.default_rng(1).uniform(size=(50, 2)).astype(np.float32))
    vidx = jnp.arange(50, dtype=jnp.int32)
    kw = dict(c_geom=8, geom_layer_type="conv", hsize=32)
    m_ref = POPDecoder(**kw)
    m_fus = POPDecoder(**kw, decoder_impl="fused")
    v_ref = m_ref.init(jax.random.PRNGKey(2), geo, uv, vidx, 32)
    v_fus = m_fus.init(jax.random.PRNGKey(2), geo, uv, vidx, 32)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fus)
    # ref-trained variables drive the fused impl to float tolerance
    (a_r, _) = m_ref.apply(v_ref, geo, uv, vidx, 32, train=True, mutable=["batch_stats"])
    (a_f, _) = m_fus.apply(v_ref, geo, uv, vidx, 32, train=True, mutable=["batch_stats"])
    for x, y in zip(a_r, a_f):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=5e-3)
