"""Row-vectorized blend kernels (ops/blend_vec via RasterParams.blend_vec=1)
vs the sequential CUDA-parity kernels: forward images, custom-VJP gradients,
termination behavior, capacity clipping, tier composition, and the K % 128
tail path. The vec kernels tree-reassociate products/sums, so agreement is
float-tolerance (atol ~1e-5 on [0,1] images), not bit-exact — the sequential
kernels remain the bit-exactness lock against ops/rasterize_ref."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize

from tests.test_rasterize_tile import make_scene
from tests.test_rasterize_ragged import _render_views

BASE = RasterizeConfig(tile_size=16, tile_capacity=64,
                       max_tiles_per_gaussian=16, backend="pallas_interpret")
RAGGED = BASE._replace(ragged=True, ragged_chunk=16)


def _assert_close(a, b, name="", atol=2e-5):
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all(), name
    np.testing.assert_allclose(b, a, atol=atol, rtol=1e-4, err_msg=name)


def test_vec_cascade_matches_seq_fwd():
    cam, arrays = make_scene(n=80, seed=1)
    arrays = tuple(arrays)
    img_s, ov_s = _render_views(cam, arrays, BASE)
    img_v, ov_v = _render_views(cam, arrays, BASE._replace(blend_vec=1))
    _assert_close(img_s, img_v)
    assert int(ov_s) == int(ov_v)


def test_vec_cascade_termination_heavy():
    """Near-opaque gaussians: the 1e-4 early termination fires on most
    pixels — exercises the Tincl>=eps masking identity and the clamp."""
    cam, arrays = make_scene(n=120, seed=2, opac_max=0.999)
    arrays = tuple(arrays)
    img_s, _ = _render_views(cam, arrays, BASE)
    img_v, _ = _render_views(cam, arrays, BASE._replace(blend_vec=1))
    _assert_close(img_s, img_v)


def test_vec_cascade_two_tier_and_tail():
    """Two-tier cascade with a base capacity that is NOT a multiple of the
    128-row vec sub-chunk (K=24 -> single 24-row chunk; K_hi=40) plus the
    done-gate composition between tiers."""
    cam, arrays = make_scene(n=150, seed=3, opac_max=0.6)
    arrays = tuple(arrays)
    cfg = BASE._replace(tile_capacity=24, tile_capacity_hi=40,
                        heavy_fraction=0.5)
    img_s, ov_s = _render_views(cam, arrays, cfg)
    img_v, ov_v = _render_views(cam, arrays, cfg._replace(blend_vec=1))
    _assert_close(img_s, img_v)
    assert int(ov_s) == int(ov_v)


def test_vec_cascade_tail_above_128():
    """K=136 = one full 128-row sub-chunk + an 8-row static tail."""
    cam, arrays = make_scene(n=400, seed=4, h=32, w=32, opac_max=0.08)
    arrays = tuple(arrays)
    cfg = BASE._replace(tile_capacity=136)
    img_s, ov_s = _render_views(cam, arrays, cfg)
    img_v, ov_v = _render_views(cam, arrays, cfg._replace(blend_vec=1))
    _assert_close(img_s, img_v)
    assert int(ov_s) == int(ov_v)


def test_vec_ragged_matches_seq_fwd_and_budget():
    cam, arrays = make_scene(n=120, seed=5, opac_max=0.15)
    arrays = tuple(arrays)
    for cfg in (RAGGED, RAGGED._replace(ragged_chunk=8, ragged_budget=12)):
        img_s, ov_s = _render_views(cam, arrays, cfg)
        img_v, ov_v = _render_views(cam, arrays, cfg._replace(blend_vec=1))
        _assert_close(img_s, img_v, name=str(cfg.ragged_budget))
        assert int(ov_s) == int(ov_v)


def test_vec_gradients_match_seq():
    """Gradients through means/scales/colors/opac/bg on both paths."""
    cam, arrays = make_scene(n=40, seed=6, h=32, w=32, opac_max=0.6)
    means, scales, q, opac, colors, bg = tuple(arrays)
    target = jnp.zeros((3, 32, 32))

    def loss(cfg):
        def f(means, scales, colors, opac, bg):
            img = rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)
            return ((img - target) ** 2).mean()
        return f

    for base in (BASE._replace(tile_capacity=24, tile_capacity_hi=16,
                               heavy_fraction=0.5),
                 RAGGED):
        args = (means, scales, colors, opac, bg)
        g_s = jax.grad(loss(base), argnums=(0, 1, 2, 3, 4))(*args)
        g_v = jax.grad(loss(base._replace(blend_vec=1)),
                       argnums=(0, 1, 2, 3, 4))(*args)
        for name, gs, gv in zip(["means", "scales", "colors", "opac", "bg"],
                                g_s, g_v):
            gs, gv = np.asarray(gs), np.asarray(gv)
            assert np.isfinite(gv).all(), name
            scale = max(1e-6, np.abs(gs).max())
            np.testing.assert_allclose(gv, gs, atol=2e-4 * scale, rtol=2e-4,
                                       err_msg=f"{name} ragged={base.ragged}")


def test_vec_gradients_termination_heavy():
    """Opaque scene: ncon gating and the suffix-product reconstruction must
    agree with the sequential reverse walk where termination fired."""
    cam, arrays = make_scene(n=60, seed=7, h=32, w=32, opac_max=0.999)
    means, scales, q, opac, colors, bg = tuple(arrays)
    target = jnp.full((3, 32, 32), 0.3)

    def loss(cfg):
        def f(means, colors, opac):
            img = rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)
            return ((img - target) ** 2).mean()
        return f

    args = (means, colors, opac)
    g_s = jax.grad(loss(RAGGED), argnums=(0, 1, 2))(*args)
    g_v = jax.grad(loss(RAGGED._replace(blend_vec=1)), argnums=(0, 1, 2))(*args)
    for name, gs, gv in zip(["means", "colors", "opac"], g_s, g_v):
        gs, gv = np.asarray(gs), np.asarray(gv)
        assert np.isfinite(gv).all(), name
        scale = max(1e-6, np.abs(gs).max())
        np.testing.assert_allclose(gv, gs, atol=3e-4 * scale, rtol=3e-4,
                                   err_msg=name)


def test_vec_probe_matches_seq_needed_depths():
    """probe_tile_depths' needed-depth output (max n_contrib per tile) drives
    the auto-cascade/need-table machinery — the vec fwd must reproduce it."""
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_tile import probe_tile_depths

    cam, arrays = make_scene(n=100, seed=8, opac_max=0.9)
    means, scales, q, opac, colors, bg = tuple(arrays)
    projs = jax.vmap(
        lambda m: project_gaussians(
            m, scales, q, cam.world_view_transform, cam.full_proj_transform,
            cam.tan_fovx, cam.tan_fovy, cam.height, cam.width)
    )(means[None])
    cnt_s, need_s = probe_tile_depths(
        projs, colors[None], opac[None], cam.height, cam.width, BASE,
        probe_capacity=64)
    cnt_v, need_v = probe_tile_depths(
        projs, colors[None], opac[None], cam.height, cam.width,
        BASE._replace(blend_vec=1), probe_capacity=64)
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_v))
    # needed depth = a comparison-thresholded count; reassociated float
    # products can flip a borderline rank by 1
    np.testing.assert_allclose(np.asarray(need_v), np.asarray(need_s), atol=1)


def test_vec_rejects_bf16_accumulate():
    """blend_vec kernels are f32-only; a bf16 blend_acc_dtype must fail loudly
    instead of being silently ignored (ADVICE round 4)."""
    import pytest

    from gaussianavatar_tpu.ops.rasterize_tile import _make_pallas_blend

    with pytest.raises(ValueError, match="float32"):
        _make_pallas_blend(4, 16, 64, True, "bfloat16", True)
