"""Parity tests: tile-binned rasterizer (XLA blend + Pallas kernels in
interpret mode) vs the brute-force semantics reference, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.projection import project_gaussians
from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize
from gaussianavatar_tpu.ops.rasterize_ref import rasterize_brute


def make_scene(n=60, seed=0, h=64, w=64, opac_max=0.3):
    """Random gaussians with opacity <= 0.3 so the 1/255 alpha floor gates
    exactly where the 3-sigma tile rect crops: brute and tile paths then
    agree bit-for-bit (see rasterize_tile.py capacity notes)."""
    rng = np.random.default_rng(seed)
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0, 0, 2.0], np.float32), K, h, w
    )
    means = rng.normal(scale=0.35, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.02, 0.08, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.05, opac_max, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    bg = np.array([1.0, 1.0, 1.0], np.float32)
    return cam, map(jnp.asarray, (means, scales, q, opac, colors, bg))


CFG_XLA = RasterizeConfig(tile_size=16, tile_capacity=64, max_tiles_per_gaussian=16, backend="xla")
CFG_INT = CFG_XLA._replace(backend="pallas_interpret")


def _render(cam, arrays, cfg):
    means, scales, q, opac, colors, bg = arrays
    return rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)


def _render_brute(cam, arrays):
    means, scales, q, opac, colors, bg = arrays
    proj = project_gaussians(
        means, scales, q, cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, cam.height, cam.width,
    )
    return rasterize_brute(proj, colors, opac, bg, cam.height, cam.width)


def test_xla_tile_matches_brute():
    cam, arrays = make_scene()
    arrays = tuple(arrays)
    img_tile = _render(cam, arrays, CFG_XLA)
    img_brute = _render_brute(cam, arrays)
    np.testing.assert_allclose(np.asarray(img_tile), np.asarray(img_brute), atol=2e-5)


def test_pallas_interpret_matches_xla_tile():
    cam, arrays = make_scene(seed=1)
    arrays = tuple(arrays)
    img_xla = _render(cam, arrays, CFG_XLA)
    img_pal = _render(cam, arrays, CFG_INT)
    np.testing.assert_allclose(np.asarray(img_pal), np.asarray(img_xla), atol=2e-5)


def test_pallas_interpret_matches_brute_high_opacity():
    """op=1 (the reference's fixed opacity): tile rect crops sub-1/255 tails
    the brute path keeps, so allow a loose tolerance."""
    cam, arrays = make_scene(seed=2, opac_max=1.0)
    means, scales, q, opac, colors, bg = arrays = tuple(arrays)
    arrays = (means, scales, q, jnp.ones_like(opac), colors, bg)
    img_pal = _render(cam, arrays, CFG_INT)
    img_brute = _render_brute(cam, arrays)
    np.testing.assert_allclose(np.asarray(img_pal), np.asarray(img_brute), atol=2e-2)
    # and the two tile backends still agree exactly with each other
    img_xla = _render(cam, arrays, CFG_XLA)
    np.testing.assert_allclose(np.asarray(img_pal), np.asarray(img_xla), atol=2e-5)


def test_gradients_pallas_vs_xla_autodiff():
    """The hand-written Pallas VJP must match autodiff through the XLA blend."""
    cam, arrays = make_scene(n=30, seed=3, h=32, w=32)
    means, scales, q, opac, colors, bg = tuple(arrays)
    target = jnp.zeros((3, 32, 32))

    def loss(cfg):
        def f(means, scales, colors, opac, bg):
            img = rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)
            return ((img - target) ** 2).mean()
        return f

    args = (means, scales, colors, opac, bg)
    g_xla = jax.grad(loss(CFG_XLA), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss(CFG_INT), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "colors", "opac", "bg"]
    for name, gx, gp in zip(names, g_xla, g_pal):
        gx, gp = np.asarray(gx), np.asarray(gp)
        assert np.isfinite(gx).all() and np.isfinite(gp).all(), name
        scale = max(1e-6, np.abs(gx).max())
        np.testing.assert_allclose(gp, gx, atol=5e-4 * scale, rtol=5e-4, err_msg=name)


def test_gradients_match_finite_differences():
    cam, arrays = make_scene(n=8, seed=4, h=32, w=32)
    means, scales, q, opac, colors, bg = tuple(arrays)
    target = jnp.zeros((3, 32, 32))

    def loss(means):
        img = rasterize(means, colors, scales, q, opac, cam, bg, config=CFG_INT)
        return ((img - target) ** 2).mean()

    g = jax.grad(loss)(means)
    eps = 1e-3
    for (i, j) in [(0, 0), (3, 1), (7, 2)]:
        fd = (float(loss(means.at[i, j].add(eps))) - float(loss(means.at[i, j].add(-eps)))) / (2 * eps)
        an = float(g[i, j])
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd), abs(an)), (i, j, fd, an)


def _one_tile_scene(n=24, seed=5, hw=16):
    """All gaussians land in ONE 16x16 tile so per-tile depth order equals
    global depth order and K-truncation is exactly checkable against brute."""
    rng = np.random.default_rng(seed)
    K = np.array([[80.0, 0, hw / 2], [0, 80.0, hw / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0, 0, 2.0], np.float32), K, hw, hw
    )
    means = rng.normal(scale=0.04, size=(n, 3)).astype(np.float32)
    means[:, 2] = np.linspace(-0.3, 0.3, n)  # distinct depths
    scales = rng.uniform(0.01, 0.03, size=(n, 3)).astype(np.float32)
    q = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n, 1))
    opac = rng.uniform(0.05, 0.3, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    bg = np.array([1.0, 1.0, 1.0], np.float32)
    return cam, tuple(map(jnp.asarray, (means, scales, q, opac, colors, bg)))


def test_capacity_overflow_keeps_closest():
    """With K smaller than the tile load, the render must equal a brute render
    of exactly the K closest-in-depth gaussians, and the dropped pair count
    must be reported as overflow (nothing is silent)."""
    from gaussianavatar_tpu.ops.rasterize import rasterize_views

    cam, arrays = _one_tile_scene(n=24)
    means, scales, q, opac, colors, bg = arrays
    Kcap = 8
    cfg_small = CFG_XLA._replace(tile_capacity=Kcap)

    img, overflow = rasterize_views(
        means[None], colors[None], scales[None], q, opac, cam.world_view_transform[None],
        cam.full_proj_transform[None], cam.tan_fovx[None], cam.tan_fovy[None],
        cam.height, cam.width, bg, config=cfg_small, return_overflow=True,
    )
    assert int(overflow) == 24 - Kcap

    proj = project_gaussians(
        means, scales, q, cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, cam.height, cam.width,
    )
    order = np.argsort(np.asarray(proj.depths))
    keep = jnp.asarray(np.sort(order[:Kcap]))
    proj_k = type(proj)(*(x[keep] for x in proj))
    ref = rasterize_brute(proj_k, colors[keep], opac[keep], bg, cam.height, cam.width)
    np.testing.assert_allclose(np.asarray(img[0]), np.asarray(ref), atol=2e-5)


def test_two_tier_capacity_exact_and_no_overflow():
    """tile_capacity_hi: the busy tile blends depth ranks [K, K+K_hi) in a
    second composed pass — the result must equal the full uncapped brute
    render and overflow must drop to zero."""
    from gaussianavatar_tpu.ops.rasterize import rasterize_views

    cam, arrays = _one_tile_scene(n=24)
    means, scales, q, opac, colors, bg = arrays
    for backend in ("xla", "pallas_interpret"):
        cfg = CFG_XLA._replace(
            tile_capacity=8, tile_capacity_hi=16, heavy_fraction=1.0, backend=backend
        )
        img, overflow = rasterize_views(
            means[None], colors[None], scales[None], q, opac,
            cam.world_view_transform[None], cam.full_proj_transform[None],
            cam.tan_fovx[None], cam.tan_fovy[None],
            cam.height, cam.width, bg, config=cfg, return_overflow=True,
        )
        assert int(overflow) == 0, backend
        ref = _render_brute(cam, arrays)
        np.testing.assert_allclose(np.asarray(img[0]), np.asarray(ref), atol=2e-5, err_msg=backend)


def test_three_tier_cascade_exact():
    """An explicit (cap, fraction) cascade must also reproduce the uncapped
    brute render with overflow 0 (tiers nest: 8 + 8@f1 + 8@f1 covers 24)."""
    from gaussianavatar_tpu.ops.rasterize import rasterize_views

    cam, arrays = _one_tile_scene(n=24)
    means, scales, q, opac, colors, bg = arrays
    cfg = CFG_XLA._replace(tile_capacity=8, tiers=((8, 1.0), (8, 1.0), (8, 1.0)))
    img, overflow = rasterize_views(
        means[None], colors[None], scales[None], q, opac,
        cam.world_view_transform[None], cam.full_proj_transform[None],
        cam.tan_fovx[None], cam.tan_fovy[None],
        cam.height, cam.width, bg, config=cfg, return_overflow=True,
    )
    assert int(overflow) == 0
    ref = _render_brute(cam, arrays)
    np.testing.assert_allclose(np.asarray(img[0]), np.asarray(ref), atol=2e-5)


def test_two_tier_gradients_match_single_tier():
    """Gradients through the composed two-segment blend must match the
    single-pass full-capacity blend (both cover every gaussian)."""
    cam, arrays = _one_tile_scene(n=24)
    means, scales, q, opac, colors, bg = arrays
    target = jnp.zeros((3, cam.height, cam.width))

    def loss(cfg):
        def f(means, colors, opac):
            img = rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)
            return ((img - target) ** 2).mean()
        return f

    cfg_full = CFG_XLA._replace(tile_capacity=24)
    cfg_two = CFG_XLA._replace(tile_capacity=8, tile_capacity_hi=16, heavy_fraction=1.0)
    g_full = jax.grad(loss(cfg_full), argnums=(0, 1, 2))(means, colors, opac)
    g_two = jax.grad(loss(cfg_two), argnums=(0, 1, 2))(means, colors, opac)
    for name, gf, gt in zip(["means", "colors", "opac"], g_full, g_two):
        gf, gt = np.asarray(gf), np.asarray(gt)
        scale = max(1e-6, np.abs(gf).max())
        np.testing.assert_allclose(gt, gf, atol=1e-4 * scale, rtol=1e-4, err_msg=name)


def test_nonmultiple_image_size():
    """Image sizes that aren't tile multiples must render via padding+crop."""
    h, w = 50, 70
    rng = np.random.default_rng(6)
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(np.eye(3, dtype=np.float32), np.array([0, 0, 2.0], np.float32), K, h, w)
    n = 20
    means = jnp.asarray(rng.normal(scale=0.3, size=(n, 3)).astype(np.float32))
    scales = jnp.full((n, 3), 0.05)
    q = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    opac = jnp.full((n,), 0.25)
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    img = rasterize(means, colors, scales, q, opac, cam, bg, config=CFG_XLA)
    assert img.shape == (3, h, w)
    proj = project_gaussians(
        means, scales, q, cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, h, w,
    )
    ref = rasterize_brute(proj, colors, opac, bg, h, w)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)


def test_unstable_sort_matches_stable_and_brute():
    """sort_stable=False must produce the same image whenever (tile, depth)
    keys are unique — random scenes have distinct depths, so the unstable
    render path (the render-CLI default, config.RasterParams
    .render_sort_stable) stays brute-exact."""
    cam, arrays = make_scene(seed=7)
    arrays = tuple(arrays)
    img_stable = _render(cam, arrays, CFG_XLA)
    img_unstable = _render(cam, arrays, CFG_XLA._replace(sort_stable=False))
    np.testing.assert_allclose(np.asarray(img_unstable), np.asarray(img_stable), atol=0)
    np.testing.assert_allclose(
        np.asarray(img_unstable), np.asarray(_render_brute(cam, arrays)), atol=2e-5
    )


def test_flat_gather_bit_exact_fwd_and_grad():
    """gather_flat=True reads the same packed rows as the lane-padded row
    gather (only the HBM access pattern differs) — image AND gradients must
    be bit-identical, including through the capacity cascade."""
    cam, arrays = make_scene(seed=3)
    means, scales, q, opac, colors, bg = tuple(arrays)
    cfg = CFG_XLA._replace(tile_capacity=32, tile_capacity_hi=32)

    def f(op, flat):
        img = rasterize(means, colors, scales, q, op, cam, bg,
                        config=cfg._replace(gather_flat=flat))
        w = jnp.cos(jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape))
        return jnp.sum(img * w), img

    (_, img0), g0 = jax.value_and_grad(f, has_aux=True)(opac, False)
    (_, img1), g1 = jax.value_and_grad(f, has_aux=True)(opac, True)
    assert float(jnp.abs(g0).sum()) > 0
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_window_gather_matches_row_gather_fwd_and_grad():
    """gather_window=True routes tile slabs through the sorted-order
    permuted table (one row gather of L rows, then contiguous compact
    windows) — same rows, same zero-masking, so the image must be
    bit-identical through the cascade. Gradients flow through an extra
    permutation scatter-add, which may regroup f32 additions for gaussians
    binned into several tiles — allow ulp-level tolerance there."""
    cam, arrays = make_scene(seed=3)
    means, scales, q, opac, colors, bg = tuple(arrays)
    cfg = CFG_XLA._replace(tile_capacity=32, tile_capacity_hi=32)

    def f(op, window):
        img = rasterize(means, colors, scales, q, op, cam, bg,
                        config=cfg._replace(gather_window=window))
        w = jnp.cos(jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape))
        return jnp.sum(img * w), img

    (_, img0), g0 = jax.value_and_grad(f, has_aux=True)(opac, False)
    (_, img1), g1 = jax.value_and_grad(f, has_aux=True)(opac, True)
    assert float(jnp.abs(g0).sum()) > 0
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-6, atol=1e-7)


def test_window_gather_deep_tier_offsets():
    """The window path must stay exact when later tiers read rank windows
    [k0, k0+K) with k0 > 0 and when windows overhang the valid key region
    (zero-row padding, not CLIP shifting): render a scene whose busiest
    tiles exceed the base capacity and compare against the row gather."""
    cam, arrays = make_scene(n=300, seed=11)
    means, scales, q, opac, colors, bg = tuple(arrays)
    cfg = CFG_XLA._replace(tiers=((8, 1.0), (64, 0.25), (128, 0.0625)))
    img0 = rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)
    img1 = rasterize(means, colors, scales, q, opac, cam, bg,
                     config=cfg._replace(gather_window=True))
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))


def test_footprint_drop_matches_binning():
    """footprint_drop (the adaptive-footprint decision probe) must agree
    with the binning's own accounting: total = binned pairs under an
    uncapping footprint, dropped@M = _bin_gaussians' m_dropped at that M,
    and the two decompose (total - binned@M == dropped@M)."""
    from gaussianavatar_tpu.ops.rasterize_tile import (
        _bin_gaussians, footprint_drop,
    )

    cam, arrays = make_scene(n=120, seed=3)
    means, scales, q, opac, colors, bg = tuple(arrays)
    proj = project_gaussians(
        means, scales, q, cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, cam.height, cam.width,
    )
    projs = jax.tree.map(lambda x: x[None], proj)
    colors_b, opac_b = colors[None], opac[None]
    h, w, ts = cam.height, cam.width, 16

    ctx_big = _bin_gaussians(projs, colors_b, opac_b, h, w, ts, 8, 8)
    assert int(ctx_big.m_dropped) == 0  # 8x8 footprint caps nothing here
    ctx4 = _bin_gaussians(projs, colors_b, opac_b, h, w, ts, 2, 2)

    drop4, total = footprint_drop(projs, opac_b, h, w, ts, 4)
    assert int(total) == int(ctx_big.full_counts.sum())
    assert int(drop4) == int(ctx4.m_dropped)
    assert int(total) - int(ctx4.full_counts.sum()) == int(drop4)
    assert int(drop4) > 0  # the scene DOES have >2x2-tile gaussians

    drop_big, total_big = footprint_drop(projs, opac_b, h, w, ts, 64)
    assert int(drop_big) == 0 and int(total_big) == int(total)
