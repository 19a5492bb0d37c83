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


def test_capacity_overflow_keeps_closest():
    """With K smaller than the per-tile load the nearest-in-depth gaussians
    must win and the render must still be finite/valid."""
    cam, arrays = make_scene(n=100, seed=5)
    cfg_small = CFG_XLA._replace(tile_capacity=8)
    img = _render(cam, tuple(arrays), cfg_small)
    assert np.isfinite(np.asarray(img)).all()


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
