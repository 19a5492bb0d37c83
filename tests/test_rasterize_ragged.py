"""Ragged slot-stream rasterizer (ops/rasterize_ragged) vs the cascade path:
forward bit-parity, custom-VJP gradients, budget waterfill, chunk maps.

The ragged kernel's inner arithmetic is the same 8-unrolled early-terminating
loop as the cascade kernel, so with matching per-tile capacities the images
must agree to float-op reassociation level (here: bit-exact, same op order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize_views
from gaussianavatar_tpu.ops.rasterize_ragged import (
    _budget_theta,
    _chunk_maps,
    _cdiv_arr,
)

from tests.test_rasterize_tile import make_scene


def _batched_arrays(arrays, B=2):
    """Replicate a single-view scene into a B-view batch with jittered colors
    so the per-view images differ."""
    means, scales, q, opac, colors, bg = arrays
    N = means.shape[0]
    means_b = jnp.stack([means + 0.02 * i for i in range(B)])
    scales_b = jnp.broadcast_to(scales[None], (B, N, 3))
    colors_b = jnp.stack([jnp.clip(colors + 0.1 * i, 0, 1) for i in range(B)])
    return means_b, scales_b, q, opac, colors_b, bg


def _render_views(cam, arrays, cfg, B=2):
    means_b, scales_b, q, opac, colors_b, bg = _batched_arrays(arrays, B)
    wvt = jnp.broadcast_to(cam.world_view_transform[None], (B, 4, 4))
    fpt = jnp.broadcast_to(cam.full_proj_transform[None], (B, 4, 4))
    tx = jnp.full((B,), cam.tan_fovx)
    ty = jnp.full((B,), cam.tan_fovy)
    return rasterize_views(
        means_b, colors_b, scales_b, q, opac, wvt, fpt, tx, ty,
        cam.height, cam.width, bg, config=cfg, return_overflow=True,
    )


BASE = RasterizeConfig(tile_size=16, tile_capacity=4096,
                       max_tiles_per_gaussian=16, backend="pallas_interpret")
RAGGED = BASE._replace(ragged=True, ragged_chunk=16)


def test_ragged_matches_deep_cascade_bit_exact():
    """caps = true counts, no budget pressure -> every pair blends; must be
    bit-exact vs a deep single-tier cascade (same inner op order)."""
    cam, arrays = make_scene(n=80, seed=7)
    arrays = tuple(arrays)
    img_c, ov_c = _render_views(cam, arrays, BASE)
    img_r, ov_r = _render_views(cam, arrays, RAGGED)
    np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_c))
    assert int(ov_r) == int(ov_c)  # footprint-only overflow on both paths


def test_ragged_chunk_size_invariance():
    """CB only cuts the stream differently; the image must not change."""
    cam, arrays = make_scene(n=60, seed=8)
    arrays = tuple(arrays)
    img16, _ = _render_views(cam, arrays, RAGGED._replace(ragged_chunk=16))
    img64, _ = _render_views(cam, arrays, RAGGED._replace(ragged_chunk=64))
    np.testing.assert_array_equal(np.asarray(img16), np.asarray(img64))


def test_ragged_budget_clip_matches_uniform_capacity():
    """A budget that waterfills to ceiling theta is semantically a
    single-tier cascade at capacity theta: per-tile caps = min(count, theta)
    on both paths. Verify image + overflow equality at the theta the
    waterfill actually picked."""
    cam, arrays = make_scene(n=120, seed=9, opac_max=0.15)
    arrays = tuple(arrays)
    # budget of 12 avg rows/tile at CB=8 forces clipping on the busy tiles
    cfg_r = RAGGED._replace(ragged_chunk=8, ragged_budget=12)
    img_r, ov_r = _render_views(cam, arrays, cfg_r)

    # reproduce the waterfill on host to find theta, then render the cascade
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_tile import _bin_gaussians, _cdiv

    means_b, scales_b, q, opac, colors_b, bg = _batched_arrays(arrays)
    B, N = means_b.shape[:2]
    projs = jax.vmap(
        lambda m, s: project_gaussians(
            m, s, q, cam.world_view_transform, cam.full_proj_transform,
            cam.tan_fovx, cam.tan_fovy, cam.height, cam.width)
    )(means_b, scales_b)
    ctx = _bin_gaussians(
        projs, colors_b, jnp.broadcast_to(opac[None], (B, N)),
        cam.height, cam.width, 16, 4, 4)
    counts = np.asarray(ctx.full_counts)
    G = counts.size
    CB = 8
    C = -(-(G * 12) // CB)
    C = -(-C // 256) * 256 if C >= 256 else -(-C // 8) * 8
    theta = int(_budget_theta(jnp.asarray(counts), CB, C))
    assert theta < counts.max(), "budget must actually clip for this test"
    assert np.sum(-(-np.minimum(counts, theta) // CB)) <= C

    # cascade needs multiple-of-8 capacity; theta is free-form. Compare
    # against ragged with explicit uniform caps instead when unaligned.
    if theta % 8 == 0:
        cfg_c = BASE._replace(tile_capacity=theta)
        img_c, ov_c = _render_views(cam, arrays, cfg_c)
        np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_c))
        assert int(ov_r) == int(ov_c)
    else:
        # uniform-caps ragged twin at big budget == waterfilled run
        from gaussianavatar_tpu.ops.rasterize_ragged import rasterize_views_ragged
        img_u, ov_u = rasterize_views_ragged(
            projs, colors_b, jnp.broadcast_to(opac[None], (B, N)), jnp.asarray(arrays[5]),
            cam.height, cam.width, RAGGED._replace(ragged_chunk=8),
            caps=jnp.full((G,), theta, jnp.int32))
        np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_u))
        assert int(ov_r) == int(ov_u)


def test_ragged_explicit_caps_match_cascade_capacity():
    """caps = uniform K == single-tier cascade at K (the per-tile
    'closest-K-in-depth-order win' contract), incl. gradients."""
    cam, arrays = make_scene(n=100, seed=10, opac_max=0.15)
    means, scales, q, opac, colors, bg = tuple(arrays)
    K = 16

    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_ragged import rasterize_views_ragged
    from gaussianavatar_tpu.ops.rasterize_tile import rasterize_views_binned

    target = jnp.zeros((1, 3, cam.height, cam.width))

    def render(mode, means, colors, opac):
        projs = jax.vmap(
            lambda m: project_gaussians(
                m, scales, q, cam.world_view_transform, cam.full_proj_transform,
                cam.tan_fovx, cam.tan_fovy, cam.height, cam.width)
        )(means[None])
        if mode == "cascade":
            img, ov = rasterize_views_binned(
                projs, colors[None], opac[None], bg,
                cam.height, cam.width, BASE._replace(tile_capacity=K))
        else:
            G = ((cam.height + 15) // 16) * ((cam.width + 15) // 16)
            img, ov = rasterize_views_ragged(
                projs, colors[None], opac[None], bg,
                cam.height, cam.width, RAGGED._replace(ragged_chunk=8),
                caps=jnp.full((G,), K, jnp.int32))
        return img, ov

    img_c, ov_c = render("cascade", means, colors, opac)
    img_r, ov_r = render("ragged", means, colors, opac)
    np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_c))
    assert int(ov_r) == int(ov_c) and int(ov_r) > 0  # K=16 truncates here

    def loss(mode):
        def f(means, colors, opac):
            img, _ = render(mode, means, colors, opac)
            return ((img - target) ** 2).mean()
        return f

    g_c = jax.grad(loss("cascade"), argnums=(0, 1, 2))(means, colors, opac)
    g_r = jax.grad(loss("ragged"), argnums=(0, 1, 2))(means, colors, opac)
    for name, gc, gr in zip(["means", "colors", "opac"], g_c, g_r):
        gc, gr = np.asarray(gc), np.asarray(gr)
        assert np.isfinite(gr).all(), name
        scale = max(1e-6, np.abs(gc).max())
        np.testing.assert_allclose(gr, gc, atol=1e-5 * scale, rtol=1e-5,
                                   err_msg=name)


def test_ragged_gradients_vs_xla_autodiff():
    """Full-coverage ragged VJP vs autodiff through the XLA blend."""
    cam, arrays = make_scene(n=30, seed=11, h=32, w=32)
    means, scales, q, opac, colors, bg = tuple(arrays)
    target = jnp.zeros((3, 32, 32))
    cfg_xla = RasterizeConfig(tile_size=16, tile_capacity=64,
                              max_tiles_per_gaussian=16, backend="xla")

    from gaussianavatar_tpu.ops.rasterize import rasterize

    def loss(cfg):
        def f(means, scales, colors, opac, bg):
            img = rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)
            return ((img - target) ** 2).mean()
        return f

    cfg_r = cfg_xla._replace(backend="pallas_interpret", ragged=True,
                             ragged_chunk=16)
    args = (means, scales, colors, opac, bg)
    g_xla = jax.grad(loss(cfg_xla), argnums=(0, 1, 2, 3, 4))(*args)
    g_rag = jax.grad(loss(cfg_r), argnums=(0, 1, 2, 3, 4))(*args)
    for name, gx, gr in zip(["means", "scales", "colors", "opac", "bg"],
                            g_xla, g_rag):
        gx, gr = np.asarray(gx), np.asarray(gr)
        assert np.isfinite(gr).all(), name
        scale = max(1e-6, np.abs(gx).max())
        np.testing.assert_allclose(gr, gx, atol=5e-4 * scale, rtol=5e-4,
                                   err_msg=name)


def test_budget_theta_and_chunk_maps():
    """Unit tests of the waterfill + chunk bookkeeping against numpy."""
    rng = np.random.default_rng(0)
    caps = rng.integers(0, 300, size=64).astype(np.int32)
    CB = 16
    for C in (8, 32, 64, 200, 4096):
        theta = int(_budget_theta(jnp.asarray(caps), CB, C))
        chunks = np.sum(-(-np.minimum(caps, theta) // CB))
        assert chunks <= C
        if theta < caps.max():  # one more must NOT fit
            over = np.sum(-(-np.minimum(caps, theta + 1) // CB))
            assert over > C
    # chunk maps: every valid chunk points at its tile with the right k0,
    # each tile's chunk count is ceil(cap/CB), last flags are correct
    caps_eff = np.minimum(caps, 100)
    C = int(np.sum(-(-caps_eff // CB))) + 7
    ct, k0, last = (np.asarray(x) for x in
                    _chunk_maps(jnp.asarray(caps_eff), CB, C))
    i = 0
    for t, cap in enumerate(caps_eff):
        n = -(-cap // CB)
        for j in range(n):
            assert ct[i] == t and k0[i] == j * CB
            assert bool(last[i]) == (j == n - 1)
            i += 1
    assert (k0[i:] == -1).all() and (last[i:] == 0).all()


def test_cdiv_arr():
    x = jnp.asarray([0, 1, 8, 9, 16], jnp.int32)
    np.testing.assert_array_equal(np.asarray(_cdiv_arr(x, 8)), [0, 1, 1, 2, 2])


def test_ragged_ts32_matches_cascade():
    """tile_size=32 (pxr=8) — the TPU production tile shape."""
    cam, arrays = make_scene(n=80, seed=12)
    arrays = tuple(arrays)
    base32 = BASE._replace(tile_size=32)
    img_c, ov_c = _render_views(cam, arrays, base32)
    img_r, ov_r = _render_views(cam, arrays, base32._replace(
        ragged=True, ragged_chunk=32))
    np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_c))
    assert int(ov_r) == int(ov_c)


def test_ragged_nonmultiple_image_size():
    """Non-tile-multiple image sizes render via padding+crop on the ragged
    path too, matching the brute-force semantics reference."""
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize import rasterize
    from gaussianavatar_tpu.ops.rasterize_ref import rasterize_brute

    h, w = 50, 70
    rng = np.random.default_rng(6)
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(np.eye(3, dtype=np.float32),
                                 np.array([0, 0, 2.0], np.float32), K, h, w)
    n = 20
    means = jnp.asarray(rng.normal(scale=0.3, size=(n, 3)).astype(np.float32))
    scales = jnp.full((n, 3), 0.05)
    q = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    opac = jnp.full((n,), 0.25)
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(tile_size=16, tile_capacity=64,
                          max_tiles_per_gaussian=16,
                          backend="pallas_interpret", ragged=True,
                          ragged_chunk=16)
    img = rasterize(means, colors, scales, q, opac, cam, bg, config=cfg)
    assert img.shape == (3, h, w)
    proj = project_gaussians(
        means, scales, q, cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, h, w,
    )
    ref = rasterize_brute(proj, colors, opac, bg, h, w)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5)


def test_ragged_fuzz_vs_xla_twin():
    """Random scenes x random (CB, budget, caps) vs the XLA-blend cascade at
    matching per-tile coverage: the waterfilled ragged render must equal a
    per-tile-capped XLA reference built from the same binning."""
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_ragged import (
        rasterize_views_ragged, _budget_theta,
    )
    from gaussianavatar_tpu.ops.rasterize_tile import (
        _bin_gaussians, _gather_tile_params, _blend_xla, _untile,
    )

    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        cam, arrays = make_scene(n=int(rng.integers(5, 60)), seed=200 + seed,
                                 h=48, w=48)
        means, scales, q, opac, colors, bg = tuple(arrays)
        B = 1
        projs = jax.vmap(
            lambda m: project_gaussians(
                m, scales, q, cam.world_view_transform,
                cam.full_proj_transform, cam.tan_fovx, cam.tan_fovy, 48, 48)
        )(means[None])
        ctx = _bin_gaussians(projs, colors[None], opac[None], 48, 48, 16, 4, 4)
        counts = np.asarray(ctx.full_counts)
        G = counts.size
        CB = int(rng.choice([8, 16, 32]))
        budget = int(rng.integers(4, 40))
        cfg = RasterizeConfig(tile_size=16, tile_capacity=64,
                              max_tiles_per_gaussian=16,
                              backend="pallas_interpret", ragged=True,
                              ragged_chunk=CB, ragged_budget=budget)
        img_r, ov_r = rasterize_views_ragged(
            projs, colors[None], opac[None], bg, 48, 48, cfg)

        # reproduce caps on host, then build the XLA reference with per-tile
        # rows zeroed past each tile's cap
        C = -(-(G * budget) // CB)
        C = -(-C // 256) * 256 if C >= 256 else -(-C // 8) * 8
        theta = int(_budget_theta(jnp.asarray(counts), CB, C))
        caps = np.minimum(counts, theta)
        Kmax = max(8, int(-(-caps.max() // 8) * 8)) if caps.max() else 8
        params, cnts = _gather_tile_params(
            ctx, jnp.arange(G, dtype=jnp.int32), 0, Kmax)
        mask = (np.arange(Kmax)[None, :] < caps[:, None])
        params = params * jnp.asarray(mask[..., None], params.dtype)
        premult, finalT, _, _ = _blend_xla(params, jnp.arange(G) % G, 3, 16)
        pxr = 16 * 16 // 128
        col = premult.transpose(0, 2, 1).reshape(1, G, 3, pxr, 128)
        fT = finalT.reshape(1, G, 1, pxr, 128)
        untile = lambda x: _untile(x, 3, 3, 16, 48, 48)
        img_ref = jax.vmap(untile)(col) + jax.vmap(untile)(fT)[:, 0][:, None] \
            * jnp.asarray(bg)[None, :, None, None]
        np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_ref),
                                   atol=2e-5, err_msg=f"seed {seed}")
        ov_exp = int((counts - caps).sum()) + int(ctx.m_dropped)
        assert int(ov_r) == ov_exp, (seed, int(ov_r), ov_exp)


def test_footprint_shrink_bit_exact_when_clip_free():
    """The adaptive train footprint's safety argument: when footprint_drop
    reports ZERO clipped pairs at the candidate M, shrinking the footprint
    leaves the binned pair set — hence the ragged image, gradients, and
    overflow — bit-identical. (loop.py shrinks M 9->4 at retunes exactly
    when this holds; BASELINE.md round-4 measured -11% raster step.)"""
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_tile import footprint_drop

    cam, arrays = make_scene(n=100, seed=5)
    means, scales, q, opac, colors, bg = tuple(arrays)
    scales = scales * 0.4  # small gaussians: nothing spans >2x2 tiles
    arrays = (means, scales, q, opac, colors, bg)

    proj = project_gaussians(
        means, scales, q, cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, cam.height, cam.width,
    )
    projs = jax.tree.map(lambda x: x[None], proj)
    drop, total = footprint_drop(projs, opac[None], cam.height, cam.width,
                                 16, 4)
    assert int(drop) == 0 and int(total) > 0

    wide = RAGGED._replace(max_tiles_per_gaussian=16)
    narrow = RAGGED._replace(max_tiles_per_gaussian=4)

    def run(cfg):
        # differentiate wrt opacity for a gradient through the blend
        def g(op):
            a = (means, scales, q, op, colors, bg)
            img, ov = _render_views(cam, a, cfg)
            w = jnp.cos(jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape))
            return jnp.sum(img * w), (img, ov)

        (_, (img, ov)), grad = jax.value_and_grad(g, has_aux=True)(opac)
        return img, ov, grad

    img_w, ov_w, g_w = run(wide)
    img_n, ov_n, g_n = run(narrow)
    np.testing.assert_array_equal(np.asarray(img_n), np.asarray(img_w))
    np.testing.assert_array_equal(np.asarray(g_n), np.asarray(g_w))
    assert int(ov_n) == int(ov_w)
