"""Auto-tuned capacity cascade (ops/cascade.tune_tiers + the CLI wiring):
the tier table derived from a per-tile load histogram must be valid for
rasterize_views_binned (nested, non-increasing fractions, multiples of 8),
reach its coverage target, and flow through eval.py end to end."""

import math
import os
import sys
from os.path import join

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianavatar_tpu.ops.cascade import cascade_cost, tune_tiers  # noqa: E402


def check_valid(tiers):
    assert tiers[0][1] == 1.0
    for cap, frac in tiers:
        assert cap % 8 == 0 and cap >= 8
        assert 0.0 < frac <= 1.0
    fracs = [f for _, f in tiers]
    assert fracs == sorted(fracs, reverse=True)


def coverage_of(tiers, counts):
    counts = np.sort(np.asarray(counts))[::-1].astype(np.int64)
    G = counts.size
    blended = np.zeros_like(counts)
    for cap, frac in tiers:
        S = max(int(round(frac * G)), 1)
        # busiest-S tiles get cap more ranks (tiers nest, counts sorted desc)
        extra = np.minimum(counts[:S] - blended[:S], cap)
        blended[:S] += np.maximum(extra, 0)
    return blended.sum() / max(counts.sum(), 1)


def test_uniform_light_scene_single_tier():
    counts = np.full(256, 40)
    tiers = tune_tiers(counts)
    check_valid(tiers)
    assert len(tiers) == 1
    assert tiers[0][0] == 40  # 40 rounds up to 40 (already a multiple of 8)
    assert coverage_of(tiers, counts) == 1.0


def test_heavy_tail_gets_second_tier():
    rng = np.random.default_rng(0)
    counts = rng.integers(10, 80, 1024)
    counts[:64] = rng.integers(500, 900, 64)  # 6% heavy tiles
    tiers = tune_tiers(counts)
    check_valid(tiers)
    assert len(tiers) >= 2
    assert coverage_of(tiers, counts) >= 0.999
    # the tuned cascade must be cheaper than paying the worst tile everywhere
    assert cascade_cost(tiers) < counts.max()


def test_empty_and_zero_histograms():
    assert tune_tiers(np.zeros(16, np.int32)) == ((8, 1.0),)
    assert tune_tiers(np.zeros(0, np.int32)) == ((8, 1.0),)


def test_capacity_cap_respected():
    counts = np.full(128, 5000)
    tiers = tune_tiers(counts, max_capacity=1024)
    check_valid(tiers)
    assert all(cap <= 1024 for cap, _ in tiers)


def test_tuned_tiers_render_close_to_deep():
    """A tuned cascade on a random scene must render within normal capacity-
    truncation distance of a deep render (and be a valid tiers tuple for the
    rasterizer's assertions)."""
    import jax.numpy as jnp

    from tests.test_rasterize_tile import CFG_XLA, _render, make_scene
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_tile import _bin_gaussians

    cam, arrays = make_scene(n=200, seed=3)
    arrays = tuple(arrays)
    means, scales, q, opac, colors, bg = arrays
    proj = project_gaussians(
        means, scales, q, cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, cam.height, cam.width,
    )
    projs = type(proj)(*(x[None] for x in proj))
    ctx = _bin_gaussians(projs, colors[None], opac.reshape(1, -1),
                         cam.height, cam.width, 16, 4, 4)
    tiers = tune_tiers(np.asarray(ctx.full_counts))
    check_valid(tiers)

    img_tuned = _render(cam, arrays, CFG_XLA._replace(tiers=tiers))
    img_deep = _render(cam, arrays, CFG_XLA._replace(tile_capacity=512))
    mse = float(jnp.mean((img_tuned - img_deep) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40.0, (tiers, psnr)


def test_eval_cli_auto_cascade(tmp_path):
    """--auto_cascade flows through eval.py: tiers tuned at startup, eval
    completes, results.txt written."""
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    from tests.test_cli_e2e import SMALL_ARGS

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_train=4, n_test=2, image_size=64)

    import train as train_cli

    out = str(tmp_path / "out")
    train_cli.main(
        ["-s", data, "-m", out, *SMALL_ARGS,
         "--epochs", "1", "--save_epochs", "0", "--max_steps", "2", "--no_lpips"]
    )

    import eval as eval_cli

    eval_cli.main(["-m", out, "--auto_cascade", "1"])
    results = open(join(out, "test_free", "results.txt")).read()
    assert "psnr:" in results and "raster_overflow:" in results


def _probe_scene(opac_value, n=300, seed=5):
    """n gaussians stacked around the image center at spread depths, fixed
    opacity -> the saturation probe's needed-depth behavior is predictable:
    opaque stacks terminate after a handful of ranks, transparent ones
    blend everything they own."""
    import jax.numpy as jnp

    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.projection import ProjectedGaussians, project_gaussians

    rng = np.random.default_rng(seed)
    h = w = 64
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0, 0, 2.0], np.float32), K, h, w
    )
    means = np.concatenate(
        [rng.normal(scale=0.05, size=(n, 2)).astype(np.float32),
         np.linspace(-0.5, 0.5, n, dtype=np.float32)[:, None]], axis=1)
    scales = np.full((n, 3), 0.3, np.float32)  # big: whole-tile footprints
    q = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), opac_value, np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, h, w,
    )
    projs = ProjectedGaussians(*(x[None] for x in proj))
    return projs, jnp.asarray(colors)[None], jnp.asarray(opac)[None], h, w


def runtime_needed_coverage(tiers, counts, needed):
    """Simulate rasterize_views_binned's tier assignment exactly: base tier
    everywhere, each extra tier on the top-S tiles ranked by BINNED count
    (top_k, index tie-breaks), capacities nested. Returns the fraction of
    NEEDED gaussian-tile pairs the cascade actually blends."""
    counts = np.asarray(counts).astype(np.int64)
    needed = np.asarray(needed).astype(np.int64)
    G = counts.size
    cap = np.full(G, tiers[0][0], np.int64)
    order = np.argsort(-counts, kind="stable")
    for K, f in tiers[1:]:
        S = min(max(8, int(round(G * f))), G)
        cap[order[:S]] += K
    return np.minimum(cap, needed).sum() / max(needed.sum(), 1)


def test_order_by_matches_runtime_assignment():
    """The runtime hands heavy tiers to the tiles with the largest BINNED
    counts, but capacity must cover the NEEDED depths. An opaque tile
    (huge count, tiny need) outranks a semi-transparent tile
    (mid count, need == count); tuning on the need histogram sorted by
    ITSELF plans capacity for an assignment order the runtime won't use.
    order_by=counts optimizes the needed curve in true assignment order."""
    G = 256
    counts = np.zeros(G, np.int64)
    needed = np.zeros(G, np.int64)
    # 32 opaque tiles: massive stacks that saturate immediately
    counts[:32] = 10_000
    needed[:32] = 8
    # 16 semi-transparent tiles: every owned pair contributes
    counts[32:48] = 600
    needed[32:48] = 600
    # light background tiles
    counts[48:] = 16
    needed[48:] = 16

    naive = tune_tiers(needed, max_capacity=4096)
    fixed = tune_tiers(needed, max_capacity=4096, order_by=counts)
    check_valid(fixed)
    cov_naive = runtime_needed_coverage(naive, counts, needed)
    cov_fixed = runtime_needed_coverage(fixed, counts, needed)
    # the naive plan parks its deep tier on the opaque tiles and starves
    # the transparent ones; the order-aware plan covers the target
    assert cov_fixed >= 0.999, (fixed, cov_fixed)
    assert cov_naive < 0.999, (naive, cov_naive)
    assert cov_fixed > cov_naive


def test_order_by_noop_when_orders_agree():
    """When the count ranking and the needed ranking coincide (needed is a
    monotone function of count), order_by must not change the plan."""
    rng = np.random.default_rng(1)
    counts = rng.integers(10, 2000, 512)
    needed = counts // 3  # same descending order
    a = tune_tiers(needed)
    b = tune_tiers(needed, order_by=counts)
    assert a == b, (a, b)
    assert runtime_needed_coverage(b, counts, needed) >= 0.999


def test_probe_tile_depths_saturation():
    """probe_tile_depths: needed <= count everywhere; an OPAQUE depth stack
    saturates after a few ranks (CUDA early termination) while a nearly
    transparent one needs everything it owns."""
    from gaussianavatar_tpu.ops.rasterize_tile import probe_tile_depths

    cfg = tune_cfg = None
    from gaussianavatar_tpu.ops.rasterize import RasterizeConfig

    cfg = RasterizeConfig(tile_size=16, tile_capacity=64,
                          max_tiles_per_gaussian=16, backend="xla")

    projs, colors, opac, h, w = _probe_scene(0.99)
    counts, needed = probe_tile_depths(projs, colors, opac, h, w, cfg,
                                       probe_capacity=512)
    counts, needed = np.asarray(counts), np.asarray(needed)
    assert (needed <= counts).all()
    busy = counts >= 100
    assert busy.any()
    # The per-tile needed depth is max over the tile's PIXELS, so tiles cut
    # by a footprint edge keep deep needs (their rim pixels see tiny alphas
    # that never saturate — CUDA blends deep there too). The tiles under
    # the stack's core saturate in a few ranks: T after k alpha-.99 layers
    # = .01^k < 1e-4 at k=2-3; assert with ~10x margin.
    center = [5, 6, 9, 10]  # 4x4 tile grid of a 64^2 image, 16px tiles
    assert counts[center].min() >= 100
    assert needed[center].max() <= 32, (needed[center], counts[center])
    assert needed[busy].max() > 100  # edge tiles genuinely stay deep

    projs, colors, opac, h, w = _probe_scene(0.02)
    counts_t, needed_t = probe_tile_depths(projs, colors, opac, h, w, cfg,
                                           probe_capacity=512)
    counts_t, needed_t = np.asarray(counts_t), np.asarray(needed_t)
    # transparent: nothing terminates — on the stack's core tiles every
    # owned pair contributes (rim tiles may legitimately skip sub-1/255
    # alphas, which the binning counted but the blend's floor gates)
    assert (needed_t[center] == counts_t[center]).all(), (
        needed_t[center], counts_t[center])


def test_saturation_tuned_tiers_match_deep_render():
    """Tiers tuned on the NEEDED-depth histogram render the opaque stack
    essentially identically to a deep render, at a fraction of the
    capacity (the whole point of the saturation-aware auto-cascade)."""
    import jax.numpy as jnp

    from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
    from gaussianavatar_tpu.ops.rasterize_tile import (
        probe_tile_depths, rasterize_views_binned,
    )

    cfg = RasterizeConfig(tile_size=16, tile_capacity=512,
                          max_tiles_per_gaussian=16, backend="xla")
    projs, colors, opac, h, w = _probe_scene(0.9)
    counts, needed = probe_tile_depths(projs, colors, opac, h, w, cfg,
                                       probe_capacity=512)
    tiers = tune_tiers(np.asarray(needed), margin=1.25, max_capacity=512)
    check_valid(tiers)
    # never costlier than margin x the worst tile paid everywhere (on this
    # uniformly deep toy scene that bound is tight; bimodal avatar scenes
    # are where the saturation tuner wins big — see cascade_probe.py runs)
    bound = math.ceil(np.asarray(counts).max() * 1.25 / 128) * 128
    assert cascade_cost(tiers) <= bound, (tiers, bound)

    bgv = jnp.ones((3,), jnp.float32)
    img_tuned, ov = rasterize_views_binned(
        projs, colors, opac, bgv, h, w, cfg._replace(tiers=tiers))
    img_deep, _ = rasterize_views_binned(projs, colors, opac, bgv, h, w, cfg)
    mse = float(jnp.mean((img_tuned - img_deep) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, (tiers, psnr)
