"""Auto-tuned capacity cascade (ops/cascade.tune_tiers + the CLI wiring):
the tier table derived from a per-tile load histogram must be valid for
rasterize_views_binned (nested, non-increasing fractions, multiples of 8),
reach its coverage target, and flow through eval.py end to end."""

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
