"""End-to-end CLI flow on a synthetic reference-format dataset:
train.py (stage 1, few steps) -> checkpoint -> eval.py (PSNR/SSIM into
results.txt) -> render_novel_pose.py. This is the full user journey of the
reference repo (README 'run on People Snapshot') running hermetically.
"""

import json
import os
import sys
from os.path import join

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL_ARGS = [
    "--dataset_type", "synthetic",
    "--query_posmap_size", "64",
    "--inp_posmap_size", "32",
    "--c_geom", "16",
    "--c_pose", "16",
    "--hsize", "64",
    "--nf", "8",
    "--batch_size", "2",
    "--tile_size", "16",
    "--tile_capacity", "256",
    "--backend", "xla",
]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    root = tmp_path_factory.mktemp("synthdata")
    write_synthetic_dataset(str(root), n_train=6, n_test=2, image_size=64)
    return str(root)


def test_train_eval_novelpose(dataset, tmp_path):
    import train as train_cli

    out = str(tmp_path / "out")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "2", "--save_epochs", "1", "--max_steps", "6", "--no_lpips"]
    )
    assert os.path.exists(join(out, "cfg_args.json"))
    assert os.path.exists(join(out, "metrics.jsonl"))
    ckpts = os.listdir(join(out, "net"))
    assert len(ckpts) >= 1, ckpts
    # periodic debug dumps must fire under the multi-step dispatch default
    # (regression: the log_iter boundary test once required exact equality,
    # unreachable when first_iter strides by steps_per_dispatch)
    logs = os.listdir(join(out, "log"))
    assert any(f.endswith("_pred.png") for f in logs), logs
    assert any(f.endswith("_gt.png") for f in logs), logs
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert rows and np.isfinite(rows[-1]["total"])

    import eval as eval_cli

    eval_cli.main(["-m", out])
    results = open(join(out, "test_free", "results.txt")).read()
    assert "psnr:" in results and "ssim:" in results
    psnr_val = float(results.split("psnr:")[1].split()[0])
    assert np.isfinite(psnr_val) and psnr_val > 5.0, results
    assert os.path.exists(join(out, "test_free", "renders", "0000.png"))

    import render_novel_pose as rnp_cli

    rnp_cli.main(
        ["-m", out, "--image_size", "64", "--test_folder", join(dataset, "test")]
    )
    frames = os.listdir(join(out, "novel_pose"))
    assert any(f.endswith(".png") for f in frames)

    import render_novel_view as rnv_cli

    # default bullet_pose_list (112/217/755) is out of range on this 6-frame
    # dataset -> must fall back to pose 0 instead of rendering nothing
    rnv_cli.main(["-m", out, "--frames", "3"])
    orbit = os.listdir(join(out, "novel_view", "pose_0"))
    assert sum(f.endswith(".png") for f in orbit) == 3, orbit


def test_train_resume(dataset, tmp_path):
    """--checkpoint_epochs resumes from a saved epoch (train.py:36-39)."""
    import train as train_cli

    out = str(tmp_path / "out2")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "1", "--save_epochs", "0", "--no_lpips"]
    )
    assert os.path.exists(join(out, "net", "iteration_1"))
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "2", "--save_epochs", "0", "--checkpoint_epochs", "1", "--no_lpips"]
    )
    assert os.path.exists(join(out, "net", "iteration_2"))


def test_train_auto_cascade(dataset, tmp_path):
    """--auto_cascade 1 derives the train-side capacity tiers from the
    scene's own tile-load histogram (ops/cascade.tune_tiers), re-tunes once
    after the warm-up epoch, and eval honors the same flag. Guards the
    512-query regression where the 256-swept fixed cascade silently dropped
    ~20% of gaussian-tile pairs per training step."""
    import train as train_cli

    out = str(tmp_path / "out_ac")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "2", "--save_epochs", "1", "--auto_cascade", "1",
         "--no_lpips"]
    )
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = {r["event"]: r["value"] for r in rows if "event" in r}
    assert "auto_cascade" in events, events
    tiers = eval(events["auto_cascade"])  # "((K, 1.0), ...)" literal
    assert tiers and tiers[0][1] == 1.0 and tiers[0][0] % 8 == 0, tiers
    # epoch-1 retune ran (tiers may or may not move on this tiny scene, but
    # when they do the event is logged; either way training completed)
    assert np.isfinite([r for r in rows if "total" in r][-1]["total"])

    import eval as eval_cli

    eval_cli.main(["-m", out, "--auto_cascade", "1"])
    results = open(join(out, "test_free", "results.txt")).read()
    assert "psnr:" in results


def test_eval_inherits_auto_cascade_from_cfg(dataset, tmp_path, capsys):
    """A model trained with --auto_cascade 1 must evaluate through the
    auto-tuned cascade WITHOUT the flag being repeated: eval.py merges the
    saved cfg_args.json raster params, so the tuner runs on load. This is
    the path quality-gate campaigns rely on (their eval calls pass no
    raster flags)."""
    import train as train_cli

    out = str(tmp_path / "out_ac_inherit")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "1", "--save_epochs", "0", "--max_steps", "2",
         "--auto_cascade", "1", "--no_lpips"]
    )

    import eval as eval_cli

    eval_cli.main(["-m", out])  # no --auto_cascade here
    assert "auto_cascade tiers:" in capsys.readouterr().out
    results = open(join(out, "test_free", "results.txt")).read()
    assert "psnr:" in results and "raster_overflow:" in results


def test_train_ragged_need_table(dataset, tmp_path):
    """--ragged 1 --auto_cascade 1 trains through the ragged slot-stream
    rasterizer with a per-frame NEED table (saturation probe over every
    train frame, refreshed at save boundaries). Eval inherits the cfg but
    maps ragged to the train side only — it still runs (on the cascade)."""
    import train as train_cli

    out = str(tmp_path / "out_ragged")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "2", "--save_epochs", "1",
         "--ragged", "1", "--ragged_chunk", "16", "--auto_cascade", "1",
         "--no_lpips"]
    )
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = {r["event"]: r["value"] for r in rows if "event" in r}
    assert "ragged_need_bank" in events, events
    assert "budget" in events["ragged_need_bank"]
    losses = [r["total"] for r in rows if "total" in r]
    assert losses and np.isfinite(losses[-1])
    # the need-capped steps must report overflow (pairs beyond saturation
    # are dropped by design and counted, never silent)
    assert all(np.isfinite(r["raster_overflow"]) for r in rows
               if "raster_overflow" in r)

    import eval as eval_cli

    eval_cli.main(["-m", out])
    results = open(join(out, "test_free", "results.txt")).read()
    assert "psnr:" in results


def test_canonical_defaults_engage_ragged(dataset, tmp_path, monkeypatch, capsys):
    """Above the swept cascade's validated workload (>256-query) a plain
    default-flags train run must follow the campaign-validated path:
    ragged=1 + auto_cascade=1 (VERDICT round-4 weak #1 — the reference-parity
    command at its 512-query default used to silently train the fixed
    cascade proven to drop ~89% of contributing pairs and land 16 dB low).
    Explicit --ragged 0 --auto_cascade 0 is respected but warns loudly."""
    import train as train_cli
    from gaussianavatar_tpu.engine import loop as loop_mod

    seen = {}

    def fake_train(cfg, *a, **kw):
        seen["cfg"] = cfg

    monkeypatch.setattr(loop_mod, "train", fake_train)

    def run(extra):
        train_cli.main(
            ["-s", dataset, "-m", str(tmp_path / "out_defaults"), *SMALL_ARGS,
             "--no_lpips", *extra])
        return seen.pop("cfg")

    # reference-parity canonical command: 512-query, no raster flags
    cfg = run(["--query_posmap_size", "512"])
    assert cfg.raster.ragged == 1 and cfg.raster.auto_cascade == 1
    out = capsys.readouterr().out
    assert "ragged=1" in out and "auto_cascade=1" in out

    # at/below the sweep point the (validated, faster) cascade stays default
    cfg = run(["--query_posmap_size", "256"])
    assert cfg.raster.ragged == 0 and cfg.raster.auto_cascade == 0

    # explicit opt-out: honored, but the starvation warning must fire
    cfg = run(["--query_posmap_size", "512", "--ragged", "0",
               "--auto_cascade", "0"])
    assert cfg.raster.ragged == 0 and cfg.raster.auto_cascade == 0
    out = capsys.readouterr().out
    assert "WARNING" in out and "16 dB" in out

    # half-explicit: --ragged 0 alone still defaults auto_cascade=1 (tuned
    # tiers keep coverage correct), and the warning must NOT fire
    cfg = run(["--query_posmap_size", "512", "--ragged", "0"])
    assert cfg.raster.ragged == 0 and cfg.raster.auto_cascade == 1
    assert "WARNING" not in capsys.readouterr().out


def test_canonical_defaults_run_need_table_e2e(dataset, tmp_path):
    """A real default-flags train at >256-query actually builds and trains
    through the per-frame need table (not just sets the flags)."""
    import train as train_cli

    out = str(tmp_path / "out_def_e2e")
    # no --ragged/--auto_cascade flags: the workload size alone must engage
    # the need-table path (288 > SWEPT_CASCADE_MAX_QUERY; small enough for CPU)
    args = [a for a in SMALL_ARGS]
    train_cli.main(
        ["-s", dataset, "-m", out, *args,
         "--query_posmap_size", "288", "--ragged_chunk", "16",
         "--epochs", "1", "--save_epochs", "0", "--max_steps", "2",
         "--no_lpips"])
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = {r["event"]: r["value"] for r in rows if "event" in r}
    assert "ragged_need_bank" in events, events
    losses = [r["total"] for r in rows if "total" in r]
    assert losses and np.isfinite(losses[-1])
    # the resolved defaults are persisted so eval/render inherit them
    cfg = json.load(open(join(out, "cfg_args.json")))
    assert cfg["raster"]["ragged"] == 1 and cfg["raster"]["auto_cascade"] == 1


def test_train_ragged_matches_cascade_first_step(dataset, tmp_path):
    """One optimizer step, ragged (caps = true counts, ample budget) vs a
    deep single-tier cascade: identical coverage -> the loss metrics logged
    for the step must agree closely (same blended pairs, same op order)."""
    import train as train_cli

    def one_step(extra, tag):
        out = str(tmp_path / f"out_{tag}")
        # both runs go through the Pallas kernels (interpret on CPU): the
        # ragged and cascade kernels share the inner op order, so matching
        # coverage means bit-matching losses; the XLA-twin backend would add
        # float-reassociation noise to the comparison
        args = [a if a != "xla" else "pallas_interpret" for a in SMALL_ARGS]
        # deep capacity: warm-up-scale gaussians stack tiles past 256, so the
        # default test capacity would truncate the cascade while ragged
        # (budget 0 = worst case) covers every pair — match coverage instead
        args = [a if a != "256" else "2048" for a in args]
        train_cli.main(
            ["-s", dataset, "-m", out, *args,
             "--epochs", "1", "--save_epochs", "0", "--max_steps", "1",
             "--steps_per_dispatch", "1", "--no_lpips", *extra]
        )
        with open(join(out, "metrics.jsonl")) as f:
            rows = [json.loads(l) for l in f]
        return [r for r in rows if "total" in r][0]

    # capacity 2048 >= every per-tile count on this tiny scene = exact
    base = one_step([], "cascade_exact")
    ragg = one_step(["--ragged", "1", "--ragged_chunk", "16"], "ragged_exact")
    assert abs(base["total"] - ragg["total"]) < 1e-6, (base, ragg)
    assert base["raster_overflow"] == ragg["raster_overflow"]


def test_ragged_eval_matches_cascade_eval(dataset, tmp_path, capsys):
    """--ragged_eval 1 probes each eval batch and renders with exact
    per-tile caps; PSNR must match a deep-capacity cascade eval (the probe
    caps reproduce exactly what early termination blends)."""
    import train as train_cli

    out = str(tmp_path / "out_re")
    args = [a if a != "xla" else "pallas_interpret" for a in SMALL_ARGS]
    args = [a if a != "256" else "2048" for a in args]  # deep = exact here
    train_cli.main(
        ["-s", dataset, "-m", out, *args,
         "--epochs", "1", "--save_epochs", "0", "--max_steps", "2",
         "--no_lpips"]
    )

    import eval as eval_cli

    eval_cli.main(["-m", out])
    deep = open(join(out, "test_free", "results.txt")).read()
    eval_cli.main(["-m", out, "--ragged_eval", "1"])
    ragged = open(join(out, "test_free", "results.txt")).read()
    assert "ragged eval" in capsys.readouterr().out
    assert "non-contributing" in ragged
    p_deep = float(deep.split("psnr:")[1].split()[0])
    p_rag = float(ragged.split("psnr:")[1].split()[0])
    # probe-exact caps blend the same pairs the deep render's early
    # termination accepts -> metrics agree to float noise
    assert abs(p_deep - p_rag) < 1e-3, (p_deep, p_rag)


def test_ragged_eval_novel_pose_and_view(dataset, tmp_path, capsys):
    """--ragged_eval 1 on the novel-pose and novel-view CLIs (VERDICT
    round-4 weak #5: the flagship demo path used to render under a weaker
    coverage guarantee than eval). Probe-exact frames must match a
    deep-capacity cascade render of the same poses to float noise."""
    import train as train_cli

    out = str(tmp_path / "out_re_np")
    args = [a if a != "xla" else "pallas_interpret" for a in SMALL_ARGS]
    args = [a if a != "256" else "2048" for a in args]  # deep = exact here
    train_cli.main(
        ["-s", dataset, "-m", out, *args,
         "--epochs", "1", "--save_epochs", "0", "--max_steps", "2",
         "--no_lpips"]
    )

    from PIL import Image

    import render_novel_pose as rnp_cli
    import render_novel_view as rnv_cli

    common = ["-m", out, "--image_size", "64",
              "--test_folder", join(dataset, "test")]
    rnp_cli.main(common)
    deep = {f: np.asarray(Image.open(join(out, "novel_pose", f)), np.float32)
            for f in sorted(os.listdir(join(out, "novel_pose")))}
    rnp_cli.main(common + ["--ragged_eval", "1"])
    assert "ragged render" in capsys.readouterr().out
    for f, d in deep.items():
        r = np.asarray(Image.open(join(out, "novel_pose", f)), np.float32)
        assert np.abs(r - d).max() <= 1.0, (f, np.abs(r - d).max())  # 8-bit ulp

    rnv_cli.main(["-m", out, "--frames", "2"])
    vdir = join(out, "novel_view", "pose_0")
    deep_v = {f: np.asarray(Image.open(join(vdir, f)), np.float32)
              for f in sorted(os.listdir(vdir)) if f.endswith(".png")}
    rnv_cli.main(["-m", out, "--frames", "2", "--ragged_eval", "1"])
    assert "ragged render" in capsys.readouterr().out
    for f, d in deep_v.items():
        r = np.asarray(Image.open(join(vdir, f)), np.float32)
        assert np.abs(r - d).max() <= 1.0, (f, np.abs(r - d).max())


def test_footprint_adapts_on_retune(dataset, tmp_path, monkeypatch):
    """Adaptive train footprint (RasterParams.train_footprint_adapt): the
    loop shrinks max_tiles_per_gaussian to the render profile (4) when the
    probe's candidate clip fraction is ~0, widens back past the 3x-eps
    hysteresis when the scene grows, and keeps training. Fraction schedule
    over the 4 need-bank builds (startup + retunes at epochs 1, 2, 3):
    0 -> shrink at startup; 1e-2 -> widen at e1; 0 -> shrink at e2;
    0 -> silence at e3 (already narrow)."""
    import train as train_cli
    from gaussianavatar_tpu.engine import inference as inf

    n_tiles = (64 // 16) ** 2
    calls = {"n": 0}

    def fake_make_counts_fn(bundle, H, W, rcfg, probe_capacity=0, cand_m=0):
        def counts(params, batch_stats, feed):
            B = int(np.asarray(feed["pose_idx"]).shape[0])
            build = calls["n"] // 3  # 6 frames / batch 2 = 3 feeds per build
            calls["n"] += 1
            total = B * 512 * n_tiles
            drop = int(total * 1e-2) if build == 1 else 0
            out = (np.full((B * n_tiles,), 512, np.int32),
                   np.full((B * n_tiles,), 64, np.int32))
            if cand_m > 0:
                out = out + (np.int32(drop), np.int32(total))
            return out

        return counts

    monkeypatch.setattr(inf, "make_counts_fn", fake_make_counts_fn)

    out = str(tmp_path / "out_fp")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "3", "--save_epoch", "1", "--save_epochs", "0",
         "--ragged", "1", "--ragged_chunk", "16", "--auto_cascade", "1",
         "--no_lpips"]
    )
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    fp = [r["value"] for r in rows if r.get("event") == "footprint_adapt"]
    ms = [int(v.split("M ")[1].split()[0]) for v in fp]
    assert ms == [4, 9, 4], fp
    losses = [r["total"] for r in rows if "total" in r]
    assert losses and np.isfinite(losses[-1])


def test_ragged_budget_shrinks_on_retune(dataset, tmp_path, monkeypatch):
    """A save-boundary retune whose need table DROPPED must shrink the
    ragged chunk budget (and rebuild the step), not just grow it: holding
    the epoch-1 warm-up budget for the whole run paid ~2x the necessary
    gather/blend/grad rows at the canonical campaign (1472 rows/tile held
    against a ~700 converged need — BASELINE.md round-4). Jitter within the
    10% hysteresis must NOT rebudget (recompile thrash)."""
    import train as train_cli
    from gaussianavatar_tpu.engine import inference as inf

    n_tiles = (64 // 16) ** 2  # image 64^2, tile_size 16
    calls = {"n": 0}
    # 6 frames / batch 2 -> 3 probe feeds per need-bank build. Builds:
    # initial + epoch-1 retune see a DEEP scene (need 160/tile); the
    # epoch-2 and epoch-3 retunes see a converged shallow one (16/tile).
    # Expected: one shrink event at epoch 2, silence at epoch 3 (equal
    # budget falls inside the hysteresis).
    def fake_make_counts_fn(bundle, H, W, rcfg, probe_capacity=0, cand_m=0):
        def counts(params, batch_stats, feed):
            B = int(np.asarray(feed["pose_idx"]).shape[0])
            need = 160 if calls["n"] < 6 else 16
            calls["n"] += 1
            full = np.full((B * n_tiles,), 512, np.int32)
            out = (full, np.full((B * n_tiles,), need, np.int32))
            if cand_m > 0:
                # candidate footprint clips nothing on this fake scene
                out = out + (np.int32(0), np.int32(B * 512 * n_tiles))
            return out

        return counts

    monkeypatch.setattr(inf, "make_counts_fn", fake_make_counts_fn)

    out = str(tmp_path / "out_shrink")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "3", "--save_epoch", "1", "--save_epochs", "0",
         "--ragged", "1", "--ragged_chunk", "16", "--auto_cascade", "1",
         "--no_lpips"]
    )
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    bank = [r["value"] for r in rows if r.get("event") == "ragged_need_bank"]
    rebudgets = [int(r["value"]) for r in rows
                 if r.get("event") == "ragged_rebudget"]
    assert bank, rows
    init_budget = int(bank[0].split("budget ")[1].split()[0])
    assert len(rebudgets) == 1, (init_budget, rebudgets)
    assert rebudgets[0] < init_budget, (init_budget, rebudgets)
    # training continued on the shrunk grid: epoch-3 steps logged finite
    losses = [r["total"] for r in rows if "total" in r]
    assert losses and np.isfinite(losses[-1])


def test_sampled_retune_skips_full_probe(dataset, tmp_path, monkeypatch):
    """Sampled save-boundary retunes (RasterParams.retune_sample): once the
    scene converges, a retune probes only every N-th probe batch; when the
    sampled drift is ~0, the footprint decision is unchanged, and the merged
    budget sits inside the 10% hysteresis, the full-dataset probe AND the
    rebudget/recompile are skipped (retunes cost ~48 s each at the canonical
    campaign, ~430 s across 9 — BASELINE.md round-4). When the sample DOES
    detect drift (scene grew), the loop falls back to the full probe and
    rebudgets. Schedule (6 frames / batch 2 = 3 probe feeds,
    retune_sample=2):
      calls 0-2   startup build, need 64
      calls 3-5   epoch-1 retune: always FULL, need 64 -> budget unchanged
      call  6     epoch-2 retune: sampled (offset 1 -> 1 feed), need 64
                  -> drift 0, budget inside hysteresis -> SKIP (1 event)
      calls 7-8   epoch-3 retune: sampled (offset 0 -> 2 feeds), need 160
                  -> drift 0.4 > eps -> fall back to FULL
      calls 9-11  epoch-3 full probe, need 160 -> budget GROWS (1 rebudget)
    """
    import train as train_cli
    from gaussianavatar_tpu.engine import inference as inf

    n_tiles = (64 // 16) ** 2
    calls = {"n": 0}

    def fake_make_counts_fn(bundle, H, W, rcfg, probe_capacity=0, cand_m=0):
        def counts(params, batch_stats, feed):
            B = int(np.asarray(feed["pose_idx"]).shape[0])
            need = 64 if calls["n"] < 7 else 160
            calls["n"] += 1
            out = (np.full((B * n_tiles,), 512, np.int32),
                   np.full((B * n_tiles,), need, np.int32))
            if cand_m > 0:
                out = out + (np.int32(0), np.int32(B * 512 * n_tiles))
            return out

        return counts

    monkeypatch.setattr(inf, "make_counts_fn", fake_make_counts_fn)

    out = str(tmp_path / "out_sampled")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "3", "--save_epoch", "1", "--save_epochs", "0",
         "--ragged", "1", "--ragged_chunk", "16", "--auto_cascade", "1",
         "--retune_sample", "2", "--no_lpips"]
    )
    assert calls["n"] == 12, calls
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    sampled = [r["value"] for r in rows if r.get("event") == "retune_sampled"]
    assert len(sampled) == 1 and "epoch 2" in sampled[0], sampled
    # the sampled drift log names its subset scope
    drifts = [r["value"] for r in rows if r.get("event") == "ragged_drift"]
    assert any("frames sampled)" in d for d in drifts), drifts
    bank = [r["value"] for r in rows if r.get("event") == "ragged_need_bank"]
    init_budget = int(bank[0].split("budget ")[1].split()[0])
    rebudgets = [int(r["value"]) for r in rows
                 if r.get("event") == "ragged_rebudget"]
    assert rebudgets == [r for r in rebudgets if r > init_budget], rebudgets
    assert len(rebudgets) == 1, (init_budget, rebudgets)
    losses = [r["total"] for r in rows if "total" in r]
    assert losses and np.isfinite(losses[-1])


def test_truncation_fidelity_script(dataset, tmp_path):
    """scripts/truncation_fidelity.py reports fidelity for BOTH adopted eval
    profiles (auto-cascade tiers and probe-exact ragged caps) against the
    deep 'uncapped' render — the parity target being the reference's
    uncapped CUDA blend (gaussian_renderer/__init__.py:40-48). Probe-exact
    caps blend every pair early termination accepts, so ragged-vs-deep must
    sit at float-noise PSNR; deep overflow must be 0 (proves 'deep = exact'
    on this scene)."""
    import train as train_cli

    out = str(tmp_path / "out_tf")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--epochs", "1", "--save_epoch", "1", "--save_epochs", "0",
         "--max_steps", "4", "--no_lpips"]
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, join(repo, "scripts"))
    import truncation_fidelity

    report_path = str(tmp_path / "tf.json")
    truncation_fidelity.main(
        ["-m", out, "--epoch", "1", "--deep_capacity", "4096",
         "--out", report_path]
    )
    with open(report_path) as f:
        report = json.load(f)
    # NB deep overflow is NOT asserted 0: it includes m_dropped (pairs cut
    # by the M=9 footprint cap — capacity-independent, and large on this
    # 4x4-tile scene). The exactness claim is the render agreement below.
    for key in ("cascade", "fast", "auto_cascade", "ragged_eval", "deep"):
        assert np.isfinite(report[key]["psnr_vs_gt"]), (key, report[key])
    assert report["auto_cascade"]["tiers"], report["auto_cascade"]
    assert 0 < report["ragged_eval"]["max_needed_depth"] <= 4096, report
    # probe-exact ragged caps reproduce the deep blend to float noise
    assert report["psnr_ragged_vs_deep"] > 55.0, report
    # saturation-sized auto tiers may truncate only non-contributing tails
    assert report["psnr_auto_vs_deep"] > 40.0, report
