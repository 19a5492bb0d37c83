"""Full two-stage pipeline on synthetic data: stage-1 train -> export
optimized poses (smpl_parms_pred.pth) -> per-frame posed posmaps (inp_map) ->
stage-2 train -> stage-2 eval. Mirrors the reference README custom-video flow
(SURVEY.md §3.5)."""

import os
import subprocess
import sys
from os.path import dirname, join

import numpy as np
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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


def run_script(name, *argv):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, join(REPO, "scripts", name), *argv],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_full_two_stage_pipeline(tmp_path):
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    data = str(tmp_path / "data")
    out1 = str(tmp_path / "out_stage1")
    out2 = str(tmp_path / "out_stage2")
    write_synthetic_dataset(data, n_train=4, n_test=2, image_size=64)

    import train as train_cli

    train_cli.main(
        ["-s", data, "-m", out1, *SMALL_ARGS,
         "--epochs", "1", "--save_epochs", "0", "--no_lpips"]
    )
    assert os.path.exists(join(out1, "net", "iteration_1"))

    run_script("export_stage_1.py", "-m", out1, "-s", data, "--epoch", "1")
    assert os.path.exists(join(data, "train", "smpl_parms_pred.pth"))
    assert os.path.exists(join(data, "test", "smpl_parms_pred.pth"))

    run_script("gen_pose_map_frames.py", "--source_path", data, "--synthetic", "--size", "32")
    assert os.path.exists(join(data, "train", "inp_map", "inp_posemap_32_00000000.npz"))

    train_cli.main(
        ["-s", data, "-m", out2, *SMALL_ARGS,
         "--train_stage", "2", "--stage1_out_path", join(out1, "net", "iteration_1"),
         "--epochs", "1", "--save_epochs", "0", "--no_lpips"]
    )
    assert os.path.exists(join(out2, "net", "iteration_1"))

    import eval as eval_cli

    eval_cli.main(["-m", out2])
    results = open(join(out2, "test_free", "results.txt")).read()
    psnr_val = float(results.split("psnr:")[1].split()[0])
    assert np.isfinite(psnr_val), results


def test_gen_pose_map_cano_script(tmp_path):
    """The canonical-posmap generator writes all reference artifacts and the
    training setup can consume them via the reference-asset path."""
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_train=2, n_test=2, image_size=64)
    run_script(
        "gen_pose_map_cano.py", "--source_path", data, "--synthetic",
        "--project_path", str(tmp_path), "--sizes", "64",
    )
    assert os.path.exists(join(data, "train", "query_posemap_64_cano_smpl.npz"))
    assert os.path.exists(join(data, "train", "smpl_cano_joint_mat.pth"))
    assert os.path.exists(join(str(tmp_path), "assets", "lbs_map_smpl_64.npy"))
    assert os.path.exists(join(str(tmp_path), "assets", "uv_masks", "uv_mask64_with_faceid_smpl.npy"))

    # the loader path picks these up and produces a coherent asset bundle
    from gaussianavatar_tpu.config import ModelParams
    from gaussianavatar_tpu.engine.setup import _load_reference_assets
    from gaussianavatar_tpu.utils.synthetic import synthetic_body

    model, _ = synthetic_body()
    mp = ModelParams(
        source_path=data, model_path=str(tmp_path / "o"), project_path=str(tmp_path),
        dataset_type="synthetic", query_posmap_size=64,
    )
    assets = _load_reference_assets(mp, np.zeros(4, np.float32), model.parents.shape[0])
    assert assets is not None
    assert assets.num_valid > 1000
    # lbs rows of valid points sum to ~1
    ql = np.asarray(assets.query_lbs)[: assets.num_valid]
    np.testing.assert_allclose(ql.sum(-1), 1.0, atol=1e-4)


def test_fixed_inp_stage2(tmp_path):
    """--fixed_inp 1: stage 2 trains and evals from ONE static posmap with no
    per-frame inp_map files (avatar_model.py:70-72)."""
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    data = str(tmp_path / "data")
    out1 = str(tmp_path / "s1")
    out2 = str(tmp_path / "s2")
    write_synthetic_dataset(data, n_train=4, n_test=2, image_size=64)

    import train as train_cli

    train_cli.main(["-s", data, "-m", out1, *SMALL_ARGS,
                    "--epochs", "1", "--save_epochs", "0", "--no_lpips"])
    run_script("export_stage_1.py", "-m", out1, "-s", data, "--epoch", "1")
    # the fixed posmap at inp resolution (no per-frame inp_map generated!)
    run_script("gen_pose_map_cano.py", "--source_path", data, "--synthetic",
               "--project_path", str(tmp_path), "--sizes", "32")

    train_cli.main(["-s", data, "-m", out2, *SMALL_ARGS,
                    "--train_stage", "2", "--fixed_inp", "1",
                    "--stage1_out_path", join(out1, "net", "iteration_1"),
                    "--epochs", "1", "--save_epochs", "0", "--no_lpips"])
    assert os.path.exists(join(out2, "net", "iteration_1"))

    import eval as eval_cli

    eval_cli.main(["-m", out2])
    results = open(join(out2, "test_free", "results.txt")).read()
    assert "psnr:" in results


def test_stage2_ragged_need_table(tmp_path):
    """Stage-2 training composes with --ragged 1 --auto_cascade 1: the
    need-table probe snapshots per-frame inp posmaps at startup (the
    dataset stops serving them once the device banks are built)."""
    import json

    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    data = str(tmp_path / "data")
    out1 = str(tmp_path / "out_stage1")
    out2 = str(tmp_path / "out_stage2_rg")
    write_synthetic_dataset(data, n_train=4, n_test=2, image_size=64)

    import train as train_cli

    train_cli.main(
        ["-s", data, "-m", out1, *SMALL_ARGS,
         "--epochs", "1", "--save_epochs", "0", "--no_lpips"]
    )
    run_script("export_stage_1.py", "-m", out1, "-s", data, "--epoch", "1")
    run_script("gen_pose_map_frames.py", "--source_path", data,
               "--synthetic", "--size", "32")

    train_cli.main(
        ["-s", data, "-m", out2, *SMALL_ARGS,
         "--train_stage", "2", "--stage1_out_path", join(out1, "net", "iteration_1"),
         "--ragged", "1", "--ragged_chunk", "16", "--auto_cascade", "1",
         "--epochs", "2", "--save_epochs", "1", "--save_epoch", "1",
         "--no_lpips"]
    )
    assert os.path.exists(join(out2, "net", "iteration_2"))
    with open(join(out2, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = {r["event"]: r["value"] for r in rows if "event" in r}
    assert "ragged_need_bank" in events, events
    losses = [r["total"] for r in rows if "total" in r]
    assert losses and np.isfinite(losses[-1])
