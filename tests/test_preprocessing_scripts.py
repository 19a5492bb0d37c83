"""Preprocessing-toolchain scripts not covered by the stage-2 e2e flow:
sample_romp2gsavatar.py (ROMP capture -> dataset layout, reference
scripts/sample_romp2gsavatar.py) and render_pred_smpl.py (SMPL-overlay
visual QA, reference scripts/render_pred_smpl.py)."""

import os
import subprocess
import sys
from os.path import dirname, join

import numpy as np
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_script(name, *argv):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, join(REPO, "scripts", name), *argv],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_sample_romp2gsavatar(tmp_path):
    """ROMP-format capture converts to the reference dataset layout with the
    InstantAvatar 80/20 split, renumbered frames, and a torch-free
    smpl_parms.pth carrying the right poses."""
    from PIL import Image

    romp = tmp_path / "romp"
    (romp / "images").mkdir(parents=True)
    (romp / "masks").mkdir()
    N = 10
    rng = np.random.default_rng(0)
    for i in range(N):
        Image.fromarray(
            rng.integers(0, 255, size=(24, 16, 3), dtype=np.uint8)
        ).save(romp / "images" / f"frame_{i:04d}.png")
        Image.fromarray(
            np.full((24, 16), 255, np.uint8)
        ).save(romp / "masks" / f"frame_{i:04d}.png")
    np.savez(romp / "cameras.npz",
             intrinsic=np.array([[20.0, 0, 8], [0, 20.0, 12], [0, 0, 1]]),
             extrinsic=np.eye(4))
    body_pose = rng.normal(size=(N, 69)).astype(np.float32)
    np.savez(romp / "poses_optimized.npz",
             global_orient=rng.normal(size=(N, 3)).astype(np.float32),
             body_pose=body_pose,
             transl=rng.normal(size=(N, 3)).astype(np.float32),
             betas=rng.normal(size=(10,)).astype(np.float32))

    out = str(tmp_path / "data")
    run_script("sample_romp2gsavatar.py", "--input", str(romp), "--output", out)

    from gaussianavatar_tpu.utils.torch_pth import load_pth

    assert sorted(os.listdir(join(out, "train", "images"))) == [
        f"{i:08d}.png" for i in range(8)
    ]
    assert len(os.listdir(join(out, "test", "images"))) == 2
    for split, ids in (("train", range(8)), ("test", range(8, 10))):
        parms = load_pth(join(out, split, "smpl_parms.pth"))
        assert parms["body_pose"].shape == (len(list(ids)), 72)
        np.testing.assert_allclose(
            parms["body_pose"][:, 3:], body_pose[list(ids)], atol=1e-6
        )
        cams = np.load(join(out, split, "cam_parms.npz"))
        assert cams["intrinsic"].shape == (3, 3)
        assert os.path.exists(join(out, split, "masks", "00000000.png"))


def test_render_pred_smpl_overlay(tmp_path):
    """The QA overlay renders splatted SMPL vertices over the input frames."""
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_train=3, n_test=1, image_size=48)
    out = str(tmp_path / "qa")
    run_script("render_pred_smpl.py", "--source_path", data, "--synthetic",
               "--out", out, "--n_frames", "2")
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 2, pngs
