"""LPIPS end-to-end activation: with weight files present under
<project_path>/assets/lpips, training picks up the 0.2*LPIPS term
automatically (reference train.py:26,89-91) and eval reports a numeric
lpips in results.txt (reference eval.py:20-25). Uses a fabricated
(random, correctly-shaped) AlexNet+linear-head weight set — the math is
torch-parity-tested in tests/test_lpips.py; this test covers the wiring:
discovery, the epoch gate, the metrics stream, and the eval column."""

import json
import os
import sys
from os.path import join

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_cli_e2e import SMALL_ARGS  # noqa: E402


def fabricate_lpips_npz(path):
    """Random weights with the exact lpips_alex.npz layout."""
    rng = np.random.default_rng(0)
    cfg = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    out = {}
    for i, (co, ci, k) in enumerate(cfg):
        out[f"conv{i}_w"] = rng.normal(scale=0.05, size=(co, ci, k, k)).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(co, np.float32)
        out[f"lin{i}"] = rng.uniform(0, 0.1, size=co).astype(np.float32)
    np.savez(path, **out)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    root = tmp_path_factory.mktemp("lpipsdata")
    write_synthetic_dataset(str(root), n_train=4, n_test=2, image_size=64)
    return str(root)


def test_lpips_weights_flow_through_train_and_eval(dataset, tmp_path):
    proj = tmp_path / "proj"
    os.makedirs(proj / "assets" / "lpips")
    fabricate_lpips_npz(str(proj / "assets" / "lpips" / "lpips_alex.npz"))

    import train as train_cli

    out = str(tmp_path / "out")
    # lpips_start_iter is epoch-gated (reference: `if epoch > 30`); 0 turns
    # the term on from epoch 1 for this smoke
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS,
         "--project_path", str(proj),
         "--epochs", "2", "--save_epochs", "0", "--lpips_start_iter", "0",
         "--steps_per_dispatch", "1"]
    )
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = [r for r in rows if r.get("event") == "lpips"]
    assert events and events[0]["value"] == "active", events
    termed = [r for r in rows if "vgg" in r]
    assert termed, "no vgg loss term logged despite active LPIPS"
    assert all(np.isfinite(r["vgg"]) for r in termed)

    import eval as eval_cli

    eval_cli.main(["-m", out, "--project_path", str(proj)])
    results = open(join(out, "test_free", "results.txt")).read()
    lp = results.split("lpips:")[1].split()[0]
    assert np.isfinite(float(lp)), results  # numeric, not an 'inactive' note
    assert "raster_overflow:" in results, results


def test_no_weights_records_inactive(dataset, tmp_path):
    import train as train_cli

    proj = tmp_path / "emptyproj"
    os.makedirs(proj)
    out = str(tmp_path / "out2")
    train_cli.main(
        ["-s", dataset, "-m", out, *SMALL_ARGS, "--project_path", str(proj),
         "--epochs", "1", "--save_epochs", "0", "--max_steps", "2"]
    )
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = [r for r in rows if r.get("event") == "lpips"]
    assert events and "inactive" in str(events[0]["value"]), events
