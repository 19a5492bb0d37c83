"""CLI e2e for the scale-out launchers on the virtual 8-device mesh
(BASELINE config #5 as a *product* capability, not just a library one):

  - `train.py --dp 8`: single-subject training with the batch sharded over
    all 8 devices, checkpoint, resume, eval.
  - `train_multi.py`: 4 subjects x 2-way dp (the full 8-device grid) with
    UNEQUAL frame counts, per-subject checkpoints, resume from them, and
    single-subject eval.py consuming a subject's checkpoint unchanged.
"""

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
    "--tile_size", "16",
    "--tile_capacity", "256",
    "--backend", "xla",
]


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    root = tmp_path_factory.mktemp("multidata")
    # unequal frame counts: exercises the embedding-table pad/trim path
    for name, n in [("subjA", 6), ("subjB", 4), ("subjC", 4), ("subjD", 4)]:
        write_synthetic_dataset(str(root / name), n_train=n, n_test=2, image_size=64)
    return str(root)


def test_train_dp8_and_resume(datasets, tmp_path):
    import train as train_cli

    out = str(tmp_path / "dp_out")
    args = ["-s", join(datasets, "subjA"), "-m", out, *SMALL_ARGS,
            "--batch_size", "8", "--no_lpips", "--dp", "8"]
    train_cli.main([*args, "--epochs", "2", "--save_epochs", "0"])
    assert os.path.exists(join(out, "net", "iteration_2"))
    train_cli.main([*args, "--epochs", "3", "--save_epochs", "0",
                    "--checkpoint_epochs", "2"])
    assert os.path.exists(join(out, "net", "iteration_3"))

    import eval as eval_cli

    eval_cli.main(["-m", out])
    results = open(join(out, "test_free", "results.txt")).read()
    assert np.isfinite(float(results.split("psnr:")[1].split()[0]))


def test_train_dp_auto_cascade(datasets, tmp_path):
    """--dp and --auto_cascade compose: the saturation-probe tuner runs on
    REPLICATED state (loop.py replicates before tuning) and the retune at
    the save boundary must not disturb the sharded step. Guards the
    round-3 feature pair actually shipping together."""
    import json

    import train as train_cli

    out = str(tmp_path / "dp_ac_out")
    train_cli.main(
        ["-s", join(datasets, "subjB"), "-m", out, *SMALL_ARGS,
         "--batch_size", "4", "--no_lpips", "--dp", "2",
         "--auto_cascade", "1", "--epochs", "2", "--save_epochs", "1",
         "--save_epoch", "1"]
    )
    assert os.path.exists(join(out, "net", "iteration_2"))
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = {r["event"]: r["value"] for r in rows if "event" in r}
    assert "auto_cascade" in events, events
    tiers = eval(events["auto_cascade"])
    assert tiers[0][1] == 1.0 and all(k % 8 == 0 for k, _ in tiers)


def test_train_multi_4subjects_grid_and_resume(datasets, tmp_path):
    import train_multi as tm

    out = str(tmp_path / "multi_out")
    sources = [join(datasets, n) for n in ("subjA", "subjB", "subjC", "subjD")]
    args = ["--sources", *sources, "-m", out, *SMALL_ARGS,
            "--batch_size", "2", "--dp", "2"]
    tm.main([*args, "--epochs", "2", "--save_epochs", "0"])
    for name in ("subjA", "subjB", "subjC", "subjD"):
        assert os.path.exists(join(out, name, "net", "iteration_2", "net.ckpt")), name
        assert os.path.exists(join(out, name, "cfg_args.json"))
        assert os.path.exists(join(out, name, "metrics.jsonl"))

    # resume all subjects from their per-subject checkpoints
    tm.main([*args, "--epochs", "3", "--save_epochs", "0",
             "--checkpoint_epochs", "2"])
    assert os.path.exists(join(out, "subjD", "net", "iteration_3", "net.ckpt"))

    # a subject checkpoint is a plain single-subject checkpoint: eval.py works,
    # including for a subject whose embeddings were padded during training
    import eval as eval_cli

    eval_cli.main(["-m", join(out, "subjB")])
    results = open(join(out, "subjB", "test_free", "results.txt")).read()
    assert np.isfinite(float(results.split("psnr:")[1].split()[0]))


def test_multi_matches_single_subject_training(datasets, tmp_path):
    """One multi-subject step must reproduce single-subject training: train
    subjA alone and as one of two stacked subjects with identical data order,
    then compare the updated decoder/geo params."""
    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.config import (
        Config, ModelParams, NetworkParams, OptimizationParams, RasterParams,
    )
    from gaussianavatar_tpu.data.dataset import collate
    from gaussianavatar_tpu.engine.loop import raster_config
    from gaussianavatar_tpu.engine.multi_loop import DROP_KEYS, build_subject_bundles
    from gaussianavatar_tpu.engine.optim import build_optimizer
    from gaussianavatar_tpu.engine.train_step import init_state, make_train_step
    from gaussianavatar_tpu.parallel.grid import make_grid_mesh, make_grid_step
    from gaussianavatar_tpu.parallel.multi_subject import stack_assets, stack_subjects

    def cfg_for(src):
        return Config(
            model=ModelParams(source_path=src, model_path=str(tmp_path / "x"),
                              dataset_type="synthetic", query_posmap_size=64,
                              inp_posmap_size=32, batch_size=2),
            net=NetworkParams(c_geom=16, c_pose=16, hsize=64, nf=8),
            opt=OptimizationParams(epochs=2),
            raster=RasterParams(tile_size=16, tile_capacity=256, backend="xla"),
        )

    cfgs = [cfg_for(join(datasets, "subjA")), cfg_for(join(datasets, "subjB"))]
    bundles = build_subject_bundles(cfgs)
    b0 = bundles[0]
    probe = b0.train_dataset[0]
    H, W = int(probe["height"]), int(probe["width"])

    class _TX0:
        def init(self, p):
            return None

    singles = [
        init_state(b.net, b.assets, _TX0(), rng=jax.random.PRNGKey(s), batch_size=2)
        for s, b in enumerate(bundles)
    ]
    # SGD so the parameter delta IS the gradient: Adam's eps-knee turns
    # cross-program ulp noise on near-zero grads (BN-absorbed biases) into
    # O(lr) sign flips (same rationale as tests/test_frame_dp.py)
    import optax

    tx = optax.sgd(1.0)
    singles = [st.replace(opt_state=tx.init(st.params)) for st in singles]

    def feed_of(b):
        batch = collate([b.train_dataset[0], b.train_dataset[1]])
        return {k: v for k, v in batch.items() if k not in DROP_KEYS}

    feeds = [feed_of(b) for b in bundles]
    one = jnp.float32(1.0)
    rcfg = raster_config(cfgs[0], train=True)

    # single-subject reference update for subjA
    step1 = make_train_step(b0.net, b0.body_model, b0.assets, tx, cfgs[0].opt,
                            H, W, (1.0, 1.0, 1.0), rcfg, train_stage=1)
    ref_state, ref_terms, _ = step1(
        jax.tree.map(jnp.array, singles[0]), feeds[0], one * 10.0, one, one * 0
    )

    # the same subject as slot 0 of a stacked 2-subject step
    mesh = make_grid_mesh(2, 2)
    stacked_assets = stack_assets([b.assets for b in bundles])
    gstep, place_subject, place_batch = make_grid_step(
        b0.net, b0.body_model, stacked_assets, tx, cfgs[0].opt,
        H, W, (1.0, 1.0, 1.0), rcfg, mesh, train_stage=1,
    )
    stacked_state = place_subject(stack_subjects(singles))
    stacked_feed = place_batch(
        {k: jnp.stack([feeds[0][k], feeds[1][k]]) for k in feeds[0]}
    )
    multi_state, multi_terms, _ = gstep(stacked_state, stacked_feed, one * 10.0, one, one * 0)

    np.testing.assert_allclose(
        float(np.asarray(multi_terms["total"])[0]), float(ref_terms["total"]),
        rtol=1e-5, atol=1e-6,
    )
    for key in ("geo_feature", "pop"):
        ref = jax.tree.map(np.asarray, ref_state.params[key])
        got = jax.tree.map(lambda x: np.asarray(x)[0], multi_state.params[key])
        flat_ref = jax.tree.leaves(ref)
        flat_got = jax.tree.leaves(got)
        for r, g in zip(flat_ref, flat_got):
            np.testing.assert_allclose(g, r, atol=2e-4, rtol=1e-3)


def test_train_dp_ragged_need_table(datasets, tmp_path):
    """--dp and --ragged compose: the need-table probe runs on replicated
    state, tile_caps ride the sharded feed (leading batch axis splits over
    the mesh), and the ragged blend partitions with the step."""
    import json

    import train as train_cli

    out = str(tmp_path / "dp_rg_out")
    train_cli.main(
        ["-s", join(datasets, "subjC"), "-m", out, *SMALL_ARGS,
         "--batch_size", "4", "--no_lpips", "--dp", "2",
         "--ragged", "1", "--ragged_chunk", "16", "--auto_cascade", "1",
         "--epochs", "2", "--save_epochs", "1", "--save_epoch", "1"]
    )
    assert os.path.exists(join(out, "net", "iteration_2"))
    with open(join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    events = {r["event"]: r["value"] for r in rows if "event" in r}
    assert "ragged_need_bank" in events, events
    losses = [r["total"] for r in rows if "total" in r]
    assert losses and np.isfinite(losses[-1])


def test_train_multi_ragged_need_tables(datasets, tmp_path):
    """Multi-subject + ragged + auto_cascade compose: per-subject need
    tables feed per-frame tile_caps through the stacked (S, B, T) feed, a
    SHARED chunk budget (worst subject) sizes the one compiled grid step,
    and save-boundary retunes keep working (drift telemetry + rebudget/
    footprint events land in every subject's metrics.jsonl)."""
    import json

    import train_multi as tm

    out = str(tmp_path / "multi_rg_out")
    sources = [join(datasets, n) for n in ("subjA", "subjB")]
    tm.main(["--sources", *sources, "-m", out, *SMALL_ARGS,
             "--batch_size", "2", "--dp", "2",
             "--ragged", "1", "--ragged_chunk", "16", "--auto_cascade", "1",
             "--epochs", "2", "--save_epochs", "0", "--save_epoch", "1"])
    for name in ("subjA", "subjB"):
        assert os.path.exists(join(out, name, "net", "iteration_2", "net.ckpt"))
        with open(join(out, name, "metrics.jsonl")) as f:
            rows = [json.loads(l) for l in f]
        events = [r["event"] for r in rows if "event" in r]
        assert "ragged_need_bank" in events, events
        assert "ragged_drift" in events, events
        losses = [r["total"] for r in rows if "total" in r]
        assert losses and np.isfinite(losses[-1])

    # a ragged-trained subject checkpoint evals like any other
    import eval as eval_cli

    eval_cli.main(["-m", join(out, "subjA")])
    results = open(join(out, "subjA", "test_free", "results.txt")).read()
    assert np.isfinite(float(results.split("psnr:")[1].split()[0]))
