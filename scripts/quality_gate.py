"""Synthetic quality gate: the convergence acceptance test for this repo.

Runs the full user journey on the hermetic synthetic dataset (the stand-in
for People Snapshot, which needs registration + licensed SMPL files) and
asserts regression gates:

  1. stage-1 train to convergence -> eval: held-out PSNR >= gate (defaults
     sized to the measured campaigns minus their noise: 41/41.5 single/tail
     at 512-query vs measured 43.2/42.98, 30/30 at the 256 fast gate vs
     measured ~31.9 — loose-universal-floor gates could not catch even a
     10 dB regression; BASELINE.md round-4)
  2. (--stage2) export poses -> per-frame posmaps -> stage-2 train -> eval:
     PSNR within 1.0 dB of stage 1 at the canonical workload (measured
     0.11 dB below), 1.5 dB at the 256 fast gate
  3. (--pose_opt) frozen-net pose recovery: perturb the converged model's
     pose embeddings, run SparseAdam-only photometric refinement, require
     most of the photometric damage recovered without pose drift
     (reference eval.py:74-85 is the analogous acceptance test; the
     pose-refinement mechanism is avatar_model.py:100-113,262-270)

Writes a JSON summary (psnr curve per checkpoint, gates, pass/fail) to
<work>/quality_summary.json and exits nonzero on gate failure.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
from os.path import dirname, join

import numpy as np

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sh(argv):
    print("+", " ".join(argv), flush=True)
    r = subprocess.run([sys.executable] + argv, cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"step failed: {argv}")


def read_psnr(model_path):
    txt = open(join(model_path, "test_free", "results.txt")).read()
    return (
        float(txt.split("psnr:")[1].split()[0]),
        float(txt.split("ssim:")[1].split()[0]),
    )


def average_checkpoints(model_path, epochs, out_epoch):
    """Write the parameter/batch-stat mean of several checkpoints as a new
    iteration_{out_epoch} checkpoint (SWA endpoint). Optimizer state and the
    iteration counter are taken from the newest checkpoint (they are not
    averaged quantities)."""
    import jax
    import numpy as np
    from flax import serialization

    from gaussianavatar_tpu.engine import checkpoint as ckpt

    raws = []
    for e in epochs:
        with open(join(ckpt.ckpt_dir(model_path, e), ckpt.CKPT_NAME), "rb") as f:
            raws.append(serialization.msgpack_restore(f.read()))
    avg = raws[-1]
    n = float(len(raws))
    for key in ("params", "batch_stats"):
        if key in avg and avg[key]:
            avg[key] = jax.tree.map(
                lambda *xs: (sum(np.asarray(x, np.float64) for x in xs) / n).astype(
                    np.asarray(xs[-1]).dtype
                ),
                *[r[key] for r in raws],
            )
    d = ckpt.ckpt_dir(model_path, out_epoch)
    os.makedirs(d, exist_ok=True)
    with open(join(d, ckpt.CKPT_NAME), "wb") as f:
        f.write(serialization.msgpack_serialize(avg))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/quality_gate")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--query", type=int, default=256)
    ap.add_argument("--inp", type=int, default=64,
                    help="inp_posmap_size; the canonical workload is "
                         "--query 512 --inp 128 (config.py defaults), the "
                         "fast gate 256/64")
    ap.add_argument("--n_train", type=int, default=48)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--gate_psnr", type=float, default=None,
                    help="single-endpoint gate; default is workload-sized "
                         "to the measured results minus the measured noise "
                         "(512-query: 41 vs measured 43.2 +/- ~1 dB chaos; "
                         "256-query: 30 vs measured 31.9-32.5) so a 2 dB "
                         "regression FAILS instead of hiding under a loose "
                         "universal floor")
    ap.add_argument("--gate_avg_psnr", type=float, default=None,
                    help="gate for the MEAN eval PSNR over the last-K saved "
                         "checkpoints — tighter than the single-save gate "
                         "because averaging K evals shrinks the ±1 dB "
                         "endpoint chaos ~sqrt(K). Default 41.5 at 512-query "
                         "(measured tail-mean 42.98, spread 0.51 dB) / 30 at "
                         "256 (measured ~31)")
    ap.add_argument("--stage2", action="store_true")
    ap.add_argument("--pose_opt", action="store_true")
    ap.add_argument("--pose_lr", type=float, default=2e-2,
                    help="probe embed LR — must put the frozen-net refinement "
                         "in its convergent regime at the campaign's "
                         "resolution (2e-2 converges at the 256 fast gate; "
                         "the sharper 512 landscape needs a gentler step)")
    ap.add_argument("--pose_epochs", type=int, default=40)
    ap.add_argument("--pose_noise", type=float, default=0.3)
    ap.add_argument("--train_flag", action="append", default=[],
                    help="extra train.py flag, repeatable, 'name=value' or "
                         "bare 'name' — e.g. --train_flag sort_stable=0 for "
                         "the unstable-binning-sort quality experiment")
    args = ap.parse_args()
    # workload-sized default gates (see the flag help; BASELINE.md round-4
    # records the measurements they are derived from)
    canonical = args.query >= 512
    if args.gate_psnr is None:
        args.gate_psnr = 41.0 if canonical else 30.0
    if args.gate_avg_psnr is None:
        args.gate_avg_psnr = 41.5 if canonical else 30.0

    work = args.work
    data = join(work, "data")
    out1 = join(work, "stage1")
    summary = {"gates": {}, "curve": []}

    os.makedirs(work, exist_ok=True)
    if not os.path.exists(join(data, "train", "smpl_parms.pth")):
        from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

        write_synthetic_dataset(
            data, n_train=args.n_train, n_test=args.n_test,
            image_size=args.image_size,
            body_kwargs={"n_rings": 48, "n_cols": 32},
        )

    # no --no_lpips: train.py auto-activates the 0.2*LPIPS term when weights
    # exist under assets/lpips (reference train.py:26,89-91); on this box no
    # weights are available, so runs here train without it — but a
    # weights-equipped environment immediately produces the reference-
    # objective campaign with zero code changes
    common = [
        "-s", data, "--dataset_type", "synthetic",
        "--query_posmap_size", str(args.query),
        "--inp_posmap_size", str(args.inp),
        "--batch_size", "2",
    ]
    for flag in args.train_flag:
        name, _, value = flag.partition("=")
        common.append("--" + name.lstrip("-"))
        if value:
            common.append(value)
    # save every eighth so the trajectory tail leaves >= 3 closely-spaced
    # checkpoints for the averaged endpoint below; the curve only EVALUATES
    # the quarter points (evals cost minutes each)
    save_every = max(args.epochs // 8, 1)

    def saved_epochs(model_path):
        net_dir = join(model_path, "net")
        if not os.path.isdir(net_dir):
            return []
        # only TRAINING saves (save_epoch multiples + the guaranteed final
        # save) — the SWA averaged checkpoint is stored as iteration_{N+1}
        # and must not re-enter the epoch list on a resumed run
        found = sorted(
            int(d.split("_")[1]) for d in os.listdir(net_dir)
            if d.startswith("iteration_")
        )
        return [e for e in found if e % save_every == 0 or e == args.epochs]
    # resumable: a stage whose final checkpoint already exists is not re-run,
    # so an interrupted campaign (or adding --stage2/--pose_opt later) picks
    # up where it left off
    if args.epochs not in saved_epochs(out1):
        sh(["train.py", "-m", out1, *common, "--train_stage", "1",
            "--epochs", str(args.epochs), "--save_epoch", str(save_every),
            "--save_epochs", str(save_every - 1), "--log_iter", "1200"])

    epochs = saved_epochs(out1)
    curve_epochs = sorted({e for e in epochs if (e // save_every) % 2 == 0} | {epochs[-1]})
    # per-epoch eval cache: a rerun (resume, or adding --stage2/--pose_opt)
    # must not pay ~10 min of eval recompiles per curve point again
    curve_path = join(work, "curve.json")
    curve_cache = {}
    if os.path.exists(curve_path):
        curve_cache = {c["epoch"]: c for c in json.load(open(curve_path))}
    for e in curve_epochs:
        if e not in curve_cache:
            sh(["eval.py", "-m", out1, "--epoch", str(e)])
            p, s = read_psnr(out1)
            curve_cache[e] = {"epoch": e, "psnr": p, "ssim": s}
            with open(curve_path, "w") as f:
                json.dump([curve_cache[k] for k in sorted(curve_cache)], f)
        c = curve_cache[e]
        summary["curve"].append(c)
        print(f"[curve] epoch {e}: PSNR {c['psnr']:.2f} SSIM {c['ssim']:.4f}", flush=True)

    final_psnr, final_ssim = summary["curve"][-1]["psnr"], summary["curve"][-1]["ssim"]
    summary["gates"]["stage1_psnr"] = {
        "value": final_psnr, "gate": args.gate_psnr, "pass": final_psnr >= args.gate_psnr
    }

    # --- De-noised endpoint: METRIC mean over the last K saved checkpoints.
    # The single-checkpoint endpoint carries ~±1 dB trajectory chaos
    # (ulp-level gradient changes compound over 4800 steps); the mean of K
    # late evals estimates the typical endpoint with ~sqrt(K) less spread,
    # so its gate sits tighter than the single-save gate. This is the gated
    # number.
    K_AVG = 3
    tail = epochs[-min(K_AVG, len(epochs)):]
    for e in tail:
        if e not in curve_cache:
            sh(["eval.py", "-m", out1, "--epoch", str(e)])
            p, s = read_psnr(out1)
            curve_cache[e] = {"epoch": e, "psnr": p, "ssim": s}
            with open(curve_path, "w") as f:
                json.dump([curve_cache[k] for k in sorted(curve_cache)], f)
    tail_psnrs = [curve_cache[e]["psnr"] for e in tail]
    tail_mean = sum(tail_psnrs) / len(tail_psnrs)
    print(f"[tail] mean PSNR over {tail}: {tail_mean:.2f} "
          f"(spread {max(tail_psnrs) - min(tail_psnrs):.2f} dB)", flush=True)
    summary["gates"]["stage1_tail_mean_psnr"] = {
        "value": tail_mean, "epochs": tail, "psnrs": tail_psnrs,
        "gate": args.gate_avg_psnr,
        "pass": tail_mean >= args.gate_avg_psnr,
    }

    # --- Parameter-averaged (SWA-style) endpoint: recorded as a measured
    # experiment, NOT gated. Measured both ways: at the 256-query fast gate
    # the late saves share a basin and averaging helps; at the canonical
    # 512-query workload the mean of [150,175,200] evaluated 2.5 dB BELOW
    # the endpoint (24.65 vs 27.17) — late checkpoints live in different
    # basins there and parameter means fall between them.
    avg_epoch = epochs[-1] + 1  # stored as one more iteration_ dir
    avg_path = join(work, "avg_eval.json")
    if len(epochs) >= 2:
        if os.path.exists(avg_path):
            avg = json.load(open(avg_path))
        else:
            average_checkpoints(out1, tail, avg_epoch)
            sh(["eval.py", "-m", out1, "--epoch", str(avg_epoch)])
            p, s = read_psnr(out1)
            avg = {"epochs": tail, "psnr": p, "ssim": s}
            with open(avg_path, "w") as f:
                json.dump(avg, f)
        print(f"[swa] parameter mean of {avg['epochs']}: PSNR {avg['psnr']:.2f} "
              f"SSIM {avg['ssim']:.4f}", flush=True)
        summary["swa_experiment"] = avg
        final_psnr = max(final_psnr, avg["psnr"])

    if args.stage2:
        out2 = join(work, "stage2")
        ep2 = max(args.epochs // 2, 1)
        if not saved_epochs(out2):
            sh(["scripts/export_stage_1.py", "-m", out1, "-s", data])
            sh(["scripts/gen_pose_map_frames.py", "--source_path", data,
                "--synthetic", "--size", str(args.inp)])
            sh(["train.py", "-m", out2, *common, "--train_stage", "2",
                "--stage1_out_path", join(out1, "net", f"iteration_{epochs[-1]}"),
                "--epochs", str(ep2),
                "--save_epoch", str(save_every), "--save_epochs", "0",
                "--log_iter", "1200"])
        if not os.path.exists(join(out2, "test_free", "results.txt")):
            sh(["eval.py", "-m", out2])
        p2, s2 = read_psnr(out2)
        # margin by workload: at the canonical 512-query workload stage 2
        # measured 0.11 dB below stage 1 (43.12 vs 43.23, round 4) — a
        # 1.0 dB gate catches a real regression with ~0.9 dB of headroom.
        # The 256 fast gate keeps 1.5 dB: its half-length stage-2 measured
        # 0.93 dB below stage 1 (round 2) and its checkpoint curve swings
        # ~2 dB, so 1.0 dB would flake on noise there.
        margin = 1.0 if canonical else 1.5
        summary["gates"]["stage2_psnr"] = {
            "value": p2, "gate": final_psnr - margin, "pass": p2 >= final_psnr - margin
        }

    if args.pose_opt:
        # Frozen-net pose recovery — the IDENTIFIABLE form of the reference's
        # per-frame refinement (avatar_model.py:100-113,262-270). Under full
        # joint training the photometric loss has no pull toward the TRUE
        # poses (the decoder's offset field compensates a perturbed pose
        # equally well — measured: joint training drifted embeddings 0.031 ->
        # 0.130 mean-abs while the image loss kept falling), so the campaign
        # gates the MECHANISM instead: freeze the converged stage-1 net
        # (lr_net = lr_geomfeat = 0), perturb the pose embeddings hard, and
        # require the SparseAdam photometric refinement to (a) recover most
        # of the perturbation-induced loss excess (measured against the
        # frozen net's own floor at the true embeddings) and (b) recover the
        # true APPEARANCE: render-space PSNR(render(refined), render(true)).
        # Parameter-space distance is reported but deliberately NOT gated:
        # along photometrically-unobservable pose dims the gradient is ~0
        # and Adam normalizes it to full-lr steps, so those dims random-walk
        # at ~lr*sqrt(steps) RMS (measured at the 512 campaign: mean-abs err
        # 0.189 -> 0.213 while the renders converged) — exactly as the
        # reference's SparseAdam would.
        import jax
        import jax.numpy as jnp

        from gaussianavatar_tpu.config import Config
        from gaussianavatar_tpu.data.dataset import BatchLoader
        from gaussianavatar_tpu.engine import checkpoint as ckpt
        from gaussianavatar_tpu.engine.optim import build_optimizer
        from gaussianavatar_tpu.engine.setup import setup_avatar
        from gaussianavatar_tpu.engine.train_step import init_state, make_train_step
        from gaussianavatar_tpu.ops.rasterize import RasterizeConfig

        cfg = Config.load(join(out1, "cfg_args.json"))
        cfg.opt.lr_net = 0.0
        cfg.opt.lr_geomfeat = 0.0
        # default 4x the reference's 5e-3 embed LR: each frame is visited
        # once per epoch, and the probe budget is ~40 epochs, not 200
        cfg.opt.lr_pose = args.pose_lr
        bundle = setup_avatar(cfg, train=True)
        probe = bundle.train_dataset[0]
        H, W = int(probe["height"]), int(probe["width"])
        bs = cfg.model.batch_size

        class _TX0:
            def init(self, p):
                return None

        state = init_state(bundle.net, bundle.assets, _TX0(), batch_size=bs)
        tx = build_optimizer(
            state.params, cfg.opt,
            steps_per_epoch=len(bundle.train_dataset) // bs, train_stage=1,
        )
        state = state.replace(opt_state=tx.init(state.params))
        state = ckpt.load_checkpoint(out1, epochs[-1], state)

        from gaussianavatar_tpu.engine.loop import raster_config

        rcfg_train = raster_config(cfg, train=True)
        rcfg_render = raster_config(cfg, train=False)
        if getattr(cfg.raster, "auto_cascade", 0):
            # the campaign trained through saturation-tuned tiers; the probe
            # must refine through the same coverage or its gradients see a
            # different (starved) objective than training did
            from gaussianavatar_tpu.engine.inference import (
                PROBE_CAPACITY, make_counts_fn,
            )
            from gaussianavatar_tpu.ops.cascade import tune_tiers

            counts_fn = make_counts_fn(bundle, H, W, rcfg_train,
                                       probe_capacity=PROBE_CAPACITY)
            pb = next(iter(BatchLoader(bundle.train_dataset, bs,
                                       shuffle=False)))
            feed0 = {k: v for k, v in pb.items()
                     if k not in ("FovX", "FovY", "height", "width",
                                  "projection_matrix", "camera_center",
                                  "original_image")}
            if "inp_pos_map" in feed0 and feed0["inp_pos_map"].shape[1] == 3:
                feed0["inp_pos_map"] = feed0["inp_pos_map"].transpose(0, 2, 3, 1)
            cnts0, needed = counts_fn(state.params, state.batch_stats, feed0)
            tiers = tune_tiers(np.asarray(needed), margin=1.5,
                               max_capacity=PROBE_CAPACITY,
                               order_by=np.asarray(cnts0))
            rcfg_train = rcfg_train._replace(tiers=tiers)
            rcfg_render = rcfg_render._replace(tiers=tiers)
            print(f"[pose-opt] auto_cascade tiers: {tiers}", flush=True)

        step = make_train_step(
            bundle.net, bundle.body_model, bundle.assets, tx, cfg.opt,
            H, W, (1.0, 1.0, 1.0), rcfg_train, train_stage=1,
        )
        drop = {"FovX", "FovY", "height", "width", "projection_matrix", "camera_center"}
        one = jnp.float32(1.0)

        def run_epoch(st, seed):
            loader = BatchLoader(bundle.train_dataset, bs, shuffle=True, seed=seed)
            tot = 0.0
            n = 0
            for batch in loader:
                feed = {k: v for k, v in batch.items() if k not in drop}
                st, terms, _ = step(st, feed, one * 0.85, one, one * 0)
                tot += float(terms["total"])
                n += 1
            return st, tot * bs / len(bundle.train_dataset), n

        # loss floor of the frozen net at the TRUE embeddings: the recovery
        # prong gates the fraction of perturbation-induced EXCESS recovered,
        # which (unlike a fixed l1 < 0.6*l0 ratio) is comparable across
        # campaign resolutions with different converged-loss scales.
        # The fused step DONATES its input buffers — run the floor epoch on
        # a deep copy so the real state survives
        floor_state = jax.tree.map(
            lambda x: x.copy() if hasattr(x, "copy") else x, state)
        _, loss_floor, _ = run_epoch(floor_state, seed=10**6)
        del floor_state

        true_pose = np.asarray(state.params["pose_embedding"])
        rng = np.random.default_rng(0)
        noise = rng.normal(scale=args.pose_noise,
                           size=true_pose.shape).astype(np.float32)
        noise[:, :3] = 0  # keep global orientation
        # snapshot COPIES for the render-space comparison below — the fused
        # step donates its inputs, so anything sharing buffers with the
        # refined state would be deleted after the first step
        cp = lambda t: jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, t)
        true_params = cp(state.params)
        true_bs = cp(state.batch_stats)
        state = state.replace(
            params=dict(state.params, pose_embedding=jnp.asarray(true_pose + noise))
        )
        pert_params = cp(state.params)

        n_steps = 0
        epoch_losses = []
        for ep_i in range(args.pose_epochs):
            state, ep_loss, n = run_epoch(state, seed=ep_i)
            epoch_losses.append(ep_loss)
            n_steps += n
        refined = np.asarray(state.params["pose_embedding"])
        d_init = float(np.abs(noise).mean())
        d_ref = float(np.abs(refined - true_pose).mean())
        l0, l1 = epoch_losses[0], epoch_losses[-1]
        recovered = (l0 - l1) / max(l0 - loss_floor, 1e-9)

        # render-space recovery: does the refined model LOOK like the true
        # one again? Robust to the unobservable-dim random walk by
        # construction (dims that don't change the render don't change this)
        from gaussianavatar_tpu.engine.train_step import (
            make_cached_render_fn, precompute_canonical,
        )
        cache = precompute_canonical(
            bundle.net, bundle.assets, true_params, true_bs
        )  # net/geom frozen: cache identical for true/perturbed/refined
        render = make_cached_render_fn(
            bundle.net, bundle.body_model, bundle.assets,
            H, W, (1.0, 1.0, 1.0), rcfg_render,
        )
        from gaussianavatar_tpu.ops.ssim import psnr as _psnr

        ren_batches = list(BatchLoader(bundle.train_dataset, bs, shuffle=True,
                                       seed=7))[: max(8 // bs, 1)]
        pp, pr = [], []
        for batch in ren_batches:
            feed = {k: v for k, v in batch.items()
                    if k not in drop and k != "original_image"}
            img_t = render(cache, true_params, feed)
            pp.append(float(_psnr(render(cache, pert_params, feed), img_t).mean()))
            pr.append(float(_psnr(render(cache, state.params, feed), img_t).mean()))
        psnr_pert = sum(pp) / len(pp)
        psnr_ref = sum(pr) / len(pr)

        summary["gates"]["pose_recovery"] = {
            "init_err": d_init, "refined_err": d_ref, "steps": n_steps,
            "loss_floor": loss_floor,
            "loss_first_epoch": l0, "loss_last_epoch": l1,
            "recovered_fraction": recovered,
            "render_psnr_perturbed": psnr_pert, "render_psnr_refined": psnr_ref,
            "pass": (recovered >= 0.5)
            and (psnr_ref >= psnr_pert + 6.0 or psnr_ref >= 35.0),
        }
        print(f"[pose-opt] frozen-net: pose err {d_init:.4f} -> {d_ref:.4f} "
              f"(reported, not gated), loss {l0:.4f} -> {l1:.4f} "
              f"(floor {loss_floor:.4f}, recovered {recovered:.0%}), "
              f"render-vs-true PSNR {psnr_pert:.1f} -> {psnr_ref:.1f} dB "
              f"({n_steps} steps)", flush=True)

    summary["pass"] = all(g["pass"] for g in summary["gates"].values())
    with open(join(work, "quality_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    raise SystemExit(0 if summary["pass"] else 1)


if __name__ == "__main__":
    main()
