"""Measure multi-subject shared-budget fairness on a REAL heterogeneous run.

Builds two synthetic subjects with deliberately different scenes (sparse vs
dense body, different pose seeds), trains them side by side with
`train_multi` on the ragged need-table path, and reports the per-subject
`budget_fairness` telemetry the retunes log (engine/multi_loop.log_fairness):
worst-batch max caps, the theta the shared slab would clip at, clipped rows,
and slab utilization — plus each subject's final step raster_overflow.

Expected (the shared_chunk_budget fairness contract, unit-tested in
tests/test_multi_budget_fairness.py): clipped_rows == 0 for every subject at
every retune — the budget is MAX-sized over subjects, so depth heterogeneity
costs the shallow subject slab under-use (compute), never coverage.

Runs anywhere: --cpu forces the CPU backend with a virtual 2-device mesh
(subject axis), which is bit-faithful for this bookkeeping (the telemetry is
host-side; only step speed differs).
"""

import argparse
import json
import os
import sys
from os.path import dirname, join

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/multi_fairness")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--query", type=int, default=128)
    ap.add_argument("--inp", type=int, default=32)
    ap.add_argument("--n_train", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend + a virtual 2-device mesh")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=2").strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    work = args.work
    subjects = {
        # sparse body, gentle motion -> shallow tiles
        "sparse": dict(seed=0, body_kwargs={"n_rings": 16, "n_cols": 12}),
        # dense body (3x the gaussians in the same silhouette), different
        # pose phase -> deeper per-tile overlap
        "dense": dict(seed=7, body_kwargs={"n_rings": 48, "n_cols": 32}),
    }
    sources = []
    for name, kw in subjects.items():
        d = join(work, "data_" + name)
        if not os.path.exists(join(d, "train", "smpl_parms.pth")):
            write_synthetic_dataset(d, n_train=args.n_train, n_test=2,
                                    image_size=args.image_size, **kw)
        sources.append(d)

    out = join(work, "out")
    import train_multi as tm

    tm.main([
        "--sources", *sources, "-m", out,
        "--dataset_type", "synthetic",
        "--query_posmap_size", str(args.query),
        "--inp_posmap_size", str(args.inp),
        "--c_geom", "16", "--c_pose", "16", "--hsize", "64", "--nf", "8",
        "--batch_size", "2", "--tile_size", "16",
        "--ragged", "1", "--auto_cascade", "1", "--ragged_chunk", "16",
        "--epochs", str(args.epochs), "--save_epoch", "1",
        "--save_epochs", "0",
    ])

    print("\n=== budget fairness table (per subject, per retune) ===")
    table = {}
    for name in ("data_sparse", "data_dense"):
        rows = [json.loads(l) for l in open(join(out, name, "metrics.jsonl"))]
        fair = [r["value"] for r in rows if r.get("event") == "budget_fairness"]
        over = [r["raster_overflow"] for r in rows if "raster_overflow" in r]
        budget = [r["value"] for r in rows
                  if r.get("event") == "ragged_need_bank"]
        table[name] = {"fairness": fair, "final_overflow": over[-1] if over else None}
        print(f"\nsubject {name} (shared {budget[-1] if budget else '?'}):")
        for f in fair:
            print("  " + f)
        print(f"  final-step raster_overflow: {table[name]['final_overflow']}")

    clipped = [
        int(f.split("clipped_rows ")[1].split()[0])
        for name in table for f in table[name]["fairness"]
    ]
    verdict = "ALL-CLEAR" if all(c == 0 for c in clipped) else "CLIPPING SEEN"
    print(f"\nverdict: {verdict} (clipped_rows across "
          f"{len(clipped)} subject-retunes: {clipped})")
    with open(join(work, "fairness_summary.json"), "w") as f:
        json.dump({"table": table, "clipped_rows": clipped,
                   "verdict": verdict}, f, indent=2)


if __name__ == "__main__":
    main()
