"""Whole-campaign wall-clock accounting from a training run's metrics.jsonl.

The steady-state bench number (converged scene, pre-compiled step) flatters a
real 200-epoch campaign, which also pays warm-up-depth steps, save-boundary
retunes (probes + recompiles), and checkpoint/eval stalls. This script turns
a campaign's own step log into the honest machine-readable numbers:

  wall_it_per_sec        — (last_step - first_step) / (t_last - t_first):
                           everything included except the first compile
  whole_run_median_ms    — median per-step wall over all log intervals
  tail_median_ms         — median over the last quarter (the converged rate)
  whole_run_vs_tail_median — the campaign tax ratio (VERDICT round-4 #4:
                           target ~<=1.15 after sampled retunes)
  retunes / sampled_retunes / rebudgets — event counts from the log

Write it next to the campaign artifacts as wall.json; bench.py picks up the
newest committed docs/campaigns/*/wall.json and reports the fields on its
one JSON line.
"""

import argparse
import json
import os
import sys

import numpy as np


def campaign_wall(metrics_path: str) -> dict:
    rows = [json.loads(l) for l in open(metrics_path)]
    steps = [r for r in rows if "step" in r]
    if len(steps) < 3:
        raise SystemExit(f"not enough step rows in {metrics_path}")
    # drop the first interval: it straddles the initial compile
    s = np.array([r["step"] for r in steps], np.float64)
    t = np.array([r["t"] for r in steps], np.float64)
    d_it = np.diff(s)
    d_t = np.diff(t)
    keep = d_it > 0
    ms = (d_t[keep] / d_it[keep]) * 1e3
    ms = ms[1:]  # first logged interval includes compile
    q = max(len(ms) // 4, 1)
    whole = float(np.median(ms))
    tail = float(np.median(ms[-q:]))
    events = [r.get("event") for r in rows if "event" in r]
    return {
        "wall_it_per_sec": round(float((s[-1] - s[1]) / (t[-1] - t[1])), 3),
        "whole_run_median_ms": round(whole, 1),
        "tail_median_ms": round(tail, 1),
        "whole_run_vs_tail_median": round(whole / tail, 3),
        "mean_ms": round(float(ms.mean()), 1),
        "steps": int(s[-1]),
        "wall_s": round(float(t[-1] - t[1]), 1),
        "retunes": sum(1 for e in events if e == "ragged_drift"),
        "sampled_retunes": sum(1 for e in events if e == "retune_sampled"),
        "rebudgets": sum(1 for e in events if e == "ragged_rebudget"),
        "footprint_adapts": sum(1 for e in events if e == "footprint_adapt"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True,
                    help="training output dir holding metrics.jsonl")
    ap.add_argument("--out", default=None,
                    help="where to write wall.json (default: alongside "
                         "metrics.jsonl)")
    args = ap.parse_args()
    mp = join = os.path.join
    res = campaign_wall(mp(args.model_path, "metrics.jsonl"))
    out = args.out or join(args.model_path, "wall.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
