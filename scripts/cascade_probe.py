"""Measure the per-tile load histogram of a trained (or fresh) model and
report what the auto-tuner (ops/cascade.tune_tiers) would pick, plus the
residual truncation of candidate cascades.

Diagnostic for choosing the TRAIN-side capacity cascade at non-default
workloads: the hand-swept default (128 + 768 @ .25, RasterParams) was tuned
at 256-query; at 512-query (4x the gaussians) it drops ~20%% of
gaussian-tile pairs every step (measured /tmp/qg512, ~1.0-1.9M of ~4.7M),
which is the prime suspect for the 4-5 dB PSNR deficit vs the 256 campaign.

Usage:
  python scripts/cascade_probe.py -m /tmp/qg512/stage1 [--epoch 200] [--init]
"""

import argparse
import json
import sys
from os.path import dirname, join

import numpy as np

REPO = dirname(dirname(__file__))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--epoch", type=int, default=0, help="0 = latest")
    ap.add_argument("--init", action="store_true",
                    help="probe the FRESH init state instead of a checkpoint "
                         "(what a tune-at-train-start sees)")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--coverage", type=float, default=0.999)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the histogram is "
                         "platform-independent; works when the TPU tunnel "
                         "is down)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gaussianavatar_tpu.config import Config
    from gaussianavatar_tpu.data.dataset import BatchLoader
    from gaussianavatar_tpu.engine import checkpoint as ckpt
    from gaussianavatar_tpu.engine.loop import raster_config
    from gaussianavatar_tpu.engine.setup import setup_avatar
    from gaussianavatar_tpu.engine.train_step import _forward_gaussians, init_state
    from gaussianavatar_tpu.ops.cascade import tune_tiers
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize_tile import _bin_gaussians

    from gaussianavatar_tpu.engine.inference import PROBE_CAPACITY, make_counts_fn

    cfg = Config.load(join(args.model_path, "cfg_args.json"))
    bundle = setup_avatar(cfg, train=True)
    rcfg = raster_config(cfg, train=True)

    class _TX0:
        def init(self, p):
            return None

    state = init_state(bundle.net, bundle.assets, _TX0(),
                       batch_size=cfg.model.batch_size)
    if not args.init:
        epoch = args.epoch or max(
            int(d.split("_")[1])
            for d in __import__("os").listdir(join(args.model_path, "net"))
            if d.startswith("iteration_"))
        state = ckpt.load_checkpoint(args.model_path, epoch, state)
        print(f"probing checkpoint epoch {epoch}")
    else:
        print("probing FRESH init state")

    item0 = bundle.train_dataset[0]
    H, W = int(item0["height"]), int(item0["width"])
    drop = {"FovX", "FovY", "height", "width", "projection_matrix",
            "camera_center", "original_image"}

    counts_fn = make_counts_fn(bundle, H, W, rcfg,
                               probe_capacity=PROBE_CAPACITY)

    loader = BatchLoader(bundle.train_dataset, cfg.model.batch_size,
                         shuffle=True, seed=0)
    all_counts, all_needed = [], []
    for i, batch in enumerate(loader):
        if i >= args.batches:
            break
        feed = {k: v for k, v in batch.items() if k not in drop}
        fc, nd = counts_fn(state.params, state.batch_stats, feed)
        all_counts.append(np.asarray(fc))
        all_needed.append(np.asarray(nd))
    counts = np.concatenate([c.reshape(-1) for c in all_counts])
    needed = np.concatenate([n.reshape(-1) for n in all_needed])
    total = counts.sum()
    print(f"\ntiles per image: {all_counts[0].size // cfg.model.batch_size}, "
          f"probe tiles: {counts.size}, total pairs/img: "
          f"{total / (args.batches * cfg.model.batch_size):.0f}")
    qs = [0.5, 0.75, 0.9, 0.95, 0.99, 1.0]
    print("per-tile load quantiles:",
          {q: int(np.quantile(counts, q)) for q in qs})
    print("per-tile NEEDED depth (saturation) quantiles:",
          {q: int(np.quantile(needed, q)) for q in qs})
    print(f"needed/true pair ratio: {needed.sum() / max(counts.sum(), 1):.3f}"
          f"  (tiles at probe cap: {(needed >= 4096).mean():.2%})")

    def residual(tiers):
        """fraction of pairs a nested cascade drops (rank-based coverage)."""
        c = np.sort(counts)[::-1].astype(np.int64)
        G = c.size
        cap = np.zeros(G, np.int64)
        for K, f in tiers:
            n = max(1, int(round(f * G)))
            cap[:n] += K
        # busiest tiles get the deep tiers (the binning ranks by true load)
        dropped = np.maximum(c - cap, 0).sum()
        return dropped / max(total, 1)

    current = ((rcfg.tile_capacity, 1.0),
               (rcfg.tile_capacity_hi, rcfg.heavy_fraction))
    cur_cost = rcfg.tile_capacity + rcfg.tile_capacity_hi * rcfg.heavy_fraction
    print(f"\ncurrent train cascade {current} (cost {cur_cost:.0f}): "
          f"drops {residual(current):.1%} of true pairs")
    for cov in (0.99, args.coverage):
        tiers = tune_tiers(counts, coverage=cov, max_capacity=4096)
        cost = sum(K * f for K, f in tiers)
        print(f"count-tuned @ cov {cov}: {tiers}  (cost {cost:.0f}, "
              f"drops {residual(tiers):.2%} of true pairs)")
    for margin in (1.25, 1.5):
        tiers = tune_tiers(needed, margin=margin, max_capacity=4096)
        cost = sum(K * f for K, f in tiers)
        # residual vs the NEEDED histogram: what fraction of
        # actually-contributing pairs the cascade would cut
        tot_n = needed.sum()
        cn = np.sort(needed)[::-1].astype(np.int64)
        cap = np.zeros(cn.size, np.int64)
        for K, f in tiers:
            cap[: max(1, int(round(f * cn.size)))] += K
        drop_n = np.maximum(cn - cap, 0).sum() / max(tot_n, 1)
        print(f"saturation-tuned (margin {margin}): {tiers}  (cost {cost:.0f}, "
              f"cuts {drop_n:.3%} of CONTRIBUTING pairs)")
    # ragged slot-stream comparison (--ragged 1 --auto_cascade 1): per-tile
    # caps = need*margin as DATA — no tiers, no order premium, empty tiles
    # free; chunk quantization is the only overhead
    capped_need = np.minimum(np.ceil(needed * 1.5), 4096)
    for CB in (64, 128, 256):
        rows = np.ceil(capped_need / CB) * CB
        print(f"ragged need-table CB={CB}: mean rows/tile {rows.mean():.0f} "
              f"(100% of contributing pairs; "
              f"{rows.mean() / max(capped_need.mean(), 1):.2f}x over un-chunked need)")
    print(json.dumps({"quantiles": {str(q): int(np.quantile(counts, q)) for q in qs},
                      "total_pairs_per_img":
                      float(total / (args.batches * cfg.model.batch_size))}))


if __name__ == "__main__":
    main()
