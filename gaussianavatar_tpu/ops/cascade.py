"""Auto-tuned capacity cascade: derive the rasterizer's tier table from the
scene's own per-tile load histogram.

The hand-swept default (128 everywhere + 768 extra on the 25% busiest
tiles, config.RasterParams) sits on the fidelity/throughput frontier for
the 512² avatar workload it was swept on; other resolutions and atypical
scenes deserve their own frontier point without a manual sweep. Capacities
are STATIC shapes under jit, so tuning happens outside the compiled
render: run one binning pass on a probe batch, pull `full_counts`
(BinContext) to the host, and pick tiers here.

Cost model (validated by the round-2 sweep, BASELINE.md): a tier covering
fraction f of G tiles at capacity K costs ~ f·G·K in gather bandwidth +
blend DMA, while fidelity tracks the fraction of gaussian-tile pairs
actually blended (rank-based coverage). The tuner picks the cheapest
nested cascade reaching a target coverage:

  - base capacity at the `base_quantile` of per-tile counts: most tiles
    blend everything they own;
  - a heavy tier sized to the residual of the busiest tiles;
  - a third tier only if the top tiles still truncate more than the
    coverage target allows.

No reference analog (the CUDA rasterizer is uncapped; truncation and its
tuning are TPU-design artifacts — static shapes in exchange for the MXU).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

_CHUNK = 8  # tier capacities must be multiples of the Pallas unroll


def _up8(x: float) -> int:
    return max(_CHUNK, int(math.ceil(x / _CHUNK)) * _CHUNK)


def _quantize_cap(x: float, max_capacity: int) -> int:
    """Capacities snap to multiples of 8 (the Pallas unroll) below 128 and
    multiples of 128 above — coarse steps keep the tuned tiers (and hence
    the compiled program shapes) stable across periodic retunes."""
    k = _up8(min(x, max_capacity))
    if k > 128:
        k = min(int(math.ceil(k / 128)) * 128, max_capacity // 8 * 8)
    return k


def _build_cascade(c, K0, target, max_capacity, max_tiers, s_quant):
    """Greedy nested completion on top of base capacity K0. `c` is the
    per-tile histogram in the runtime's tier-assignment order (top_k by
    binned count, nested prefixes) — descending when the histogram itself
    is the ranking signal, possibly non-monotone when tuning needed depths
    ordered by counts (tune_tiers order_by). Either way tiers apply to
    prefixes of `c`, exactly as the rasterizer hands capacity out."""
    G = c.size
    tiers = [(K0, 1.0)]
    cap = np.full(G, K0, np.int64)
    covered = int(np.minimum(c, cap).sum())
    S_prev = G
    while len(tiers) < max_tiers and covered < target:
        resid = c - cap
        nz = np.nonzero(resid > 0)[0]
        if nz.size == 0:
            break
        S = int(nz[-1]) + 1  # prefix length covering every still-short tile
        S = min(max(_CHUNK, int(math.ceil(S / s_quant)) * s_quant), S_prev, G)
        resid_S = np.maximum(resid[:S], 0)
        missing = target - covered
        # smallest quantized K whose prefix gain reaches the target (the
        # quantized grid is tiny: 8..128 by 8, then 256..cap by 128)
        kmax = _quantize_cap(float(resid_S.max()), max_capacity)
        K = kmax
        grid = list(range(_CHUNK, min(128, kmax) + 1, _CHUNK))
        grid += list(range(256, kmax + 1, 128))
        for k in grid:
            if int(np.minimum(resid_S, k).sum()) >= missing:
                K = k
                break
        gain = int(np.minimum(resid_S, K).sum())
        if gain <= 0:
            break
        tiers.append((K, S / G))
        cap[:S] += K
        covered += gain
        S_prev = S
    return tuple(tiers), covered


def tune_tiers(
    full_counts,
    base_quantile: float | None = None,
    coverage: float = 0.999,
    max_capacity: int = 4096,
    max_tiers: int = 4,
    margin: float = 1.0,
    order_by=None,
) -> Tuple[Tuple[int, float], ...]:
    """Pick a nested capacity cascade ((K0, 1.0), (K1, f1), ...) from a
    per-tile depth histogram (any shape; flattened) — either true gaussian
    counts or, better, the NEEDED depths from a saturation probe
    (rasterize_tile.probe_tile_depths).

    `coverage` is the target fraction of gaussian-tile pairs blended.
    `base_quantile=None` (default) searches several candidate base
    capacities and returns the cheapest cascade (by cascade_cost) reaching
    the target — important for bimodal scenes (body avatars: ~half the
    tiles empty, the rest thousands deep) where any fixed base quantile is
    far off the frontier. Pass an explicit quantile to pin the base tier.
    `margin` scales the histogram up front (headroom for scene drift
    between periodic retunes). Truncation is never silent either way: the
    render reports overflow.

    `order_by` (same shape as `full_counts`): the runtime assigns heavy
    tiers to prefixes of the tiles ranked by BINNED count
    (rasterize_tile top_k(full_counts)) — the only per-step signal that
    exists before blending — NOT by the tuner's histogram. When tuning on
    saturation-probe NEEDED depths, pass the probe's true counts here so
    the prefix optimization runs over the needed-depth curve in the order
    capacity will actually be handed out: need <= count, so an opaque tile
    (huge count, tiny need) outranks a semi-transparent one (mid count,
    need == count) and would otherwise silently steal its deep tier.
    """
    counts = np.asarray(full_counts).reshape(-1).astype(np.int64)
    G = counts.size
    total = int(counts.sum())
    if G == 0 or total == 0:
        return ((_CHUNK, 1.0),)
    if margin != 1.0:
        counts = np.ceil(counts * margin).astype(np.int64)
        total = int(counts.sum())

    if order_by is not None:
        rank = np.asarray(order_by).reshape(-1)
        if rank.size != G:
            raise ValueError(f"order_by size {rank.size} != histogram {G}")
        # stable argsort of -rank == top_k order incl. index tie-breaks
        c = counts[np.argsort(-rank, kind="stable")]
    else:
        c = np.sort(counts)[::-1]
    target = int(math.ceil(coverage * total))
    s_quant = max(_CHUNK, G // 16)  # fraction steps of ~1/16 (program reuse)

    if base_quantile is not None:
        cands = [float(np.quantile(counts, base_quantile))]
    else:
        cands = [float(_CHUNK)] + [
            float(np.quantile(counts, q)) for q in (0.5, 0.75, 0.9)
        ]
    best = None
    for k0 in {_quantize_cap(k, max_capacity) for k in cands}:
        tiers, covered = _build_cascade(c, k0, target, max_capacity,
                                        max_tiers, s_quant)
        feasible = covered >= target
        key = (not feasible, cascade_cost(tiers) if feasible else -covered,
               len(tiers))
        if best is None or key < best[0]:
            best = (key, tiers)
    return best[1]


def cascade_cost(tiers: Sequence[Tuple[int, float]]) -> float:
    """Relative gather+blend cost of a cascade: sum of capacity x tile
    fraction (the adopted 128+768@.25 scores 320)."""
    return float(sum(k * f for k, f in tiers))
