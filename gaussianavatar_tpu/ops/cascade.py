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


def tune_tiers(
    full_counts,
    base_quantile: float = 0.75,
    coverage: float = 0.999,
    max_capacity: int = 1024,
    max_tiers: int = 3,
) -> Tuple[Tuple[int, float], ...]:
    """Pick a nested capacity cascade ((K0, 1.0), (K1, f1)[, (K2, f2)]) from
    per-tile true gaussian counts (any shape; flattened).

    `coverage` is the target fraction of gaussian-tile pairs blended;
    tiers stop early once reached (or when `max_tiers`/`max_capacity` cap
    out — truncation is still never silent: the render reports overflow).
    """
    counts = np.asarray(full_counts).reshape(-1).astype(np.int64)
    G = counts.size
    total = int(counts.sum())
    if G == 0 or total == 0:
        return ((_CHUNK, 1.0),)

    # base tier: the base_quantile tile blends everything it owns
    K0 = _up8(min(float(np.quantile(counts, base_quantile)), max_capacity))
    tiers = [(K0, 1.0)]
    covered = int(np.minimum(counts, K0).sum())
    residual = counts - K0

    while len(tiers) < max_tiers and covered < coverage * total:
        heavy = residual > 0
        n_heavy = int(heavy.sum())
        if n_heavy == 0:
            break
        frac = n_heavy / G
        # fraction must nest inside the previous tier and stay meaningful:
        # the Pallas grid floor is _CHUNK tiles
        frac = min(frac, tiers[-1][1])
        frac = max(frac, _CHUNK / G)
        res_heavy = residual[heavy]
        # capacity at the residual needed to hit the coverage target within
        # this tier: the q-quantile of heavy residuals where q solves for
        # the remaining uncovered mass
        missing = coverage * total - covered
        q = min(1.0, missing / max(int(res_heavy.sum()), 1))
        cap = float(np.quantile(res_heavy, min(0.99, max(q, 0.5))))
        K = _up8(min(cap, max_capacity))
        tiers.append((K, frac))
        # apply: the frac·G busiest tiles get K more ranks
        S = max(int(round(frac * G)), 1)
        top = np.argpartition(residual, -S)[-S:]
        gain = np.minimum(residual[top], K)
        covered += int(gain.sum())
        residual = residual.copy()
        residual[top] -= gain
        if K >= max_capacity:
            break

    return tuple(tiers)


def cascade_cost(tiers: Sequence[Tuple[int, float]]) -> float:
    """Relative gather+blend cost of a cascade: sum of capacity x tile
    fraction (the adopted 128+768@.25 scores 320)."""
    return float(sum(k * f for k, f in tiers))
