"""Multi-subject shared-budget fairness (VERDICT round-4 weak #6).

The grid step shares ONE static chunk budget across subjects
(engine/multi_loop.shared_chunk_budget). The worry: budget clipping drops
the deepest tiles' tails first (rasterize_ragged._budget_theta), so a
transparency-deep subject stacked with shallow ones could be systematically
truncated. These tests pin the fairness contract: the budget is MAX-sized
over subjects (worst subject's worst batch + 15% headroom), so at probe
time NO subject — however deep — is theta-clipped below its own caps; the
cost of heterogeneity is the shallow subjects' slab under-use (wasted
compute, not lost coverage). scripts/multi_budget_fairness.py measures the
same quantities on a real heterogeneous train_multi run.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianavatar_tpu.engine.multi_loop import shared_chunk_budget  # noqa: E402
from gaussianavatar_tpu.ops.rasterize_ragged import (  # noqa: E402
    budget_theta_host,
    chunk_slab,
)


def test_budget_theta_host_matches_device():
    """The numpy telemetry twin must equal the jitted bisection bit-for-bit
    (same largest-theta-that-fits semantics) across fuzzed caps/budgets."""
    import jax.numpy as jnp

    from gaussianavatar_tpu.ops.rasterize_ragged import _budget_theta

    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 200))
        caps = rng.integers(0, 500, size=n).astype(np.int32)
        CB = int(rng.choice([8, 16, 128]))
        total = int((-(-caps.astype(np.int64) // CB)).sum())
        # budgets below, at, and above the exact need
        for C in {max(total // 3, 1), total, total * 2 + 1}:
            dev = int(_budget_theta(jnp.asarray(caps), CB, C))
            host = budget_theta_host(caps, CB, C)
            assert dev == host, (n, CB, C, dev, host)


def _worst_batch_caps(bank: np.ndarray, CB: int, B: int) -> np.ndarray:
    """The batch the budget must survive: the B chunk-heaviest frames."""
    ch = (-(-bank.astype(np.int64) // CB)).sum(axis=1)
    worst = np.argsort(ch)[::-1][:B]
    return bank[worst].reshape(-1).astype(np.int64)


def test_deep_subject_never_clipped_by_shared_budget():
    """Extreme heterogeneity (10-20x depth skew): the shared budget must fit
    the deep subject's worst batch WITHOUT theta-clipping — every batch of
    every subject, since chunk totals are additive over frames and the worst
    batch bounds the rest."""
    B, T, CB = 2, 64, 16
    rng = np.random.default_rng(1)
    deep = rng.integers(100, 330, size=(8, T))      # saturation ~100-330
    shallow = rng.integers(0, 24, size=(6, T))      # saturation ~0-24
    budget = shared_chunk_budget([shallow, deep], CB, T, B)
    # chunk slab the runtime actually builds from that budget
    C_total = chunk_slab(B * T, budget, CB)

    for bank in (deep, shallow):
        caps = _worst_batch_caps(bank, CB, B)
        theta = budget_theta_host(caps, CB, C_total)
        assert theta >= int(caps.max()), (theta, caps.max())
        clipped = int(np.maximum(caps - theta, 0).sum())
        assert clipped == 0
        # spot-check random (non-worst) batches too
        for _ in range(5):
            idx = rng.choice(bank.shape[0], size=B, replace=False)
            caps_r = bank[idx].reshape(-1).astype(np.int64)
            th = budget_theta_host(caps_r, CB, C_total)
            assert th >= int(caps_r.max())

    # the documented cost: the shallow subject under-uses the slab
    used = lambda bank: float(
        (-(-_worst_batch_caps(bank, CB, B) // CB)).sum()) / C_total
    assert used(shallow) < 0.25 < used(deep), (used(shallow), used(deep))


def test_shared_budget_is_max_not_mean():
    """Regression shape: pooling by MEAN would clip the deep subject. Pin
    that the budget covers the deep subject alone (max semantics), i.e. it
    is at least the budget the deep subject would get trained solo."""
    B, T, CB = 2, 64, 16
    rng = np.random.default_rng(2)
    deep = rng.integers(200, 400, size=(4, T))
    shallow = np.zeros((4, T), np.int64)
    solo = shared_chunk_budget([deep], CB, T, B)
    joint = shared_chunk_budget([shallow, deep], CB, T, B)
    assert joint >= solo
