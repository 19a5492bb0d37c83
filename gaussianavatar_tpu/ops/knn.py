"""K-nearest-neighbor search + the as-isometric-as-possible (AIAP) loss.

The reference lists `simple-knn` (CUDA) as a dependency but never imports it;
its only consumer, the AIAP regularizer, is commented out
(/root/reference/utils/loss_utils.py:56-109, README.md:37). Here both become
working features:

  - `grid_knn`: static-shape JAX grid-hash KNN (sort points by voxel hash,
    probe the 27 neighbor cells with searchsorted, top-k over a fixed
    candidate budget) — jit/vmap-safe, runs on TPU.
  - `host_knn`: exact scipy cKDTree fallback for offline/one-shot queries
    (e.g. fixed canonical neighbor graphs).
  - `aiap_loss`: L1 discrepancy between canonical and deformed pairwise
    neighbor distances (enable with --use_aiap / lambda_aiap).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

def grid_knn(
    points: jax.Array,
    k: int,
    cell_size: float,
    max_per_cell: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Exact KNN when true neighbors are within one cell of the query and
    cells hold <= max_per_cell points (pick cell_size >= the expected k-NN
    radius). Cell keys are injective over the data's bounding grid (exact,
    no hash collisions), which requires extent/cell_size <~ 1290 per axis
    to fit int32.

    Returns (idx (N, k) int32, dists (N, k)) sorted ascending; self excluded.
    """
    N = points.shape[0]
    cells = jnp.floor(points / cell_size).astype(jnp.int32)
    cmin = jnp.min(cells, axis=0)
    rel = cells - cmin
    dims = jnp.max(rel, axis=0) + 1

    def cell_key(rc):
        ok = jnp.all((rc >= 0) & (rc < dims), axis=-1)
        key = (rc[..., 0] * dims[1] + rc[..., 1]) * dims[2] + rc[..., 2]
        return jnp.where(ok, key, jnp.int32(-1))

    keys = cell_key(rel)
    order = jnp.argsort(keys)
    sorted_keys = keys[order]

    offsets = jnp.asarray(
        [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        jnp.int32,
    )  # (27, 3)
    probe_keys = cell_key(rel[:, None, :] + offsets[None, :, :])  # (N, 27)

    starts = jnp.searchsorted(sorted_keys, probe_keys)  # (N, 27)
    slot = jnp.arange(max_per_cell, dtype=jnp.int32)
    cand_pos = starts[..., None] + slot  # (N, 27, C)
    cand_pos_c = jnp.clip(cand_pos, 0, N - 1)
    cand_ok = (cand_pos < N) & (sorted_keys[cand_pos_c] == probe_keys[..., None])
    cand_idx = order[cand_pos_c].reshape(N, -1)  # (N, 27*C)
    cand_ok = cand_ok.reshape(N, -1)

    diff = points[:, None, :] - points[cand_idx]
    d2 = jnp.sum(diff * diff, axis=-1)
    self_mask = cand_idx == jnp.arange(N, dtype=jnp.int32)[:, None]
    d2 = jnp.where(cand_ok & (~self_mask), d2, jnp.inf)

    neg, top_idx = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cand_idx, top_idx, axis=1)
    return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0.0))


def host_knn(points: np.ndarray, k: int) -> np.ndarray:
    """Exact KNN on the host (scipy cKDTree). Returns (N, k) neighbor indices,
    self excluded."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    _, idx = tree.query(points, k=k + 1)
    return idx[:, 1:].astype(np.int32)


def aiap_loss(
    x_canonical: jax.Array,   # (..., N, 3)
    x_deformed: jax.Array,    # (..., N, 3)
    nn_idx: jax.Array,        # (N, k) neighbor indices (typically canonical)
) -> jax.Array:
    """Mean L1 between canonical and deformed neighbor distances
    (the as-isometric-as-possible prior, loss_utils.py:56-109 intent)."""
    def dists(x):
        nb = x[..., nn_idx, :]                       # (..., N, k, 3)
        d = x[..., :, None, :] - nb
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    return jnp.abs(dists(x_canonical) - dists(x_deformed)).mean()
