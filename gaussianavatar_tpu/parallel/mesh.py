"""Device-mesh scale-out (NEW capability — the reference is strictly
single-process single-GPU, SURVEY.md §2.4).

Strategy: the avatar networks are small (a few M params) while the work per
frame (decoder points x rasterized pixels) is large, so the natural axes are
  - `dp`: data parallelism over frames of one subject — batch sharded,
    params/assets replicated, XLA inserts the gradient psum over ICI,
  - `subject`: independent avatars trained side by side (one per mesh slot,
    BASELINE config #5) — handled by stacking states and sharding the
    stacked axis (see parallel/multi_subject.py).

Everything rides `jax.jit` + `NamedSharding`: annotate inputs, let the
partitioner place collectives on ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Shard every array leaf along its leading (batch) dimension."""
    sh = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sh) if isinstance(x, jax.Array) else x

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/state/assets) across the mesh. Static
    (non-array) leaves — python ints, numpy tables, strings — pass through."""
    sh = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(x, sh) if isinstance(x, jax.Array) else x

    return jax.tree.map(put, tree)
