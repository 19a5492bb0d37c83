"""Composed 2-D scale-out: subjects x frame-data-parallel on one mesh.

NEW capability beyond the reference (strictly single-GPU, SURVEY.md §2.4) —
combines the two 1-D strategies from this package on a `(subject, dp)`
device grid:

  - axis `subject` (parallel/multi_subject.py): independent avatars, states
    and assets stacked and sharded — zero cross-device traffic,
  - axis `dp` (parallel/mesh.py): within each subject, the frame batch is
    sharded; each subject's gradient is psum-reduced over its own `dp` row
    by the XLA partitioner, riding ICI.

So an (S, D) mesh trains S avatars, each at D-way data parallelism, with
ONE jitted step. States/assets are sharded `P('subject')` (replicated along
`dp`); batches `P('subject', 'dp')` over their (S, B_global, ...) leading
axes. No hand-written collectives: annotate shardings, let XLA place the
reductions (the scaling-book recipe).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussianavatar_tpu.engine.train_step import make_train_step
from gaussianavatar_tpu.models.avatar import AvatarAssets
from gaussianavatar_tpu.parallel.mesh import DATA_AXIS
from gaussianavatar_tpu.parallel.multi_subject import SUBJECT_AXIS


def make_grid_mesh(n_subjects: int, n_dp: int) -> Mesh:
    devs = jax.devices()
    need = n_subjects * n_dp
    if len(devs) < need:
        raise ValueError(f"need {need} devices ({n_subjects}x{n_dp}), have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_subjects, n_dp)
    return Mesh(grid, (SUBJECT_AXIS, DATA_AXIS))


def make_grid_step(
    net,
    body_model,
    stacked_assets: AvatarAssets,
    tx,
    opt_cfg,
    H: int,
    W: int,
    bg_color,
    raster_cfg,
    mesh: Mesh,
    train_stage: int = 1,
):
    """Returns (step, place_subject, place_batch):
      step(stacked_state, stacked_batch, w_rgl, pg, lg)
        -> (stacked_state, terms, images), everything stacked on a leading
           subject axis; per-subject batches (S, B_global, ...) sharded over
           `dp` so each subject trains data-parallel on its mesh row.
      place_subject(tree): shard a subject-stacked pytree P('subject')
        (replicated along dp). Use for the stacked states.
      place_batch(tree): shard batch leaves P('subject', 'dp').

    `stacked_assets` (from multi_subject.stack_assets) is placed P('subject')
    here and closed over — not a jit argument — so its static int fields
    (query_res/num_valid) stay Python ints for tracing."""
    subject_sh = NamedSharding(mesh, P(SUBJECT_AXIS))
    stacked_assets = jax.tree.map(
        lambda x: jax.device_put(x, subject_sh) if isinstance(x, jax.Array) else x,
        stacked_assets,
    )

    def single_with_assets(assets, state, batch, w_rgl, pg, lg):
        step = make_train_step(
            net, body_model, assets, tx, opt_cfg, H, W, bg_color, raster_cfg,
            train_stage=train_stage, jit=False,
        )
        return step(state, batch, w_rgl, pg, lg)

    vstep = jax.vmap(
        single_with_assets,
        in_axes=(
            AvatarAssets(0, 0, 0, 0, 0, 0, None, None),
            0,    # state
            0,    # batch
            None, None, None,
        ),
    )

    @jax.jit
    def step(stacked_state, stacked_batch, w_rgl, pg, lg):
        return vstep(stacked_assets, stacked_state, stacked_batch, w_rgl, pg, lg)

    batch_sh = NamedSharding(mesh, P(SUBJECT_AXIS, DATA_AXIS))

    def place_subject(tree: Any) -> Any:
        return jax.tree.map(
            lambda x: jax.device_put(x, subject_sh) if isinstance(x, jax.Array) else x,
            tree,
        )

    def place_batch(tree: Any) -> Any:
        return jax.tree.map(
            lambda x: jax.device_put(x, batch_sh) if isinstance(x, jax.Array) else x,
            tree,
        )

    return step, place_subject, place_batch
