"""Multi-subject scale-out: train S independent avatars side by side, one
(or more) per device (BASELINE config #5: '4-subject data-parallel training
across ICI').

The avatars share an architecture and body model but own their parameters,
optimizer state, per-frame embeddings, and canonical assets (each subject has
its own betas/canonical geometry). Everything is stacked along a leading
`subject` axis, that axis is sharded over the mesh, and the single-subject
fused step is vmapped — XLA partitions the computation so each device runs
its subjects with zero cross-device traffic in steady state (ICI is used
only for the initial placement and any host reductions of the loss terms).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussianavatar_tpu.engine.train_step import TrainState, make_train_step
from gaussianavatar_tpu.models.avatar import AvatarAssets

SUBJECT_AXIS = "subject"


def make_subject_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.asarray(devs), (SUBJECT_AXIS,))


def stack_subjects(trees: Sequence[Any]) -> Any:
    """Stack per-subject pytrees along a new leading axis. Static leaves
    (python ints/str/np tables) must agree and pass through unstacked."""

    def stack(*leaves):
        if isinstance(leaves[0], (jax.Array, jnp.ndarray, np.generic)) or (
            isinstance(leaves[0], np.ndarray) and leaves[0].dtype != object
        ):
            # np.generic covers numpy scalars (np.int32 etc.) that checkpoint
            # restores can produce for 0-d leaves
            return jnp.stack(leaves)
        assert all(np.all(l == leaves[0]) for l in leaves[1:]), "static leaves differ"
        return leaves[0]

    return jax.tree.map(stack, *trees)


def stack_assets(assets_list: Sequence[AvatarAssets]) -> AvatarAssets:
    a0 = assets_list[0]
    assert all(a.query_res == a0.query_res for a in assets_list)
    assert all(a.num_valid == a0.num_valid for a in assets_list), (
        "subjects must share a UV atlas (same valid-pixel count); "
        "pad with build_avatar_assets(pad_to=...)"
    )
    return AvatarAssets(
        query_points=jnp.stack([a.query_points for a in assets_list]),
        query_lbs=jnp.stack([a.query_lbs for a in assets_list]),
        inv_mats=jnp.stack([a.inv_mats for a in assets_list]),
        valid_idx=jnp.stack([a.valid_idx for a in assets_list]),
        uv_coords=jnp.stack([a.uv_coords for a in assets_list]),
        betas=jnp.stack([a.betas for a in assets_list]),
        query_res=a0.query_res,
        num_valid=a0.num_valid,
    )


def make_multi_subject_step(
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
    """Returns step(stacked_state, stacked_batch, w_rgl, pose_gate, lpips_gate)
    with every stacked input sharded over the `subject` mesh axis."""
    single = make_train_step(
        net, body_model, None, tx, opt_cfg, H, W, bg_color, raster_cfg,
        train_stage=train_stage, jit=False,
    )

    # assets ride as a vmapped argument: rebuild the single-step closure to
    # accept them (make_train_step closed over assets=None; wrap instead).
    def single_with_assets(assets, state, batch, w_rgl, pg, lg):
        step = make_train_step(
            net, body_model, assets, tx, opt_cfg, H, W, bg_color, raster_cfg,
            train_stage=train_stage, jit=False,
        )
        return step(state, batch, w_rgl, pg, lg)

    del single

    vstep = jax.vmap(
        single_with_assets,
        in_axes=(
            AvatarAssets(0, 0, 0, 0, 0, 0, None, None),  # stacked asset arrays
            0,    # state
            0,    # batch
            None, None, None,
        ),
    )

    sharded = NamedSharding(mesh, P(SUBJECT_AXIS))

    @jax.jit
    def step(stacked_state, stacked_batch, w_rgl, pose_gate, lpips_gate):
        return vstep(stacked_assets, stacked_state, stacked_batch, w_rgl, pose_gate, lpips_gate)

    def place(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, sharded) if isinstance(x, jax.Array) else x,
            tree,
        )

    return step, place
