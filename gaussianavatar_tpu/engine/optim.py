"""Optimizers with the reference's effective training dynamics:

  - `multistep_schedule`: MultiStepLR(gamma=0.1). The reference steps its
    scheduler every ITERATION while the milestones are in epoch units
    (avatar_model.py:267 + arguments/__init__.py:142), so the LR really drops
    after 66/133 iterations; callers pick the unit explicitly
    (OptimizationParams.sched_unit).
  - `sparse_adam`: torch.optim.SparseAdam semantics for embedding tables
    (avatar_model.py:113): only rows with nonzero gradient get moment and
    parameter updates; untouched rows keep stale moments (no decay). A shared
    step counter drives bias correction. Gating pose optimization by epoch
    (avatar_model.py:262-270) falls out naturally: zeroed gradients update
    nothing, including the step counter.
  - `build_optimizer`: the multi-group layout — stage 1: adam(net lr 3e-3) +
    adam(geo 5e-4) + sparse_adam(embeddings 5e-3); stage 2: adam(net 0.1x) +
    adam(pose_encoder 1x), embeddings frozen (training_setup,
    avatar_model.py:148-162; train.py:55-56).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def fn(count):
        n = jnp.sum(count >= ms)
        return base_lr * (gamma ** n.astype(jnp.float32))

    return fn


class SparseAdamState(NamedTuple):
    step: jax.Array
    mu: Any
    nu: Any


def sparse_adam(
    learning_rate: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    def init_fn(params):
        return SparseAdamState(
            step=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        del params
        # a row is 'touched' if any entry in its last axis has nonzero grad
        masks = jax.tree.map(
            lambda g: jnp.any(g != 0, axis=-1, keepdims=True), grads
        )
        any_touch = jnp.asarray(
            sum(jnp.any(m) for m in jax.tree.leaves(masks)) > 0
        )
        step = state.step + any_touch.astype(jnp.int32)

        def upd_mu(m, g, mask):
            return jnp.where(mask, b1 * m + (1 - b1) * g, m)

        def upd_nu(v, g, mask):
            return jnp.where(mask, b2 * v + (1 - b2) * g * g, v)

        mu = jax.tree.map(upd_mu, state.mu, grads, masks)
        nu = jax.tree.map(upd_nu, state.nu, grads, masks)
        sf = step.astype(jnp.float32)
        c1 = 1.0 - b1**sf
        c2 = 1.0 - b2**sf

        def upd(m, v, mask):
            mhat = m / jnp.maximum(c1, 1e-12)
            vhat = v / jnp.maximum(c2, 1e-12)
            return jnp.where(mask, -learning_rate * mhat / (jnp.sqrt(vhat) + eps), 0.0)

        updates = jax.tree.map(upd, mu, nu, masks)
        return updates, SparseAdamState(step=step, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def param_labels(params) -> Any:
    """Map each AvatarNet param leaf to an optimizer group label."""

    def label(path, _):
        top = path[0].key
        if top == "geo_feature":
            return "geo"
        if top in ("pose_embedding", "transl_embedding"):
            return "embed"
        if top == "pose_encoder":
            return "pose_enc"
        return "net"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(params, opt_cfg, steps_per_epoch: int, train_stage: int):
    """Multi-group optimizer matching AvatarModel.training_setup."""
    unit = getattr(opt_cfg, "sched_unit", "iteration")
    ms = [int(m) * (steps_per_epoch if unit == "epoch" else 1) for m in opt_cfg.sched_milestones]

    def adam(lr):
        return optax.adam(learning_rate=multistep_schedule(lr, ms))

    if train_stage == 1:
        groups = {
            "net": adam(opt_cfg.lr_net),
            "geo": adam(opt_cfg.lr_geomfeat),
            "embed": sparse_adam(getattr(opt_cfg, "lr_pose", 5e-3)),
            "pose_enc": optax.set_to_zero(),  # absent in stage 1
        }
    else:
        groups = {
            "net": adam(opt_cfg.lr_net * 0.1),
            "geo": optax.set_to_zero(),       # geo feature frozen in stage 2
            "embed": optax.set_to_zero(),     # pose/transl frozen (train.py:55-56)
            "pose_enc": adam(opt_cfg.lr_net),
        }
    tx = optax.multi_transform(groups, param_labels(params))
    return tx
