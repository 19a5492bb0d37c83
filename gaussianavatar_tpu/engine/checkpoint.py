"""Checkpointing with the reference's directory layout
(`model_path/net/iteration_{epoch}/`, avatar_model.py:163-236) storing the
full TrainState (params, batch_stats, optimizer state, iteration counter) as
one msgpack blob via flax.serialization — the orbax-free path keeps restarts
dependency-light and works on any filesystem.
"""

from __future__ import annotations

import os
import re
from os.path import join
from typing import Any, Optional

from flax import serialization

from gaussianavatar_tpu.engine.train_step import TrainState

CKPT_NAME = "net.ckpt"


def ckpt_dir(model_path: str, epoch: int) -> str:
    return join(model_path, "net", f"iteration_{epoch}")


def save_checkpoint(model_path: str, epoch: int, state: TrainState) -> str:
    d = ckpt_dir(model_path, epoch)
    os.makedirs(d, exist_ok=True)
    payload = serialization.to_bytes(state)
    path = join(d, CKPT_NAME)
    with open(path, "wb") as f:
        f.write(payload)
    return path


def load_checkpoint(model_path: str, epoch: int, template: TrainState) -> TrainState:
    path = join(ckpt_dir(model_path, epoch), CKPT_NAME)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


_EMBED_KEYS = ("pose_embedding", "transl_embedding")


def _last_str_key(path) -> Optional[str]:
    for p in reversed(path):
        key = getattr(p, "key", getattr(p, "name", None))
        if isinstance(key, str):
            return key
    return None


def _map_embed_rows(state, fn):
    """Apply fn to every per-frame embedding table in the state — the params
    AND their SparseAdam moment twins (the moment trees mirror the param tree,
    so the leaf name identifies them in both)."""
    import jax

    def visit(path, leaf):
        if _last_str_key(path) in _EMBED_KEYS and getattr(leaf, "ndim", 0) >= 2:
            return fn(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, state)


def save_stacked_checkpoint(
    model_paths: list, epoch: int, stacked_state: TrainState,
    frame_counts: Optional[list] = None,
) -> list:
    """Save a subject-stacked TrainState (leading axis = subject, from
    parallel.multi_subject.stack_subjects) as S ordinary single-subject
    checkpoints, one per model_path. Each subject directory then looks
    exactly like single-subject training produced it: `eval.py -m <dir>`,
    `render_novel_pose.py`, and single-subject resume all work unchanged.

    `frame_counts[s]` trims subject s's pose/transl embedding tables (and
    their optimizer moments) back to its true frame count — multi-subject
    training pads them to the largest subject, and single-subject consumers
    validate the row count against their own dataset."""
    import jax
    import numpy as np

    host = jax.tree.map(np.asarray, stacked_state)  # one device->host gather
    paths = []
    for s, mp in enumerate(model_paths):
        # np.asarray around the slice: indexing a 1-d numpy array yields a
        # numpy SCALAR (np.int32), which would round-trip through
        # serialization as a scalar and defeat re-stacking on resume
        sub = jax.tree.map(lambda x: np.asarray(x[s]), host)
        if frame_counts is not None:
            n = int(frame_counts[s])
            sub = _map_embed_rows(sub, lambda x: x[:n])
        paths.append(save_checkpoint(mp, epoch, sub))
    return paths


def load_stacked_checkpoint(
    model_paths: list, epoch: int, single_template: TrainState
) -> TrainState:
    """Inverse of save_stacked_checkpoint: load S per-subject checkpoints,
    re-pad each subject's embedding tables (and moments) with zero rows to the
    template's row count (the largest subject), and re-stack along a leading
    subject axis. Zero-padding is exact for resume: padded rows are never
    indexed, and SparseAdam keeps untouched rows' moments at zero."""
    import jax
    import numpy as np

    from gaussianavatar_tpu.parallel.multi_subject import stack_subjects

    def pad_like(state):
        def visit(path, leaf, tleaf):
            if (
                _last_str_key(path) in _EMBED_KEYS
                and getattr(leaf, "ndim", 0) >= 2
                and leaf.shape[0] < tleaf.shape[0]
            ):
                arr = np.asarray(leaf)
                pad = np.zeros((tleaf.shape[0] - arr.shape[0],) + arr.shape[1:], arr.dtype)
                return np.concatenate([arr, pad], axis=0)
            return leaf

        return jax.tree_util.tree_map_with_path(visit, state, single_template)

    return stack_subjects(
        [pad_like(load_checkpoint(mp, epoch, single_template)) for mp in model_paths]
    )


def latest_epoch(model_path: str) -> Optional[int]:
    """searchForMaxIteration equivalent (system_utils.py:12-17)."""
    d = join(model_path, "net")
    if not os.path.isdir(d):
        return None
    epochs = [
        int(m.group(1))
        for name in os.listdir(d)
        if (m := re.match(r"iteration_(\d+)$", name))
    ]
    return max(epochs) if epochs else None
