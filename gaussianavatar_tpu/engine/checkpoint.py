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
