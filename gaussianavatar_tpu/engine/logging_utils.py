"""Observability: JSONL metrics log (always) + TensorBoard scalars (when
the optional dependency exists — mirroring the reference's guarded import,
train.py:16-20) + the stdout-timestamp shim (safe_state, general_utils.py:108-130).
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, model_path: str):
        os.makedirs(model_path, exist_ok=True)
        self.path = os.path.join(model_path, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(model_path)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "t": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"train_loss_patches/{k}", float(v), step)

    def log_event(self, name: str, value):
        """Non-scalar run facts (e.g. 'lpips: inactive (...)') — one JSON
        record so a degraded configuration is visible in the log."""
        self._f.write(json.dumps({"event": name, "value": value, "t": time.time()}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
        if self.tb is not None:
            self.tb.close()


def safe_state(quiet: bool = False, seed: int = 0):
    """Timestamped stdout + seeding (reference safe_state)."""
    import random

    import numpy as np

    old = sys.stdout

    class F:
        def write(self, x):
            if quiet:
                return
            if x.endswith("\n"):
                old.write(x.replace("\n", f" [{datetime.now().strftime('%d/%m %H:%M:%S')}]\n"))
            else:
                old.write(x)

        def flush(self):
            old.flush()

    sys.stdout = F()
    random.seed(seed)
    np.random.seed(seed)
