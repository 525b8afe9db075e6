"""Scalar logging: TensorBoard via CLU metric_writers + a jsonl mirror.

Scalar names match the reference's Lightning logs (``train_loss``,
``val_loss``, ``val_l2_pixels``, ``val_match_ratio``,
``val_refinenet_loss``, ``val_dist_refinenet_pixels`` — ``src/models/net.py:
139-157``, ``refinenet.py:159-174``) so TensorBoard curves are directly
comparable between the two frameworks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class ScalarLogger:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._writer = None
        if use_tensorboard:
            try:
                from clu import metric_writers

                self._writer = metric_writers.SummaryWriter(logdir)
            except Exception:
                self._writer = None

    def log(self, step: int, scalars: Dict[str, float]):
        scalars = {k: float(v) for k, v in scalars.items()}
        self._jsonl.write(json.dumps({"step": step, "time": time.time(), **scalars}) + "\n")
        self._jsonl.flush()
        if self._writer is not None:
            self._writer.write_scalars(step, scalars)

    def close(self):
        self._jsonl.close()
        if self._writer is not None:
            self._writer.close()
