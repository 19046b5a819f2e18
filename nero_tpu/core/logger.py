"""Scalar logging: tensorboard (if available) + append-to-text files.

Parity: reference train/train_tools.py:93-108 (`Logger.log`) — scalars go
to a SummaryWriter and to {train,val}.txt in the model dir; train logs every
train_log_step steps. Adds a first-class rays/sec meter, the framework's
north-star throughput metric (absent in the reference; see SURVEY.md §5).
"""
from __future__ import annotations

import os
import time


class Logger:
    def __init__(self, model_dir: str, use_tb: bool = True):
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        self.writer = None
        if use_tb:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(log_dir=model_dir)
            except Exception:
                self.writer = None

    def log(self, results: dict, prefix: str, step: int, verbose: bool = False):
        msg = f"{prefix} step {step} "
        for k, v in results.items():
            if self.writer is not None:
                try:
                    self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
                except Exception:
                    pass
            msg += f"{k} {float(v):.5f} "
        with open(os.path.join(self.model_dir, f"{prefix}.txt"), "a") as f:
            f.write(msg + "\n")
        if verbose:
            print(msg)


class RaysPerSecMeter:
    """Sliding-window rays/sec counter (call tick(rays) once per step)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events = []

    def tick(self, rays: int):
        self._events.append((time.perf_counter(), rays))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def rays_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        total = sum(r for _, r in self._events[1:])
        return total / max(dt, 1e-9)

    @property
    def step_seconds(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        return dt / (len(self._events) - 1)
