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
    """Rays/sec measured ONLY across host-sync boundaries.

    jax dispatch is asynchronous (and the TPU tunnel defers aggressively):
    per-step wall timestamps measure enqueue rate, not execution — a
    sliding-window tick meter here once reported 6x the real throughput
    (MFU > 1). The only honest measurement is wall time between two points
    where a host readback has proven all intervening device work complete;
    call sync(step, rays_per_step) right after such a readback."""

    def __init__(self):
        self._last = None
        self.rays_per_sec = 0.0
        self.step_seconds = 0.0

    def sync(self, step: int, rays_per_step: int):
        """Record a proven-complete point; updates the published rates."""
        now = time.perf_counter()
        if self._last is not None:
            t0, s0 = self._last
            n = step - s0
            if n > 0 and now > t0:
                self.step_seconds = (now - t0) / n
                self.rays_per_sec = rays_per_step / self.step_seconds
        self._last = (now, step)

    def reset(self):
        """Invalidate the baseline (call after validation/checkpoint pauses)."""
        self._last = None
