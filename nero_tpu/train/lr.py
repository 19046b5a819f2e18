"""Learning-rate schedules (registry parity: reference train/lr_common_manager.py).

`warm_up_cos`: linear warm-up to `lr`, then cosine decay to alpha*lr
(reference lr_common_manager.py:21-43). Returned as a pure step->lr function
consumed by optax, instead of mutating optimizer param groups.
"""
from __future__ import annotations

import jax.numpy as jnp


def warm_up_cos_schedule(cfg: dict):
    c = {"end_warm": 5000, "end_iter": 300000, "lr": 5e-4, **cfg}
    warm, end, lr = c["end_warm"], c["end_iter"], c["lr"]
    alpha = 0.05

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_factor = step / warm
        progress = (step - warm) / (end - warm)
        cos_factor = (jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0)) + 1.0) * 0.5 * (1 - alpha) + alpha
        return lr * jnp.where(step < warm, warm_factor, cos_factor)

    return schedule


name2lr_schedule = {
    "warm_up_cos": warm_up_cos_schedule,
}
