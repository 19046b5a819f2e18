"""Color-space conversions (linear <-> sRGB).

Parity target: reference utils/raw_utils.py:4-33 (piecewise exact sRGB
transfer function). Works on both jnp and np arrays; pure functions.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_F32_EPS = float(np.finfo(np.float32).eps)


def linear_to_srgb(linear):
    """Piecewise-exact linear->sRGB. Assumes input roughly in [0, 1]."""
    xp = jnp if isinstance(linear, jnp.ndarray) else np
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * xp.maximum(linear, _F32_EPS) ** (5.0 / 12.0) - 11.0) / 200.0
    return xp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb):
    """Piecewise-exact sRGB->linear. Assumes input roughly in [0, 1]."""
    xp = jnp if isinstance(srgb, jnp.ndarray) else np
    linear0 = 25.0 / 323.0 * srgb
    linear1 = xp.maximum((200.0 * srgb + 11.0) / 211.0, _F32_EPS) ** (12.0 / 5.0)
    return xp.where(srgb <= 0.04045, linear0, linear1)


def color_map_forward(img_uint8):
    """uint8 [0,255] image -> float32 [0,1]."""
    return img_uint8.astype(np.float32) / 255.0


def color_map_backward(img_float):
    """float [0,1] image -> uint8 [0,255] with rounding and clipping."""
    img = np.asarray(img_float)
    return np.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
