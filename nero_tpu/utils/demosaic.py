"""Bilinear Bayer demosaicing (numpy).

Parity target: reference utils/raw_utils.py:35-100 (the RawNeRF-style
bilinear demosaic used for raw captures): 2x upsample of each Bayer plane
with the quad-reshape trick, plus the green-channel cross filling.
"""
from __future__ import annotations

import numpy as np


def _reshape_quads(*planes):
    planes = np.stack(planes, -1)
    shape = planes.shape[:-1]
    zup = planes.reshape(shape + (2, 2))
    zup = np.transpose(zup, (0, 2, 1, 3))
    return zup.reshape((shape[0] * 2, shape[1] * 2))


def _bilinear_upsample(z):
    zx = .5 * (z + np.roll(z, -1, axis=-1))
    zy = .5 * (z + np.roll(z, -1, axis=-2))
    zxy = .5 * (zx + np.roll(zx, -1, axis=-2))
    return _reshape_quads(z, zx, zy, zxy)


def _upsample_green(g1, g2):
    z = np.zeros_like(g1)
    z = _reshape_quads(z, g1, g2, z)
    alt = 0
    for i in range(4):
        axis = -1 - (i // 2)
        roll = -1 + 2 * (i % 2)
        alt = alt + .25 * np.roll(z, roll, axis=axis)
    return alt + z


def bilinear_demosaic(bayer: np.ndarray, mode: str = "rggb") -> np.ndarray:
    """[H,W] Bayer mosaic -> [H,W,3] RGB."""
    if mode == "rggb":
        r, g1, g2, b = [bayer[(i // 2)::2, (i % 2)::2] for i in range(4)]
    elif mode == "bggr":
        b, g1, g2, r = [bayer[(i // 2)::2, (i % 2)::2] for i in range(4)]
    else:
        raise NotImplementedError(mode)
    r = _bilinear_upsample(r)
    b = _bilinear_upsample(b[::-1, ::-1])[::-1, ::-1]
    g = _upsample_green(g1, g2)
    return np.stack([r, g, b], -1)
