"""Symmetric Chamfer distance between point clouds, brute-force NN on device.

Parity target: reference eval_synthetic_shape.py:16-25, 86-99 — nearest-
neighbour distances computed by brute force on the accelerator in chunks,
averaged both directions. Chunked fixed shapes keep the distance matrix
within HBM and let the MXU do the [chunk, N] pairwise distances.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _nn_dist_chunk(query: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """min_j ||q_i - r_j|| for a [C,3] query chunk against [N,3] refs."""
    # ||q-r||^2 = |q|^2 - 2 q.r + |r|^2 ; the q.r term hits the MXU
    q2 = jnp.sum(query ** 2, axis=-1, keepdims=True)
    r2 = jnp.sum(ref ** 2, axis=-1)
    cross = query @ ref.T
    d2 = q2 - 2.0 * cross + r2[None, :]
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))


def nearest_dist(query: np.ndarray, ref: np.ndarray, chunk: int = 8192) -> np.ndarray:
    query = np.asarray(query, np.float32)
    ref_j = jnp.asarray(np.asarray(ref, np.float32))
    out = np.empty((len(query),), np.float32)
    for i in range(0, len(query), chunk):
        q = query[i:i + chunk]
        n_pad = chunk - len(q)
        if n_pad:
            q = np.concatenate([q, np.zeros((n_pad, 3), np.float32)])
        d = np.asarray(_nn_dist_chunk(jnp.asarray(q), ref_j))
        out[i:i + chunk - n_pad] = d[:chunk - n_pad]
    return out


def chamfer_distance(pts0: np.ndarray, pts1: np.ndarray, chunk: int = 8192):
    """Returns (mean symmetric chamfer, d0->1 mean, d1->0 mean)."""
    d01 = nearest_dist(pts0, pts1, chunk).mean()
    d10 = nearest_dist(pts1, pts0, chunk).mean()
    return (d01 + d10) / 2.0, d01, d10
