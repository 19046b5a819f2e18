"""Device mesh + sharding helpers: data parallelism over the ray axis.

The reference is single-GPU by construction (train/trainer.py:67-69 raises on
multi_gpus). Rays are embarrassingly parallel, so the TPU-native scale-out is
1-D data parallelism: batch arrays sharded on a 'data' mesh axis, parameters
replicated, gradient all-reduce riding ICI — all inserted by XLA GSPMD from
sharding constraints (no hand-written collectives needed). Multi-slice DCN
deployments extend the same mesh with an outer axis.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_data_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        # cap the DEFAULT mesh size (tests pin this to 1 so tiny models don't
        # compile 8-way GSPMD programs; explicit `devices` is never capped)
        cap = os.environ.get("NERO_MESH_DEVICES")
        if cap:
            devices = devices[:int(cap)]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_rays(tree, mesh: Mesh):
    """Pin every leaf's leading axis to the data axis (inside jit)."""
    sh = ray_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sh), tree)
