"""Device mesh + sharding helpers: ray DP, scene parallelism, multi-slice DCN.

The reference is single-GPU by construction (train/trainer.py:67-69 raises on
multi_gpus). Rays are embarrassingly parallel, so the TPU-native scale-out is
data parallelism over the ray axis: batch arrays sharded on a 'data' mesh
axis, parameters replicated, gradient all-reduce riding ICI — all inserted by
XLA GSPMD from sharding constraints (no hand-written collectives needed).

Three mesh shapes, all served by the same sharding helpers:
  * 1-D ('data',)                 — single-slice ray DP (the default);
  * 2-D ('slice', 'data')         — multi-slice deployments: rays shard over
    BOTH axes jointly, so the gradient all-reduce decomposes into an ICI
    reduce within each slice and a DCN all-reduce across slices (GSPMD emits
    the hierarchical collective from the mesh's device order);
  * 2-D ('scene', 'data')         — combined scene x ray parallelism in ONE
    program: independent scenes on the outer axis (no cross-scene
    collectives), ray DP within each scene group. The scene axis is applied
    by `jax.vmap(..., spmd_axis_name=SCENE_AXIS)` in models/multi_scene.py;
    the in-step ray constraints here target only the ray axes.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SCENE_AXIS = "scene"
SLICE_AXIS = "slice"


def _default_devices():
    devices = jax.devices()
    # cap the DEFAULT mesh size (tests pin this to 1 so tiny models don't
    # compile 8-way GSPMD programs; explicit `devices` is never capped)
    cap = os.environ.get("NERO_MESH_DEVICES")
    if cap:
        devices = devices[:int(cap)]
    return devices


def make_data_mesh(devices=None, n_slices: int = 1) -> Mesh:
    """Ray-DP mesh. n_slices > 1 adds an outer DCN axis ('slice', 'data'):
    device rows are slices, so the grad all-reduce is hierarchical (ICI
    within a row, DCN across rows)."""
    if devices is None:
        devices = _default_devices()
    devices = np.asarray(devices)
    if n_slices > 1:
        assert devices.size % n_slices == 0, (devices.size, n_slices)
        return Mesh(devices.reshape(n_slices, -1), (SLICE_AXIS, DATA_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def make_scene_mesh(n_scenes: int, devices=None) -> Mesh:
    """('scene', 'data') mesh: scenes on the outer axis, ray DP within each
    scene's device group."""
    if devices is None:
        devices = _default_devices()
    devices = np.asarray(devices)
    assert devices.size % n_scenes == 0, (devices.size, n_scenes)
    return Mesh(devices.reshape(n_scenes, -1), (SCENE_AXIS, DATA_AXIS))


def ray_axes(mesh: Mesh) -> tuple:
    """Mesh axes the ray batch shards over (slice+data; never scene)."""
    return tuple(a for a in (SLICE_AXIS, DATA_AXIS) if a in mesh.axis_names)


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh's ray axes."""
    return NamedSharding(mesh, P(ray_axes(mesh)))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading scene axis (falls back to the data axis on a 1-D mesh,
    where one device == one scene)."""
    axis = SCENE_AXIS if SCENE_AXIS in mesh.axis_names else DATA_AXIS
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_rays(tree, mesh: Mesh):
    """Pin every leaf's leading axis to the mesh's ray axes (inside jit)."""
    sh = ray_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sh), tree)
