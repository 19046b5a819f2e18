"""Multi-scene batched Stage-I training: scene x ray parallelism in one program.

A TPU-native capability with no reference counterpart (SURVEY.md §2.3): the
reference trains one scene per GPU process; here S independent scenes train
simultaneously in ONE jitted program — parameters, optimizer state, and
datasets all carry a leading scene axis, and the per-scene train step is
vmapped over that axis.

Two mesh shapes are supported:
  * 1-D ('data',) mesh, S == n_devices: one scene per device (round-2 mode).
    No collectives at all — each device advances its scene independently.
  * 2-D ('scene', 'data') mesh (parallel.mesh.make_scene_mesh): scenes shard
    the outer axis and each scene's RAY batch additionally shards over the
    inner 'data' axis. The scene axis is attached with
    `jax.vmap(..., spmd_axis_name='scene')`, so the in-step ray sharding
    constraints (P('data')) batch to P('scene', 'data') — one program,
    combined partitioning, per-scene gradient all-reduce riding only the
    inner axis groups (scenes never communicate).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from nero_tpu.models.shape import NeROShapeModel
from nero_tpu.parallel.mesh import (SCENE_AXIS, make_data_mesh, scene_sharding)


class MultiSceneShapeModel:
    """Train several Stage-I scenes in one program.

    All scenes must share image count/resolution (true for the GlossySynthetic
    family). Scene s uses base_seed + s for parameter init.
    """

    def __init__(self, cfgs: list[dict], mesh=None, training: bool = True):
        assert len(cfgs) >= 1
        self.mesh = mesh if mesh is not None else make_data_mesh()
        self.scene_parallel = SCENE_AXIS in self.mesh.axis_names
        self.models = []
        for s, cfg in enumerate(cfgs):
            cfg = dict(cfg)
            cfg["random_seed"] = cfg.get("random_seed", 6033) + s
            # on a ('scene','data') mesh each scene's rays also shard over the
            # inner data axis; on a 1-D mesh rays stay local to the shard
            self.models.append(NeROShapeModel(cfg, training=training, mesh=self.mesh))
        self.n_scenes = len(self.models)

        self.params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[m.params for m in self.models])
        if training:
            self.train_data = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[m.train_data for m in self.models])

        self._scene_sharding = scene_sharding(self.mesh)

    def shard_over_scenes(self, tree):
        """Place the leading scene axis of every leaf across the mesh."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._scene_sharding), tree)

    def make_train_step(self, optimizer: optax.GradientTransformation,
                        donate: bool = True):
        # all scenes share static config; use scene 0's raw step. On a 2-D
        # scene mesh the raw step keeps its ray-sharding constraints (they
        # target the inner 'data' axis) and vmap carries the scene axis via
        # spmd_axis_name; on a 1-D mesh the scene axis IS the mesh axis.
        raw_step = self.models[0].build_step_fn(
            optimizer, shard_rays=self.scene_parallel)
        vmap_kwargs = dict(in_axes=(0, 0, 0, None, 0))
        if self.scene_parallel:
            vmap_kwargs["spmd_axis_name"] = SCENE_AXIS
        vstep = jax.vmap(raw_step, **vmap_kwargs)
        sharding = self._scene_sharding

        def step_fn(params, opt_state, keys, step, data):
            params = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, sharding), params)
            return vstep(params, opt_state, keys, step, data)

        donate_args = (0, 1) if donate else ()
        return jax.jit(step_fn, donate_argnums=donate_args)

    def scene_keys(self, key, step: int):
        keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.fold_in(key, step), s))(
            jnp.arange(self.n_scenes))
        return keys

    def scene_params(self, params, s: int):
        return jax.tree_util.tree_map(lambda x: x[s], params)

    def test_step(self, params, scene: int, index: int, step: int, chunk_fn=None):
        return self.models[scene].test_step(self.scene_params(params, scene),
                                            index, step, chunk_fn=chunk_fn)
