"""Multi-scene batched Stage-I training: one scene per mesh shard.

A TPU-native capability with no reference counterpart (SURVEY.md §2.3): the
reference trains one scene per GPU process; here S independent scenes train
simultaneously on one jitted program — parameters, optimizer state, and
datasets all carry a leading scene axis sharded across the device mesh, and
the per-scene train step is vmapped over that axis. No collectives are
needed (scenes are independent), so each device advances its scene at full
local throughput; with S == n_devices this is embarrassingly-parallel
fleet training of e.g. the whole GlossySynthetic config family.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from nero_tpu.models.shape import NeROShapeModel
from nero_tpu.parallel.mesh import DATA_AXIS, make_data_mesh


class MultiSceneShapeModel:
    """Train several Stage-I scenes in one program.

    All scenes must share image count/resolution (true for the GlossySynthetic
    family). Scene s uses base_seed + s for parameter init.
    """

    def __init__(self, cfgs: list[dict], mesh=None, training: bool = True):
        assert len(cfgs) >= 1
        self.mesh = mesh if mesh is not None else make_data_mesh()
        self.models = []
        for s, cfg in enumerate(cfgs):
            cfg = dict(cfg)
            cfg["random_seed"] = cfg.get("random_seed", 6033) + s
            # scenes are independent; rays stay local to each scene's shard
            self.models.append(NeROShapeModel(cfg, training=training, mesh=self.mesh))
        self.n_scenes = len(self.models)

        self.params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[m.params for m in self.models])
        if training:
            self.train_data = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[m.train_data for m in self.models])

        self._scene_sharding = NamedSharding(self.mesh, P(DATA_AXIS))

    def shard_over_scenes(self, tree):
        """Place the leading scene axis of every leaf across the mesh."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._scene_sharding), tree)

    def make_train_step(self, optimizer: optax.GradientTransformation,
                        donate: bool = True):
        # all scenes share static config; use scene 0's raw step with ray
        # sharding disabled (the scene axis carries the parallelism instead)
        raw_step = self.models[0].build_step_fn(optimizer, shard_rays=False)
        vstep = jax.vmap(raw_step, in_axes=(0, 0, 0, None, 0))
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
