"""Train a family of Stage-I scenes simultaneously, one scene per mesh shard.

Covers the "multi-scene batched training on a TPU mesh" deployment
(BASELINE.json config list): all scenes advance in ONE jitted program with
parameters/data sharded over the scene axis (see models/multi_scene.py).

Usage:
  python tools/train_multi_scene.py --cfgs configs/shape/syn/*.yaml \
      [--total_step N] [--model_root data/model]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfgs", type=str, nargs="+", required=True)
    parser.add_argument("--total_step", type=int, default=None)
    parser.add_argument("--model_root", type=str, default="data/model")
    parser.add_argument("--log_step", type=int, default=100)
    parser.add_argument("--save_interval", type=int, default=1000)
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nero_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from nero_tpu.core.config import load_cfg
    from nero_tpu.core.logger import Logger, RaysPerSecMeter
    from nero_tpu.models.multi_scene import MultiSceneShapeModel
    from nero_tpu.train.lr import name2lr_schedule

    cfgs = [load_cfg(p) for p in flags.cfgs]
    names = [c["name"] for c in cfgs]
    total = flags.total_step or cfgs[0].get("total_step", 300000)
    print(f"multi-scene training: {names} for {total} steps "
          f"on {len(jax.devices())} device(s)")

    ms = MultiSceneShapeModel(cfgs)
    lr_cfg = dict(cfgs[0].get("lr_cfg") or {})
    lr_cfg.setdefault("end_iter", total)
    schedule = name2lr_schedule[cfgs[0].get("lr_type", "warm_up_cos")](lr_cfg)
    opt = optax.adam(learning_rate=schedule)
    step_fn = ms.make_train_step(opt, donate=False)

    params = ms.shard_over_scenes(ms.params)
    data = ms.shard_over_scenes(ms.train_data)
    opt_state = jax.vmap(opt.init)(params)

    ckpt_fn = os.path.join(flags.model_root, "multi_" + "_".join(names[:3])
                           + (f"_plus{len(names) - 3}" if len(names) > 3 else ""),
                           "model.npz")
    start_step = 0
    if os.path.exists(ckpt_fn):
        start_step, _, params, opt_state = load_checkpoint(ckpt_fn, params, opt_state)
        print(f"resumed from step {start_step}")

    logger = Logger(os.path.dirname(ckpt_fn))
    meter = RaysPerSecMeter()
    rays_per_step = sum(m.cfg["train_ray_num"] for m in ms.models)
    key = jax.random.PRNGKey(6033)

    t0 = time.time()
    for step in range(start_step, total):
        keys = ms.scene_keys(key, step)
        params, opt_state, log = step_fn(params, opt_state, keys,
                                         jnp.asarray(step), data)
        if (step + 1) % flags.log_step == 0:
            losses = np.asarray(log["loss_total"])  # host sync
            meter.sync(step, rays_per_step)
            scalars = {"rays_per_sec": meter.rays_per_sec}
            for s, name in enumerate(names):
                scalars[f"{name}/loss_total"] = float(losses[s])
            logger.log(scalars, "train", step + 1)
            print(f"step {step + 1}: mean loss {losses.mean():.4f} "
                  f"({meter.rays_per_sec:.0f} rays/s aggregate)")
        if (step + 1) % flags.save_interval == 0 or (step + 1) == total:
            save_checkpoint(ckpt_fn, step + 1, 0.0, params, opt_state)

    print(f"done in {time.time() - t0:.0f}s; checkpoint at {ckpt_fn}")
    # export per-scene checkpoints compatible with the single-scene tools
    for s, name in enumerate(names):
        scene_params = ms.scene_params(params, s)
        fn = os.path.join(flags.model_root, name, "model.npz")
        os.makedirs(os.path.dirname(fn), exist_ok=True)
        save_checkpoint(fn, total, 0.0, scene_params)
        print(f"exported {fn}")


if __name__ == "__main__":
    main()
