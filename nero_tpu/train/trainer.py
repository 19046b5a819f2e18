"""Training orchestration: step loop, optimizer, checkpoints, validation.

Parity target: reference train/trainer.py:21-207 (`Trainer`): loss = sum of
all 'loss*' outputs, warm-up-cosine LR, validation every val_interval with
best-model selection on the key metric, checkpoint every save_interval with
auto-resume, scalar logging to tensorboard + text files.

TPU-native differences: the optimizer is optax.adam driven by a pure LR
schedule; the whole train step (batch sampling included) is one jitted,
donate-argnums program; a rays/sec meter is logged (SURVEY.md §5 north star).
"""
from __future__ import annotations

import os
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nero_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from nero_tpu.core.logger import Logger, RaysPerSecMeter
from nero_tpu.models import get_model
from nero_tpu.train.losses import name2loss
from nero_tpu.train.lr import name2lr_schedule
from nero_tpu.train.metrics import name2metrics
from nero_tpu.train.valid import ValidationEvaluator


class Trainer:
    default_cfg = {
        "optimizer_type": "adam",
        "lr_type": "warm_up_cos",
        "lr_cfg": {},
        "total_step": 300000,
        "train_log_step": 20,
        "val_interval": 10000,
        "save_interval": 500,
        "random_seed": 6033,
        # bf16 MXU inputs / f32 accumulation: ~1.6x faster steps at a measured
        # ~0.1 dB validation-PSNR cost on the procedural scene; set "highest"
        # for full-f32 matmuls.
        "matmul_precision": "default",
        "model_root": "data/model",
        # write a jax profiler trace of steps [profile_start, profile_start+profile_steps)
        "profile_dir": None,
        "profile_start": 20,
        "profile_steps": 5,
    }

    def __init__(self, cfg: dict):
        self.cfg = {**self.default_cfg, **cfg}
        random.seed(self.cfg["random_seed"])
        np.random.seed(self.cfg["random_seed"])
        self.model_name = self.cfg["name"]
        self.model_dir = os.path.join(self.cfg["model_root"], self.model_name)
        Path(self.model_dir).mkdir(exist_ok=True, parents=True)
        self.ckpt_fn = os.path.join(self.model_dir, "model.npz")
        self.best_ckpt_fn = os.path.join(self.model_dir, "model_best.npz")
        jax.config.update("jax_default_matmul_precision", self.cfg["matmul_precision"])

    # ------------------------------------------------------------------ setup
    def _init_network(self):
        self.model = get_model(self.cfg["network"])(self.cfg, training=True)
        self.val_losses = [name2loss[n] for n in self.cfg["loss"]]
        self.val_metrics = [name2metrics[n] if n in name2metrics else name2loss[n]
                            for n in self.cfg["val_metric"]]
        lr_cfg = dict(self.cfg.get("lr_cfg") or {})
        lr_cfg.setdefault("end_iter", self.cfg["total_step"])
        schedule = name2lr_schedule[self.cfg["lr_type"]](lr_cfg)
        self._lr_schedule = schedule
        if self.cfg["optimizer_type"] == "adam":
            self.optimizer = optax.adam(learning_rate=schedule)
        elif self.cfg["optimizer_type"] == "sgd":
            self.optimizer = optax.sgd(learning_rate=schedule)
        else:
            raise NotImplementedError(self.cfg["optimizer_type"])
        self.val_evaluator = ValidationEvaluator(self.cfg)

    def _load_model(self, params, opt_state):
        if os.path.exists(self.ckpt_fn):
            step, best_para, params, opt_state = load_checkpoint(
                self.ckpt_fn, params, opt_state)
            print(f"==> resuming from step {step} best para {best_para}")
            return best_para, step, params, opt_state
        return 0.0, 0, params, opt_state

    # -------------------------------------------------------------------- run
    def run(self):
        self._init_network()
        logger = Logger(self.model_dir)
        meter = RaysPerSecMeter()

        params = self.model.params
        opt_state = self.optimizer.init(params)
        best_para, start_step, params, opt_state = self._load_model(params, opt_state)

        train_step = self.model.make_train_step(self.optimizer)
        chunk_fn = self.model.make_render_chunk()
        rays_per_step = self.model.num_train_rays_per_step()
        base_key = jax.random.PRNGKey(self.cfg["random_seed"])

        # FLOPs/step from XLA's compiled cost analysis -> per-step MFU logging
        from nero_tpu.core.mfu import compiled_flops, mfu
        flops_per_step = compiled_flops(
            train_step, params, opt_state, base_key, jnp.asarray(start_step),
            self.model.get_step_input(start_step))

        total = self.cfg["total_step"]
        prof_dir = self.cfg["profile_dir"]
        prof_window = (range(self.cfg["profile_start"],
                             self.cfg["profile_start"] + self.cfg["profile_steps"])
                       if prof_dir else range(0))
        for step in range(start_step, total):
            if prof_dir and step == prof_window.start:
                jax.profiler.start_trace(prof_dir)
            key = jax.random.fold_in(base_key, step)
            params, opt_state, log = train_step(params, opt_state, key,
                                                jnp.asarray(step),
                                                self.model.get_step_input(step))
            if prof_dir and step == prof_window.stop - 1:
                jax.block_until_ready(log["loss_total"])
                jax.profiler.stop_trace()

            if (step + 1) % self.cfg["train_log_step"] == 0:
                # the float() readbacks prove all device work to this step is
                # done — the only point where wall-clock rates are honest
                host_log = {k: float(v) for k, v in log.items()}
                meter.sync(step, rays_per_step)
                host_log["lr"] = float(self._lr_schedule(step))
                host_log["rays_per_sec"] = meter.rays_per_sec
                host_log["mfu"] = mfu(flops_per_step, meter.step_seconds)
                logger.log(host_log, "train", step + 1, verbose=False)

            if (step + 1) % self.cfg["val_interval"] == 0 or (step + 1) == total:
                # iterate the configured validation sets; the FINAL set selects
                # the best model (reference trainer.py:147-160)
                val_names = [vs.get("name", "val")
                             for vs in self.cfg.get("val_set_list", [{"name": "val"}])]
                all_results, val_para = {}, 0.0
                for vn in val_names:
                    val_results, val_para = self.val_evaluator(
                        self.model, params, self.val_losses, self.val_metrics,
                        list(range(len(self.model.test_ids))), step,
                        self.model_name, val_set_name=vn, chunk_fn=chunk_fn)
                    for k, v in val_results.items():
                        all_results[f"{vn}-{k}"] = v
                if val_para > best_para:
                    print(f"New best model {self.cfg['key_metric_name']}: "
                          f"{val_para:.5f} previous {best_para:.5f}")
                    best_para = val_para
                    save_checkpoint(self.best_ckpt_fn, step + 1, best_para,
                                    params, opt_state)
                logger.log({k: float(np.mean(v)) for k, v in all_results.items()},
                           "val", step + 1)
                meter.reset()  # validation pause must not pollute the rate

            if (step + 1) % self.cfg["save_interval"] == 0:
                save_checkpoint(self.ckpt_fn, step + 1, best_para, params, opt_state)
                meter.reset()

        save_checkpoint(self.ckpt_fn, total, best_para, params, opt_state)
        self.model.params = params
        return params
