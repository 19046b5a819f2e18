"""Validation evaluator: run the model on the held-out view(s), aggregate
losses + metrics, return the key metric.

Parity: reference train/train_valid.py:11-52 (`ValidationEvaluator`).
"""
from __future__ import annotations

import time

import numpy as np

from nero_tpu.train.metrics import name2key_metrics


class ValidationEvaluator:
    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.key_metric_name = cfg["key_metric_name"]
        self.key_metric = name2key_metrics[self.key_metric_name]

    def __call__(self, model, params, losses, metrics, val_indices, step,
                 model_name, val_set_name=None, chunk_fn=None):
        if val_set_name is not None:
            model_name = f"{model_name}-{val_set_name}"
        eval_results = {}
        begin = time.time()
        for data_i, index in enumerate(val_indices):
            outputs = model.test_step(params, index, step, chunk_fn=chunk_fn)
            for loss_fn in losses:
                res = loss_fn(outputs, None, step, self.cfg)
                for k, v in res.items():
                    eval_results.setdefault(k, []).append(np.atleast_1d(np.asarray(v)))
            for metric_fn in metrics:
                res = metric_fn(outputs, None, step, data_index=data_i,
                                model_name=model_name)
                for k, v in res.items():
                    eval_results.setdefault(k, []).append(np.atleast_1d(np.asarray(v)))
        for k, v in eval_results.items():
            eval_results[k] = np.concatenate(v, axis=0)
        key_metric_val = self.key_metric(eval_results)
        eval_results[self.key_metric_name] = key_metric_val
        print(f"eval cost {time.time() - begin:.1f} s")
        return eval_results, key_metric_val
