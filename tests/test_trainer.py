"""Trainer loop integration: run a few steps, checkpoint, resume, validate."""
import os

import numpy as np
import pytest

from nero_tpu.train.trainer import Trainer
from tests.test_shape_e2e import TINY_CFG


def _trainer_cfg(tmp_path, total_step):
    cfg = dict(TINY_CFG)
    cfg.update({
        "name": "trainer_test",
        "total_step": total_step,
        "val_interval": 4,
        "save_interval": 2,
        "train_log_step": 2,
        "lr_type": "warm_up_cos",
        "lr_cfg": {"end_warm": 2, "end_iter": 8},
        "optimizer_type": "adam",
        "val_metric": ["shape_render"],
        "model_root": str(tmp_path / "model"),
    })
    return cfg


@pytest.mark.slow
def test_trainer_run_checkpoint_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _trainer_cfg(tmp_path, total_step=4)
    t = Trainer(cfg)
    t.run()
    ckpt = os.path.join(t.model_dir, "model.npz")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(t.model_dir, "train.txt"))
    # validation ran and produced vis output + val log
    assert os.path.exists(os.path.join(t.model_dir, "val.txt"))

    # resume: extend to 6 steps; should pick up from step 4
    cfg2 = _trainer_cfg(tmp_path, total_step=6)
    t2 = Trainer(cfg2)
    t2.run()
    from nero_tpu.core.checkpoint import load_checkpoint
    import jax
    step, best, _, _ = load_checkpoint(ckpt, t2.model.params, None)
    assert step == 6
