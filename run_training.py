"""Train a NeRO-TPU model from a YAML config (CLI parity: reference run_training.py)."""
import argparse

from nero_tpu.core.config import load_cfg
from nero_tpu.train.trainer import Trainer

parser = argparse.ArgumentParser()
parser.add_argument("--cfg", type=str, default="configs/shape/syn/bell.yaml")
flags = parser.parse_args()

Trainer(load_cfg(flags.cfg)).run()
