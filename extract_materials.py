"""Export per-vertex Stage-II materials as gamma-corrected .npy files.

CLI parity: reference extract_materials.py — writes
data/materials/<name>-<step>/{metallic,roughness,albedo}.npy with
linear_to_srgb applied (the Blender vertex-color inverse-gamma workaround,
reference extract_materials.py:28-33).
"""
import argparse
import os
from pathlib import Path

import numpy as np

from nero_tpu.core.checkpoint import load_checkpoint
from nero_tpu.core.config import load_cfg
from nero_tpu.models.material import NeROMaterialModel
from nero_tpu.utils.color import linear_to_srgb


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="data/materials")
    flags = parser.parse_args()

    cfg = load_cfg(flags.cfg)
    model = NeROMaterialModel(cfg, training=False)
    ckpt_fn = os.path.join(cfg.get("model_root", "data/model"), cfg["name"],
                           "model.npz")
    step, _, params, _ = load_checkpoint(ckpt_fn, model.params, None)
    print(f"loaded step {step} from {ckpt_fn}")

    materials = model.predict_materials(params)
    out_dir = Path(flags.output_dir) / f"{cfg['name']}-{step}"
    out_dir.mkdir(exist_ok=True, parents=True)
    for k, v in materials.items():
        np.save(str(out_dir / f"{k}.npy"), linear_to_srgb(v))
    print(f"wrote materials to {out_dir}")


if __name__ == "__main__":
    main()
