"""Render a novel-view orbit from a trained Stage-I checkpoint.

Complements the `nvs()` API (reference renderer.py:189-222): produces an
orbit of frames around the object for qualitative inspection.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--num_frames", type=int, default=60)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--elevation", type=float, default=0.35)
    parser.add_argument("--distance", type=float, default=3.0)
    parser.add_argument("--out", type=str, default="data/nvs")
    flags = parser.parse_args()

    from nero_tpu.core.checkpoint import load_checkpoint
    from nero_tpu.core.config import load_cfg
    from nero_tpu.models.shape import NeROShapeModel
    from nero_tpu.utils.image import imsave
    from nero_tpu.utils.pose import look_at_pose

    cfg = load_cfg(flags.cfg)
    model = NeROShapeModel(cfg, training=False)
    ckpt = os.path.join(cfg.get("model_root", "data/model"), cfg["name"],
                        "model.npz")
    step, _, params, _ = load_checkpoint(ckpt, model.params, None)
    print(f"loaded step {step}")

    res = flags.resolution
    f = 1.1 * res
    K = np.asarray([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1]], np.float32)
    out_dir = Path(flags.out) / cfg["name"]
    out_dir.mkdir(exist_ok=True, parents=True)
    chunk_fn = model.make_render_chunk()
    for i in range(flags.num_frames):
        az = 2 * np.pi * i / flags.num_frames
        eye = flags.distance * np.asarray([
            np.cos(az) * np.cos(flags.elevation),
            np.sin(az) * np.cos(flags.elevation),
            np.sin(flags.elevation)])
        pose = look_at_pose(eye, np.zeros(3))
        img = model.nvs(params, pose, K, res, res, step=step, chunk_fn=chunk_fn)
        imsave(str(out_dir / f"{i:04d}.png"),
               (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8))
        print(f"frame {i + 1}/{flags.num_frames}", end="\r")
    print(f"\nwrote {flags.num_frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
