"""Extract the Stage-I SDF iso-surface to data/meshes/<name>-<step>.ply.

CLI parity: reference extract_mesh.py (same flags, same artifact naming).
"""
import argparse
import os
from pathlib import Path

import jax.numpy as jnp

from nero_tpu.core.checkpoint import load_checkpoint
from nero_tpu.core.config import load_cfg
from nero_tpu.fields.sdf import sdf_value
from nero_tpu.geometry.isosurface import extract_geometry
from nero_tpu.geometry.mesh_io import write_ply
from nero_tpu.models.shape import NeROShapeModel


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--output_dir", type=str, default="data/meshes")
    parser.add_argument("--method", type=str, default="surface_nets",
                        choices=["surface_nets", "marching_tets"],
                        help="iso-surfacer: surface_nets (cell-centred, "
                             "smoother) or marching_tets (edge-interpolated, "
                             "mcubes-family like the reference's pymcubes)")
    flags = parser.parse_args()

    cfg = load_cfg(flags.cfg)
    model = NeROShapeModel(cfg, training=False)
    ckpt_fn = os.path.join(cfg.get("model_root", "data/model"), cfg["name"],
                           "model.npz")
    step, _, params, _ = load_checkpoint(ckpt_fn, model.params, None)
    print(f"loaded step {step} from {ckpt_fn}")

    scfg = model.scfg
    vertices, triangles = extract_geometry(
        [-1.01, -1.01, -1.01], [1.01, 1.01, 1.01], flags.resolution, 0.0,
        lambda p: sdf_value(params["sdf"], p, scfg.sdf_cfg),
        method=flags.method)
    print(f"mesh: {len(vertices)} verts, {len(triangles)} tris")

    Path(flags.output_dir).mkdir(exist_ok=True, parents=True)
    out = os.path.join(flags.output_dir, f"{cfg['name']}-{step}.ply")
    write_ply(out, vertices, triangles)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
