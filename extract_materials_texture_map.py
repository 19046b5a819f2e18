"""Bake Stage-II materials into UV texture maps + OBJ/MTL export.

Parity: reference extract_materials_texture_map.py — UV unwrap (here a
dependency-free per-triangle atlas instead of xatlas), UV-space rasterisation
of 3-D surface positions, batched material queries at those positions,
nearest-neighbour seam inpainting, and albedo/metallic/roughness JPG +
textured OBJ/MTL export.
"""
import argparse
import os
from pathlib import Path

import numpy as np

from nero_tpu.core.checkpoint import load_checkpoint
from nero_tpu.core.config import load_cfg
from nero_tpu.geometry.native import rasterize_uv
from nero_tpu.geometry.uv_atlas import (chart_atlas, export_mtl, export_obj,
                                        knn_inpaint, triangle_atlas)
from nero_tpu.models.material import NeROMaterialModel
from nero_tpu.utils.color import linear_to_srgb
from nero_tpu.utils.image import imsave


def bake_textures(model, params, resolution: int = 1024, batch: int = 8192,
                  atlas: str = "charts", verbose: bool = True):
    verts, tris = model.vertices, model.triangles
    if atlas == "charts":
        uv, uv_tris, vert_map = chart_atlas(verts, tris, resolution=resolution)
    else:
        uv, uv_tris, vert_map = triangle_atlas(tris)
    corner_pos = verts[vert_map]  # [uvN, 3]

    pos_img, mask = rasterize_uv(uv, uv_tris, corner_pos, resolution, resolution)
    if verbose:
        print(f"[bake] atlas={atlas} uv_verts={len(uv)} "
              f"texel_utilization={mask.mean():.3f}")
    pts = pos_img[mask]
    mats = np.zeros((len(pts), 5), np.float32)
    for i in range(0, len(pts), batch):
        chunk = pts[i:i + batch]
        n_pad = batch - len(chunk)
        if n_pad:
            chunk = np.concatenate([chunk, np.zeros((n_pad, 3), np.float32)])
        out = model.predict_materials_at(chunk, params)
        mats[i:i + batch - n_pad] = out[:batch - n_pad]

    tex = np.zeros((resolution, resolution, 5), np.float32)
    tex[mask] = mats
    tex[..., 4][mask] = np.sqrt(np.maximum(tex[..., 4][mask], 1e-7))  # roughness sqrt
    tex = knn_inpaint(tex, mask)
    albedo = linear_to_srgb(np.clip(tex[..., 0:3], 0, 1))
    metallic = np.clip(tex[..., 3:4], 0, 1)
    roughness = np.clip(tex[..., 4:5], 0, 1)
    return albedo, metallic, roughness, (uv, uv_tris, vert_map)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--atlas", type=str, default="charts",
                        choices=["charts", "per_triangle"])
    parser.add_argument("--output_dir", type=str, default="data/materials_texture")
    flags = parser.parse_args()

    cfg = load_cfg(flags.cfg)
    model = NeROMaterialModel(cfg, training=False)
    model_root = cfg.get("model_root", "data/model")
    best_fn = os.path.join(model_root, cfg["name"], "model_best.npz")
    ckpt_fn = best_fn if os.path.exists(best_fn) else \
        os.path.join(model_root, cfg["name"], "model.npz")
    step, _, params, _ = load_checkpoint(ckpt_fn, model.params, None)
    print(f"loaded step {step} from {ckpt_fn}")

    albedo, metallic, roughness, (uv, uv_tris, vert_map) = bake_textures(
        model, params, flags.resolution, atlas=flags.atlas)

    out_dir = Path(flags.output_dir) / f"{cfg['name']}-{step}"
    out_dir.mkdir(exist_ok=True, parents=True)
    imsave(str(out_dir / "albedo.jpg"), (albedo * 255 + 0.5).astype(np.uint8))
    imsave(str(out_dir / "metallic.jpg"),
           (np.repeat(metallic, 3, -1) * 255 + 0.5).astype(np.uint8))
    imsave(str(out_dir / "roughness.jpg"),
           (np.repeat(roughness, 3, -1) * 255 + 0.5).astype(np.uint8))
    export_mtl(str(out_dir / "material.mtl"))
    export_obj(str(out_dir / "mesh.obj"), model.vertices, model.triangles,
               uv, uv_tris, vert_map, mtl_file="material.mtl")
    print(f"wrote textures + OBJ to {out_dir}")


if __name__ == "__main__":
    main()
