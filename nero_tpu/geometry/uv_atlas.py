"""Per-triangle UV atlas packing (lightmap-style).

Replaces the reference's xatlas unwrap (extract_materials_texture_map.py:72-86)
with a dependency-free packer: triangles are packed pairwise into square grid
cells (two right-triangle halves per cell, inset by a gutter). Because the
material textures are baked by querying the field at each texel's 3-D surface
position, chart boundaries carry no color discontinuity — the gutter plus
nearest-neighbour inpainting handles bilinear filtering across seams.
"""
from __future__ import annotations

import numpy as np


def triangle_atlas(triangles: np.ndarray, gutter: float = 0.15):
    """Pack each triangle into its own half-cell.

    Returns (uv [T*3, 2] in [0,1], new_tris [T,3] indexing the uv/vertex dup
    arrays, vert_map [T*3] original vertex index per new corner).
    """
    t = len(triangles)
    cells = (t + 1) // 2
    g = int(np.ceil(np.sqrt(cells)))
    cell = 1.0 / g
    inset = gutter * cell

    uv = np.zeros((t * 3, 2), np.float32)
    new_tris = np.arange(t * 3, dtype=np.int32).reshape(t, 3)
    vert_map = triangles.reshape(-1).astype(np.int64)

    idx = np.arange(t)
    cell_id = idx // 2
    is_upper = (idx % 2).astype(bool)
    cx = (cell_id % g).astype(np.float32) * cell
    cy = (cell_id // g).astype(np.float32) * cell

    lo = inset
    hi = cell - inset
    # lower-left half: corners (lo,lo), (hi,lo), (lo,hi)
    low_c = np.stack([np.stack([cx + lo, cy + lo], -1),
                      np.stack([cx + hi, cy + lo], -1),
                      np.stack([cx + lo, cy + hi], -1)], axis=1)
    # upper-right half: corners (hi,hi), (lo,hi), (hi,lo)
    up_c = np.stack([np.stack([cx + hi, cy + hi], -1),
                     np.stack([cx + lo, cy + hi], -1),
                     np.stack([cx + hi, cy + lo], -1)], axis=1)
    corners = np.where(is_upper[:, None, None], up_c, low_c)
    uv[:] = corners.reshape(-1, 2)
    return uv, new_tris, vert_map


def knn_inpaint(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Fill texels outside `mask` with their nearest valid texel (seam gutter).

    Parity with the sklearn-KNN inpaint at reference
    extract_materials_texture_map.py:136-149, using scipy's cKDTree.
    """
    from scipy.spatial import cKDTree
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return image
    tree = cKDTree(np.stack([ys, xs], -1))
    iy, ix = np.nonzero(~mask)
    if len(iy) == 0:
        return image
    _, nn = tree.query(np.stack([iy, ix], -1), k=1)
    out = image.copy()
    out[iy, ix] = image[ys[nn], xs[nn]]
    return out


def export_obj(path: str, vertices: np.ndarray, triangles: np.ndarray,
               uv: np.ndarray, uv_tris: np.ndarray, vert_map: np.ndarray,
               mtl_name: str = "material_0", mtl_file: str | None = None):
    """Write an OBJ with per-corner UVs + a companion MTL referencing textures."""
    with open(path, "w") as f:
        if mtl_file:
            f.write(f"mtllib {mtl_file}\n")
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in uv:
            f.write(f"vt {t[0]:.6f} {1.0 - t[1]:.6f}\n")
        if mtl_file:
            f.write(f"usemtl {mtl_name}\n")
        for tri, uvt in zip(triangles, uv_tris):
            f.write("f " + " ".join(
                f"{vert_map[u] + 1}/{u + 1}" for u in uvt) + "\n")


def export_mtl(path: str, name: str = "material_0", albedo: str = "albedo.jpg"):
    with open(path, "w") as f:
        f.write(f"newmtl {name}\n")
        f.write("Kd 1.0 1.0 1.0\n")
        f.write(f"map_Kd {albedo}\n")
