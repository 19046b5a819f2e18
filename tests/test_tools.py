"""Tool-layer tests: chamfer eval, texture baking, COLMAP IO."""
import os
import sqlite3

import jax.numpy as jnp
import numpy as np

from nero_tpu.dataset.colmap_db import COLMAPDatabase
from nero_tpu.dataset.colmap_model import camera_K, read_model, qvec2rotmat, rotmat2qvec
from nero_tpu.dataset.database import (get_database_eval_points,
                                       parse_database_name, voxel_downsample)
from nero_tpu.geometry.chamfer import chamfer_distance
from nero_tpu.geometry.isosurface import extract_geometry
from nero_tpu.geometry.native import rasterize_uv
from nero_tpu.geometry.uv_atlas import (export_mtl, export_obj, knn_inpaint,
                                        triangle_atlas)


def test_chamfer_identical_and_offset():
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    c, _, _ = chamfer_distance(pts, pts)
    assert c < 1e-5
    c2, _, _ = chamfer_distance(pts, pts + np.asarray([0.1, 0, 0], np.float32))
    assert 0.05 < c2 <= 0.11


def test_voxel_downsample():
    pts = np.asarray([[0.001, 0, 0], [0.004, 0, 0], [0.5, 0.5, 0.5]], np.float32)
    out = voxel_downsample(pts, 0.01)
    assert len(out) == 2
    np.testing.assert_allclose(sorted(out[:, 0]), [0.0025, 0.5], atol=1e-6)


def test_eval_points_match_mesh_proc():
    """Fused depth points and the extracted sphere mesh agree to ~voxel size."""
    db = parse_database_name("proc/sphere/48_6")
    gt_pts = get_database_eval_points(db, voxel_size=0.02)
    assert len(gt_pts) > 200
    r = np.linalg.norm(gt_pts, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.02

    verts, _ = extract_geometry([-1, -1, -1], [1, 1, 1], 64, 0.0,
                                lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    c, _, _ = chamfer_distance(gt_pts, verts)
    assert c < 0.03, c


def test_triangle_atlas_and_bake(tmp_path):
    verts, tris = extract_geometry([-1, -1, -1], [1, 1, 1], 24, 0.0,
                                   lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    uv, uv_tris, vert_map = triangle_atlas(tris)
    assert uv.min() >= 0 and uv.max() <= 1
    assert uv_tris.shape == tris.shape
    # bake 3D positions into UV space, then verify baked positions lie on the mesh
    pos_img, mask = rasterize_uv(uv, uv_tris, verts[vert_map], 256, 256)
    assert mask.mean() > 0.2
    r = np.linalg.norm(pos_img[mask], axis=-1)
    assert np.abs(r - 0.5).max() < 0.1

    filled = knn_inpaint(pos_img, mask)
    r2 = np.linalg.norm(filled.reshape(-1, 3), axis=-1)
    assert np.abs(r2 - 0.5).max() < 0.1  # gutter texels copied from valid ones

    obj_path = str(tmp_path / "mesh.obj")
    export_mtl(str(tmp_path / "material.mtl"))
    export_obj(obj_path, verts, tris, uv, uv_tris, vert_map, mtl_file="material.mtl")
    lines = open(obj_path).read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == len(verts)
    assert sum(l.startswith("vt ") for l in lines) == len(uv)
    assert sum(l.startswith("f ") for l in lines) == len(tris)


def test_chart_atlas():
    """Chart atlas: in-bounds, overlap-free, fewer seams than per-triangle."""
    from nero_tpu.geometry.uv_atlas import chart_atlas
    verts, tris = extract_geometry([-1, -1, -1], [1, 1, 1], 32, 0.0,
                                   lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    uv, uv_tris, vert_map = chart_atlas(verts, tris, resolution=256)
    assert uv.min() >= 0 and uv.max() <= 1
    assert uv_tris.shape == tris.shape
    # charts share interior vertices: far fewer uv rows than 3 per triangle
    assert len(uv) < 1.5 * len(verts)
    # every uv row maps back to a real vertex and parameterises it exactly
    assert vert_map.shape == (len(uv),)
    res = 256
    pos_img, mask = rasterize_uv(uv, uv_tris, verts[vert_map], res, res)
    assert mask.mean() > 0.35  # packed utilization
    r = np.linalg.norm(pos_img[mask], axis=-1)
    assert np.abs(r - 0.5).max() < 0.1
    # overlap-free: each triangle's UV centroid rasterises to its own centroid
    cen_uv = uv[uv_tris].mean(1)
    cen_3d = verts[tris].mean(1)
    px = np.clip((cen_uv * res).astype(int), 0, res - 1)
    ok = mask[px[:, 1], px[:, 0]]
    err = np.linalg.norm(pos_img[px[:, 1], px[:, 0]][ok] - cen_3d[ok], axis=-1)
    assert np.percentile(err, 99) < 0.15  # one-texel quantisation at res 256


def test_colmap_db(tmp_path):
    path = str(tmp_path / "database.db")
    db = COLMAPDatabase(path)
    cam_id = db.add_camera("SIMPLE_RADIAL", 640, 480, [800.0, 320, 240, 0.0],
                           camera_id=1)
    img_id = db.add_image("img0.png", cam_id, image_id=1)
    db.commit()
    db.close()
    conn = sqlite3.connect(path)
    cams = conn.execute("SELECT camera_id, model, width FROM cameras").fetchall()
    imgs = conn.execute("SELECT image_id, name FROM images").fetchall()
    assert cams == [(1, 2, 640)]
    assert imgs == [(1, "img0.png")]


def test_colmap_text_model(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n")
    q = rotmat2qvec(np.eye(3))
    (tmp_path / "images.txt").write_text(
        f"1 {q[0]} {q[1]} {q[2]} {q[3]} 0.1 0.2 0.3 1 img0.png\n\n")
    cameras, images, _ = read_model(str(tmp_path))
    K = camera_K(cameras[1])
    np.testing.assert_allclose(K[0, 0], 500.0)
    np.testing.assert_allclose(K[1, 1], 510.0)
    np.testing.assert_allclose(images[1].tvec, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(images[1].rotation(), np.eye(3), atol=1e-9)


def test_colmap_binary_roundtrip(tmp_path):
    """Binary sparse-model write/read round-trip (the reference's own test
    pattern, colmap/test_read_write_model.py)."""
    from nero_tpu.dataset.colmap_model import Camera, Image, write_model
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    cameras = {1: Camera(1, "PINHOLE", 640, 480, np.asarray([500., 510., 320., 240.]))}
    images = {7: Image(7, q, np.asarray([0.5, -0.25, 2.0]), 1, "photo_01.png")}
    write_model(cameras, images, str(tmp_path))
    cams2, imgs2, _ = read_model(str(tmp_path))
    assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
    np.testing.assert_allclose(cams2[1].params, cameras[1].params)
    np.testing.assert_allclose(imgs2[7].qvec, q)
    np.testing.assert_allclose(imgs2[7].tvec, [0.5, -0.25, 2.0])
    assert imgs2[7].name == "photo_01.png" and imgs2[7].camera_id == 1


def test_qvec_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        a = rng.randn(3)
        a /= np.linalg.norm(a)
        ang = rng.uniform(0, np.pi)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        q = rotmat2qvec(R)
        np.testing.assert_allclose(qvec2rotmat(q), R, atol=1e-8)
