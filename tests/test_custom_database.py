"""End-to-end Custom/GlossyReal-style database: COLMAP parse -> unit-sphere
normalization -> resized image cache with rescaled intrinsics."""
import os

import numpy as np
import pytest

import nero_tpu.dataset.database as dbmod
from nero_tpu.dataset.colmap_model import Camera, Image, rotmat2qvec, write_model
from nero_tpu.dataset.database import CustomDatabase
from nero_tpu.geometry.mesh_io import write_ply
from nero_tpu.utils.image import imsave
from nero_tpu.utils.pose import look_at_pose, pose_apply


@pytest.fixture()
def custom_scene(tmp_path, monkeypatch):
    root = tmp_path / "custom" / "toy"
    (root / "images").mkdir(parents=True)
    (root / "colmap" / "sparse" / "0").mkdir(parents=True)

    rng = np.random.RandomState(0)
    h, w = 48, 64
    f = 60.0
    cameras = {1: Camera(1, "SIMPLE_PINHOLE", w, h, np.asarray([f, w / 2, h / 2]))}
    images = {}
    n_views = 4
    for i in range(1, n_views + 1):
        az = 2 * np.pi * i / n_views
        eye = np.asarray([4 * np.cos(az), 4 * np.sin(az), 2.0]) + np.asarray([1.0, 2.0, 3.0])
        pose = look_at_pose(eye, np.asarray([1.0, 2.0, 3.0]))
        q = rotmat2qvec(pose[:, :3])
        images[i] = Image(i, q, pose[:, 3], 1, f"img_{i}.png")
        imsave(str(root / "images" / f"img_{i}.png"),
               rng.randint(0, 255, (h, w, 3), np.uint8))
    write_model(cameras, images, str(root / "colmap" / "sparse" / "0"))

    # object point cloud: a small blob centred at (1,2,3) with radius ~0.8
    pts = rng.normal(size=(500, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 0.8 + np.asarray([1.0, 2.0, 3.0])
    write_ply(str(root / "object_point_cloud.ply"), pts.astype(np.float32))
    np.savetxt(str(root / "meta_info.txt"),
               np.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]))

    monkeypatch.setattr(dbmod, "DATA_ROOT", str(tmp_path))
    return root


def test_custom_database_raw(custom_scene):
    db = CustomDatabase("custom/toy/raw_32")
    ids = db.get_img_ids()
    assert len(ids) == 4
    img = db.get_image(ids[0])
    assert max(img.shape[:2]) == 32  # resized so longest side is 32
    # normalization: the object cloud fits the unit sphere at the origin
    r = np.linalg.norm(db.ref_points, axis=-1)
    assert abs(r.max() - 1.0) < 1e-5
    # cameras re-posed consistently: the old object centre maps near the origin
    for i in ids:
        pose = db.get_pose(i)
        cam_pt = pose_apply(pose, np.zeros((1, 3)))  # normalized-world origin
        assert cam_pt[0, 2] > 0  # in front of every camera
        # distance preserved up to the cloud scale (~1/0.8)
        np.testing.assert_allclose(np.linalg.norm(cam_pt), 4.0 / 0.8, rtol=0.3)
    # intrinsics rescaled with the resize
    K = db.get_K(ids[0])
    assert K[0, 0] == pytest.approx(60.0 * 32 / 64, rel=1e-5)
    # cache hit on re-open
    db2 = CustomDatabase("custom/toy/raw_32")
    assert db2.get_img_ids() == ids


def test_custom_database_crop(custom_scene):
    db = CustomDatabase("custom/toy/24")
    img = db.get_image(db.get_img_ids()[0])
    assert img.shape[:2] == (24, 24)
    K = db.get_K(db.get_img_ids()[0])
    np.testing.assert_allclose(K[:2, 2], [12.0, 12.0], atol=1e-5)
    # cached crop metadata reload
    db2 = CustomDatabase("custom/toy/24")
    np.testing.assert_allclose(db2.get_K(db.get_img_ids()[0]), K)
