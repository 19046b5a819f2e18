"""Database family tests: procedural, GlossySynthetic pickles, NeRF-Synthetic."""
import json
import os
import pickle

import numpy as np
import pytest

import nero_tpu.dataset.database as dbmod
from nero_tpu.dataset.database import (GlossySyntheticDatabase,
                                       NeRFSyntheticDatabase,
                                       get_database_split, parse_database_name)
from nero_tpu.utils.image import imsave
from nero_tpu.utils.pose import look_at_pose, pose_apply


def test_procedural_database():
    db = parse_database_name("proc/sphere/32_6")
    ids = db.get_img_ids()
    assert len(ids) == 6
    img = db.get_image(ids[0])
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    depth, mask = db.get_depth(ids[0])
    assert mask.any() and (depth[mask] < 14).all()
    # camera centre at distance 3 from origin
    pose = db.get_pose(ids[0])
    cen = -pose[:, :3].T @ pose[:, 3]
    np.testing.assert_allclose(np.linalg.norm(cen), 3.0, atol=1e-5)


def test_procedural_bowl_database():
    """Concave scene: depth-consistent geometry, both components visible."""
    from nero_tpu.dataset.synthetic import scene_sdf
    db = parse_database_name("proc/bowl/48_4")
    sdf = scene_sdf("bowl")
    ids = db.get_img_ids()
    img = db.get_image(ids[1])
    assert img.shape == (48, 48, 3)
    depth, mask = db.get_depth(ids[1])
    assert 0.05 < mask.mean() < 0.6
    # backproject masked depth: points must lie on the zero level set
    K, pose = db.get_K(ids[1]), db.get_pose(ids[1])
    ys, xs = np.where(mask)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1).astype(np.float64)
    pts_cam = (pix @ np.linalg.inv(K).T) * depth[mask][:, None]
    pts = (pts_cam - pose[:, 3]) @ pose[:, :3]
    d = np.abs(sdf(pts))
    assert np.median(d) < 2e-3 and d.max() < 0.05
    # concavity: some surface points have |p| well below the shell radius
    assert (np.linalg.norm(pts, axis=-1) < 0.3).any()


def test_split_seed_stability():
    db = parse_database_name("proc/sphere/32_6")
    train1, test1 = get_database_split(db)
    train2, test2 = get_database_split(db)
    assert train1 == train2 and test1 == test2
    assert len(test1) == 1 and len(train1) == 5
    assert set(train1 + test1) == set(db.get_img_ids())


def test_glossy_synthetic_database(tmp_path, monkeypatch):
    root = tmp_path / "GlossySynthetic" / "toy"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for k in range(3):
        pose = look_at_pose(np.asarray([3.0, k * 0.1, 0.5]), np.zeros(3))
        K = np.asarray([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
        with open(root / f"{k}-camera.pkl", "wb") as f:
            pickle.dump((pose, K), f)
        imsave(str(root / f"{k}.png"), rng.randint(0, 255, (32, 32, 3), np.uint8))
        depth = (rng.rand(32, 32) * 65535).astype(np.uint16)
        imsave(str(root / f"{k}-depth.png"), depth)
    monkeypatch.setattr(dbmod, "DATA_ROOT", str(tmp_path))
    db = GlossySyntheticDatabase("syn/toy")
    assert db.get_img_ids() == ["0", "1", "2"]
    assert db.get_image("1").shape == (32, 32, 3)
    np.testing.assert_allclose(db.get_K("0")[0, 0], 40.0)
    depth, mask = db.get_depth("2")
    assert depth.max() <= 15.0 and mask.dtype == bool


def test_nerf_synthetic_database(tmp_path, monkeypatch):
    root = tmp_path / "nerf_synthetic" / "toy"
    (root / "train").mkdir(parents=True)
    # OpenGL c2w: camera at (0,0,4) looking at origin (-z forward)
    c2w = np.eye(4)
    c2w[2, 3] = 4.0
    meta = {"camera_angle_x": 0.8,
            "frames": [{"file_path": "train/r_0",
                        "transform_matrix": c2w.tolist()}]}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    rgba = np.zeros((16, 16, 4), np.uint8)
    rgba[4:12, 4:12] = [255, 0, 0, 255]  # red square on transparent bg
    imsave(str(root / "train" / "r_0.png"), rgba)

    monkeypatch.setattr(dbmod, "DATA_ROOT", str(tmp_path))
    db = NeRFSyntheticDatabase("nerf_synthetic/toy/white_16")
    ids = db.get_img_ids()
    assert ids == ["train-0"]
    img = db.get_image(ids[0])
    assert img.shape == (16, 16, 3)
    assert (img[0, 0] == 255).all()       # transparent -> white bg
    assert (img[8, 8] == [255, 0, 0]).all()
    pose = db.get_pose(ids[0])
    # camera centre at (0,0,4); origin projects to image centre with +z depth
    cen = -pose[:, :3].T @ pose[:, 3]
    np.testing.assert_allclose(cen, [0, 0, 4], atol=1e-6)
    cam_origin = pose_apply(pose, np.zeros((1, 3)))
    assert cam_origin[0, 2] > 0  # OpenCV forward
