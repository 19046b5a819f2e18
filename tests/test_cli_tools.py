"""CLI tool integration: train via config -> extract_mesh -> eval chamfer."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the axon TPU sitecustomize hook
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(args, cwd):
    res = subprocess.run([sys.executable] + args, cwd=cwd, env=_cpu_env(),
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stdout + "\n" + res.stderr
    return res.stdout


@pytest.mark.slow
def test_train_extract_eval_cli(tmp_path):
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text("""\
name: cli_tiny
network: shape
database_name: proc/sphere/32_6
n_samples: 16
n_importance: 8
up_sample_steps: 2
n_bg_samples: 4
train_ray_num: 32
test_ray_num: 64
occ_loss_step: 100000
anneal_end: 100
total_step: 4
val_interval: 4
save_interval: 2
train_log_step: 2
loss: ['nerf_render','eikonal','std','init_sdf_reg','occ']
val_metric: ['shape_render']
key_metric_name: psnr
lr_type: warm_up_cos
lr_cfg: {end_warm: 2, end_iter: 4}
optimizer_type: adam
""")
    _run([os.path.join(REPO, "run_training.py"), "--cfg", str(cfg_path)],
         cwd=str(tmp_path))
    assert (tmp_path / "data/model/cli_tiny/model.npz").exists()

    out = _run([os.path.join(REPO, "extract_mesh.py"), "--cfg", str(cfg_path),
                "--resolution", "48"], cwd=str(tmp_path))
    mesh_path = tmp_path / "data/meshes/cli_tiny-4.ply"
    assert mesh_path.exists(), out

    # the barely-trained SDF is still roughly the geometric-init sphere
    from nero_tpu.geometry.mesh_io import read_ply
    verts = read_ply(str(mesh_path))["vertices"]
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert 0.2 < np.median(r) < 0.9

    out = _run([os.path.join(REPO, "eval_synthetic_shape.py"),
                "--mesh", str(mesh_path), "--object", "proc/sphere/32_6"],
               cwd=str(tmp_path))
    assert "pr-to-gt" in out
    assert (tmp_path / "data/geometry.log").exists()
