"""Generate the configs/ corpus (YAML schema parity with the reference CLI).

Scene set and per-scene deltas follow SURVEY.md §2 (config corpus row):
8 GlossySynthetic + 5 GlossyReal scenes for each stage, plus the custom
'kettle' example; angel/horse disable clip_sample_variance; real captures
enable the human light and (Stage II) sphere_direction env encoding.
"""
import os
import pickle

SYN_SCENES = ["angel", "bell", "cat", "horse", "luyu", "potion", "tbell", "teapot"]
REAL_SCENES = ["bear", "bunny", "coral", "maneki", "vase"]
NO_CLIP = {"angel", "horse"}

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs")


def shape_cfg(name, db, human_light=False, clip=True):
    lines = [f"name: {name}", "", "####network#####", "network: shape",
             f"database_name: {db}"]
    if human_light:
        lines += ["shader_config:", "  human_light: true"]
    lines += ["apply_occ_loss: true", "occ_loss_step: 20000"]
    if not clip:
        lines += ["clip_sample_variance: false"]
    lines += [
        "", "######loss######",
        "loss: ['nerf_render','eikonal','std','init_sdf_reg','occ']",
        "val_metric: ['shape_render']",
        "key_metric_name: psnr",
        "eikonal_weight: 0.1",
        "freeze_inv_s_step: 15000",
        "", "####dataset#####",
        "train_dataset_type: dummy",
        "train_dataset_cfg:",
        f"  database_name: {db}",
        "val_set_list:",
        "  -",
        "    name: val",
        "    type: dummy",
        "    cfg:",
        f"      database_name: {db}",
        "", "####trainer####",
        "optimizer_type: adam",
        "lr_type: warm_up_cos",
        "lr_cfg: {}",
        "total_step: 300000",
        "val_interval: 5000",
        "save_interval: 1000",
        "train_log_step: 20",
    ]
    return "\n".join(lines) + "\n"


def material_cfg(name, db, mesh, outer="direction", human=False):
    lines = [f"name: {name}", "", "####network#####", "network: material",
             f"database_name: {db}", f"mesh: {mesh}", "",
             "reg_diffuse_light: true",
             "reg_diffuse_light_lambda: 0.1",
             "reg_mat: true",
             "shader_cfg:",
             "  diffuse_sample_num: 512",
             "  specular_sample_num: 256",
             f"  outer_light_version: {outer}",
             "  light_exp_max: 5.0",
             "  inner_light_exp_max: 5.0",
             f"  human_lights: {'true' if human else 'false'}",
             "", "######loss######",
             "loss: ['nerf_render','mat_reg']",
             "val_metric: ['mat_render']",
             "key_metric_name: psnr",
             "", "####dataset#####",
             "train_dataset_type: dummy",
             "train_dataset_cfg:",
             f"  database_name: {db}",
             "val_set_list:",
             "  -",
             "    name: val",
             "    type: dummy",
             "    cfg:",
             f"      database_name: {db}",
             "", "####trainer####",
             "optimizer_type: adam",
             "lr_type: warm_up_cos",
             "lr_cfg:",
             "  end_warm: 1000",
             "  end_iter: 100000",
             "total_step: 100000",
             "val_interval: 5000",
             "save_interval: 500",
             "train_log_step: 10",
             ]
    return "\n".join(lines) + "\n"


def write(path, content):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def main():
    for s in SYN_SCENES:
        write(f"{ROOT}/shape/syn/{s}.yaml",
              shape_cfg(f"{s}_shape", f"syn/{s}", clip=s not in NO_CLIP))
        write(f"{ROOT}/material/syn/{s}.yaml",
              material_cfg(f"{s}_material", f"syn/{s}",
                           f"data/meshes/{s}_shape-300000.ply"))
    for s in REAL_SCENES:
        write(f"{ROOT}/shape/real/{s}.yaml",
              shape_cfg(f"{s}_shape", f"real/{s}/raw_1024", human_light=True))
        write(f"{ROOT}/material/real/{s}.yaml",
              material_cfg(f"{s}_material", f"real/{s}/raw_1024",
                           f"data/meshes/{s}_shape-300000.ply",
                           outer="sphere_direction", human=True))
    # custom example object
    write(f"{ROOT}/custom/kettle_shape.yaml",
          shape_cfg("kettle_shape", "custom/kettle/raw_1024",
                    human_light=True, clip=False))
    write(f"{ROOT}/custom/kettle_material.yaml",
          material_cfg("kettle_material", "custom/kettle/raw_1024",
                       "data/meshes/kettle_shape-300000.ply",
                       outer="sphere_direction", human=True))
    # procedural smoke-test configs (no external data needed)
    write(f"{ROOT}/shape/proc/sphere.yaml",
          shape_cfg("proc_sphere_shape", "proc/sphere/128_16"))
    print("configs written")


def regen_split(reference_pkl: str):
    """Re-serialise the GlossySynthetic test/train split ids (benchmark data,
    needed for eval parity with the reference's configs/synthetic_split_128.pkl)."""
    with open(reference_pkl, "rb") as f:
        test_ids, train_ids = pickle.load(f)
    test_ids = [str(i) for i in list(test_ids)]
    train_ids = [str(i) for i in list(train_ids)]
    with open(f"{ROOT}/synthetic_split_128.pkl", "wb") as f:
        pickle.dump([test_ids, train_ids], f)
    print(f"split: {len(test_ids)} test / {len(train_ids)} train ids")


if __name__ == "__main__":
    main()
    import sys
    if len(sys.argv) > 1:
        regen_split(sys.argv[1])
