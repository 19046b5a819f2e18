"""Stage-I shape model: device-resident dataset + jitted sharded train step.

Counterpart of reference `NeROShapeRenderer` (network/renderer.py:63-647),
restructured for TPU:
  * the whole training image set lives on device as uint8; each step samples
    a ray batch *inside jit* (no host->device transfer per step, unlike
    reference renderer.py:319-330);
  * the train step = sample + render + losses + grad + adam update in ONE
    compiled program, with ray-axis sharding constraints so the same program
    scales across a device mesh (params replicated, grads all-reduced by XLA);
  * step is a traced argument: one executable serves all 300k steps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nero_tpu.dataset.database import (BaseDatabase, get_database_split,
                                       parse_database_name)
from nero_tpu.ops.fg_lut import get_fg_lut
from nero_tpu.parallel.mesh import constrain_rays, make_data_mesh
from nero_tpu.render.rays import (human_coordinate_poses, rays_from_pixels,
                                  sample_ray_batch)
from nero_tpu.render.shape import (ShapeConfig, compute_rgb_loss, init_shape_params,
                                   render, shape_config_from_dict)
from nero_tpu.train.losses import compute_losses, total_loss
from nero_tpu.utils.image import downsample_gaussian_blur, resize_bilinear

DEFAULT_SHAPE_CFG = {
    "database_name": "proc/sphere/64",
    "train_ray_num": 512,
    "test_ray_num": 1024,
    "test_downsample_ratio": True,
    "downsample_ratio": 0.25,
    "val_geometry": False,
    "rgb_loss": "charbonier",
    "fixed_camera": False,
    "random_seed": 6033,
    "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
}


def build_imgs_info(database: BaseDatabase, img_ids):
    """Stack images/Ks/poses (reference renderer.py:17-26). Images stay uint8."""
    images = np.stack([database.get_image(i) for i in img_ids], 0)
    Ks = np.stack([database.get_K(i) for i in img_ids], 0).astype(np.float32)
    poses = np.stack([database.get_pose(i) for i in img_ids], 0).astype(np.float32)
    return {"imgs": images, "Ks": Ks, "poses": poses}


def imgs_info_downsample(imgs_info: dict, ratio: float) -> dict:
    """Gaussian-prefiltered downsample of images + intrinsics rescale
    (reference renderer.py:46-61)."""
    imgs = imgs_info["imgs"]
    n, h, w, _ = imgs.shape
    dh, dw = int(ratio * h), int(ratio * w)
    out_imgs, out_Ks = [], []
    for i in range(n):
        img = imgs[i].astype(np.float32) / 255.0
        img = downsample_gaussian_blur(img, ratio)
        img = resize_bilinear(img, (dh, dw))
        out_imgs.append((np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8))
        out_Ks.append(np.diag([dw / w, dh / h, 1]).astype(np.float32) @ imgs_info["Ks"][i])
    return {"imgs": np.stack(out_imgs), "Ks": np.stack(out_Ks),
            "poses": imgs_info["poses"]}


class NeROShapeModel:
    def __init__(self, cfg: dict, training: bool = True, mesh=None):
        self.cfg = {**DEFAULT_SHAPE_CFG, **cfg}
        self.scfg: ShapeConfig = shape_config_from_dict(self.cfg)
        self.fg_lut = jnp.asarray(get_fg_lut())
        self.mesh = mesh if mesh is not None else make_data_mesh()
        key = jax.random.PRNGKey(self.cfg["random_seed"])
        self.params = init_shape_params(key, self.scfg)
        self.database = None
        if training:
            self._init_dataset()

    # ------------------------------------------------------------------ data
    def _init_dataset(self):
        self.database = parse_database_name(self.cfg["database_name"])
        self.train_ids, self.test_ids = get_database_split(self.database)
        info = build_imgs_info(self.database, self.train_ids)
        self.train_data = self._device_data(info)
        self.test_imgs_info = build_imgs_info(self.database, self.test_ids)

    def _device_data(self, info: dict) -> dict:
        poses = jnp.asarray(info["poses"])
        return {
            "imgs_u8": jnp.asarray(info["imgs"]),
            "K_inv": jnp.linalg.inv(jnp.asarray(info["Ks"])),
            "poses": poses,
            "human_poses": human_coordinate_poses(poses, self.cfg["fixed_camera"]),
        }

    # ------------------------------------------------------------ train step
    def build_step_fn(self, optimizer: optax.GradientTransformation,
                      loss_names=None, shard_rays: bool = True):
        """Raw (un-jitted) train step — reused by the multi-scene vmap wrapper."""
        scfg, fg_lut, cfg, mesh = self.scfg, self.fg_lut, self.cfg, self.mesh
        loss_names = loss_names if loss_names is not None else cfg["loss"]
        rn = cfg["train_ray_num"]

        def step_fn(params, opt_state, key, step, data):
            k_batch, k_render = jax.random.split(key)
            batch = sample_ray_batch(k_batch, data["imgs_u8"], data["K_inv"],
                                     data["poses"], data["human_poses"], rn)
            if shard_rays:
                batch = constrain_rays(batch, mesh)

            def loss_fn(p):
                out = render(p, scfg, fg_lut, batch["rays_o"], batch["rays_d"],
                             batch["near"], batch["far"], batch["human_poses"],
                             step, key=k_render, is_train=True)
                out["loss_rgb"] = compute_rgb_loss(out["ray_rgb"], batch["rgb"],
                                                   cfg["rgb_loss"])
                log = compute_losses(loss_names, out, None, step, cfg)
                return total_loss(log), log

            (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            log = {k: jnp.mean(v) for k, v in log.items()}
            log["loss_total"] = loss
            return params, opt_state, log

        return step_fn

    def make_train_step(self, optimizer: optax.GradientTransformation,
                        loss_names=None, donate: bool = True):
        step_fn = self.build_step_fn(optimizer, loss_names)
        donate_args = (0, 1) if donate else ()
        return jax.jit(step_fn, donate_argnums=donate_args)

    # ------------------------------------------------------------- test step
    def make_render_chunk(self):
        """Jitted fixed-size chunk renderer for validation/NVS."""
        scfg, fg_lut = self.scfg, self.fg_lut

        def chunk_fn(params, rays_o, rays_d, near, far, human_poses, step):
            return render(params, scfg, fg_lut, rays_o, rays_d, near, far,
                          human_poses, step, key=None, is_train=False,
                          perturb_overwrite=0.0)

        return jax.jit(chunk_fn)

    def _render_rays_chunked(self, params, chunk_fn, rays, step):
        trn = self.cfg["test_ray_num"]
        rn = rays["rays_o"].shape[0]
        n_pad = (-rn) % trn
        padded = {k: np.concatenate([v, np.repeat(v[-1:], n_pad, 0)], 0) if n_pad else v
                  for k, v in rays.items()}
        outs = []
        for ri in range(0, rn + n_pad, trn):
            cur = {k: jnp.asarray(v[ri:ri + trn]) for k, v in padded.items()}
            out = chunk_fn(params, cur["rays_o"], cur["rays_d"], cur["near"],
                           cur["far"], cur["human_poses"], jnp.asarray(step))
            outs.append(jax.tree_util.tree_map(np.asarray, out))
        merged = {}
        for k in outs[0]:
            arr = np.concatenate([o[k] for o in outs], 0) if outs[0][k].ndim > 0 \
                else np.stack([o[k] for o in outs])
            if arr.ndim > 0 and arr.shape[0] == rn + n_pad:
                arr = arr[:rn]
            merged[k] = arr
        return merged

    def _image_rays(self, K: np.ndarray, pose: np.ndarray, h: int, w: int):
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float32) + 0.5,
                             np.arange(h, dtype=np.float32) + 0.5)
        coords = np.stack([xs, ys], -1).reshape(-1, 2)
        K_inv = np.linalg.inv(K).astype(np.float32)
        rays_o, rays_d, near, far = jax.tree_util.tree_map(
            np.asarray, rays_from_pixels(jnp.asarray(coords), jnp.asarray(K_inv)[None],
                                         jnp.asarray(pose)[None]))
        hp = np.asarray(human_coordinate_poses(jnp.asarray(pose)[None],
                                               self.cfg["fixed_camera"]))[0]
        human = np.broadcast_to(hp, (coords.shape[0], 3, 4))
        return {"rays_o": rays_o, "rays_d": rays_d, "near": near, "far": far,
                "human_poses": human}

    def test_step(self, params, index: int, step: int, chunk_fn=None):
        """Render one downsampled validation view + gt (reference renderer.py:274-317)."""
        if chunk_fn is None:
            chunk_fn = self.make_render_chunk()
        info = {k: v[index:index + 1] for k, v in self.test_imgs_info.items()}
        gt_depth, gt_mask = self.database.get_depth(self.test_ids[index])
        if self.cfg["test_downsample_ratio"]:
            ratio = self.cfg["downsample_ratio"]
            info = imgs_info_downsample(info, ratio)
            h, w = gt_depth.shape
            dh, dw = int(ratio * h), int(ratio * w)
            idx_y = (np.arange(dh) / ratio).astype(np.int64).clip(0, h - 1)
            idx_x = (np.arange(dw) / ratio).astype(np.int64).clip(0, w - 1)
            gt_depth = gt_depth[idx_y][:, idx_x]
            gt_mask = gt_mask[idx_y][:, idx_x]
        h, w = info["imgs"].shape[1:3]
        rays = self._image_rays(info["Ks"][0], info["poses"][0], h, w)
        outputs = self._render_rays_chunked(params, chunk_fn, rays, step)

        gt_rgb = info["imgs"][0].astype(np.float32) / 255.0
        outputs["gt_rgb"] = gt_rgb
        outputs["loss_rgb"] = np.asarray(
            compute_rgb_loss(jnp.asarray(outputs["ray_rgb"]),
                             jnp.asarray(gt_rgb.reshape(-1, 3)), self.cfg["rgb_loss"]))
        outputs["ray_rgb"] = outputs["ray_rgb"].reshape(h, w, 3)
        for k, v in outputs.items():
            if isinstance(v, np.ndarray) and v.ndim == 2 and v.shape[0] == h * w:
                outputs[k] = v.reshape(h, w, -1)
        outputs["gt_depth"] = gt_depth[..., None]
        outputs["gt_mask"] = gt_mask[..., None].astype(np.int32)

        if self.cfg["val_geometry"] and index == 0:
            # low-res geometry snapshot during validation (reference renderer.py:619-624)
            from nero_tpu.fields.sdf import sdf_value
            from nero_tpu.geometry.isosurface import extract_geometry
            scfg = self.scfg
            vertices, triangles = extract_geometry(
                [-1, -1, -1], [1, 1, 1], 128, 0.0,
                lambda p: sdf_value(params["sdf"], p, scfg.sdf_cfg))
            outputs["vertices"] = vertices
            outputs["triangles"] = triangles
        return outputs

    def nvs(self, params, pose: np.ndarray, K: np.ndarray, h: int, w: int,
            step: int = 300000, chunk_fn=None):
        """Novel-view synthesis (reference renderer.py:189-222)."""
        if chunk_fn is None:
            chunk_fn = self.make_render_chunk()
        rays = self._image_rays(K.astype(np.float32), pose.astype(np.float32), h, w)
        out = self._render_rays_chunked(params, chunk_fn, rays, step)
        return out["ray_rgb"].reshape(h, w, 3)

    def predict_materials(self, params=None, mesh_path: str | None = None,
                          vertices: np.ndarray | None = None, batch_size: int = 8192):
        """Stage-I per-vertex materials from the shading net's heads
        (reference renderer.py:629-647): SDF features at mesh vertices ->
        metallic/roughness/albedo predictors."""
        from nero_tpu.fields.app_shading import predict_materials as _pm
        from nero_tpu.fields.sdf import sdf_apply
        params = self.params if params is None else params
        if vertices is None:
            from nero_tpu.geometry.mesh_io import read_ply
            vertices = read_ply(mesh_path)["vertices"]
        scfg = self.scfg

        @jax.jit
        def fn(p, x):
            feats = sdf_apply(p["sdf"], x, scfg.sdf_cfg)[..., 1:]
            return _pm(p["shader"], x, feats)

        out = {"metallic": [], "roughness": [], "albedo": []}
        for vi in range(0, len(vertices), batch_size):
            chunk = np.asarray(vertices[vi:vi + batch_size], np.float32)
            n = len(chunk)
            if n < batch_size:
                chunk = np.concatenate([chunk, np.zeros((batch_size - n, 3), np.float32)])
            m, r, a = fn(params, jnp.asarray(chunk))
            out["metallic"].append(np.asarray(m)[:n])
            out["roughness"].append(np.asarray(r)[:n])
            out["albedo"].append(np.asarray(a)[:n])
        return {k: np.concatenate(v, 0) for k, v in out.items()}

    def get_step_input(self, step: int):
        """Per-step 5th argument of the train step (full device dataset; the
        ray batch is sampled inside jit)."""
        return self.train_data

    def num_train_rays_per_step(self) -> int:
        return self.cfg["train_ray_num"]
