"""Stage-II material model: fixed mesh + BVH visibility + MC BRDF estimation.

Counterpart of reference `NeROMaterialRenderer` (network/renderer.py:649-915):
load the Stage-I mesh, build a BVH, precompute the first hit for every train
pixel once (keeping only hits), then per step shade 512 surface points with
the Monte-Carlo GGX shader; validation shades only the hit pixels of a test
view, scattered back into the image.

TPU-first notes:
  * the one-time all-pixel trace runs on the host C++ tracer (OpenMP) — it is
    IO-bound precompute, not the training hot path;
  * the per-step hot path (512 pts x 768 dirs: visibility + light MLPs +
    BRDF) is one jitted program; the BVH traversal inside it is the XLA
    wavefront kernel with stop_gradient'ed trace outputs (the reference's
    CUDA tracer is likewise non-differentiable);
  * validation compacts hit pixels into dense fixed-size chunks on the host,
    shades them on device, and scatters back — no wasted shading of misses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nero_tpu.dataset.database import get_database_split, parse_database_name
from nero_tpu.fields.mc_shading import (MCShadingConfig, init_mc_shading,
                                        make_direction_samples,
                                        material_regularization,
                                        mc_config_from_dict, mc_shading_apply,
                                        predict_materials_mc, env_light_image)
from nero_tpu.geometry.bvh_jax import RayTracer
from nero_tpu.geometry.mesh_io import read_ply
from nero_tpu.models.shape import build_imgs_info
from nero_tpu.parallel.mesh import constrain_rays, make_data_mesh
from nero_tpu.render.rays import human_coordinate_poses
from nero_tpu.render.shape import compute_rgb_loss
from nero_tpu.train.losses import compute_losses, total_loss

DEFAULT_MATERIAL_CFG = {
    "train_ray_num": 512,
    "test_ray_num": 1024,
    "database_name": "proc/sphere/64",
    "rgb_loss": "charbonier",
    "mesh": "data/meshes/bear_shape-300000.ply",
    "shader_cfg": {},
    "reg_mat": True,
    "reg_diffuse_light": True,
    "reg_diffuse_light_lambda": 0.1,
    "fixed_camera": False,
    "random_seed": 6033,
    "loss": ["nerf_render", "mat_reg"],
    # visibility backend: 'neural' (distilled SDF field, MXU marching — the
    # TPU-fast default), 'grid' (baked SDF grid sphere trace), 'bvh' (exact
    # XLA wavefront; slow on TPU, useful for small meshes/debug)
    "tracer": "neural",
    "tracer_distill_steps": 3000,
    "tracer_n_coarse": 32,
    # 'uniform' = fixed n_coarse-sample scan; 'sphere' = fixed n_sphere-
    # iteration sphere trace of the distilled SDF (same bracket contract at
    # a fraction of the field evals; ops/pallas/march_kernel.py). Iteration
    # budget measured on v5e (tools/ab_sphere_march.py refine_fine,
    # data/r5_tpu/ab_refine_fine.log): s18 clearing-ray agreement 0.9856 on
    # the concave bowl mesh (bar 0.98; s16 fails at 0.9734), uniform-c32
    # parity per the round-4 sweep. TPU default; the non-fused (CPU) path
    # always marches uniformly.
    "tracer_march_mode": "sphere",
    "tracer_n_sphere": 18,
    # bracket refinement after the march: 'illinois' (bracketed regula
    # falsi — superlinear on the smooth distilled MLP, so 2 evals + a free
    # final secant reach the field-error depth floor that bisection needs
    # 8 for; ops/pallas/march_kernel.py::_illinois_refine) or 'bisect'.
    # Fused sphere march only. Measured (ab_sphere_march refine +
    # refine_fine, v5e): depth MAE at the floor in every arm (bowl 0.00174
    # vs 0.00169 bisect-8, mirror 0.00084 = parity), hits bit-identical;
    # s18+illinois2 = 20 field evals/ray vs the old s20+bisect8's 28:
    # bowl step 52.4 -> 48.6 ms (10.5k pts/s), sphere 45.4 -> 41.1 ms.
    "tracer_refine_mode": "illinois",
    "tracer_n_refine": 2,
    # distilled-field topology: 'std' (PE6 -> 4x128 MLP) or 'wide' (finer
    # dual-chain PE folded into a K=123 first layer, one hidden layer fewer
    # -> 3 full-K matmuls/eval instead of 4; geometry/neural_tracer.py).
    # Gated like every tracer approximation: near-band RMS + >=0.98
    # clearing agreement (tools/ab_sphere_march.py topology).
    "tracer_field_topology": "std",
    # if the distilled field's near-band RMS exceeds this, the mesh is too
    # hard for the neural tracer — fall back to the exact grid tracer and say
    # so loudly (visibility errors silently poison Stage-II otherwise)
    "tracer_rms_fallback": 0.004,
    # hit-compacted inner-light evaluation (MCShadingConfig.inner_compact_frac):
    # 'auto' measures the scene's hemisphere hit rate at init and sizes the
    # static hit capacity with 1.5x headroom; a float fixes the fraction;
    # 'off' evaluates the inner-light MLP on every sample direction
    "inner_compact": "auto",
    # miss-compacted outer-light evaluation (MCShadingConfig.outer_compact_
    # frac): the concave-scene mirror of inner_compact — 'auto' sizes the
    # static miss capacity from the measured hemisphere miss rate; train-only
    "outer_compact": "auto",
}


class NeROMaterialModel:
    def __init__(self, cfg: dict, training: bool = True, mesh=None):
        self.cfg = {**DEFAULT_MATERIAL_CFG, **cfg}
        shader_cfg = dict(self.cfg.get("shader_cfg") or {})
        shader_cfg["is_real"] = self.cfg["database_name"].startswith("real")
        self.mcfg: MCShadingConfig = mc_config_from_dict(shader_cfg)
        self.mesh = mesh if mesh is not None else make_data_mesh()
        key = jax.random.PRNGKey(self.cfg["random_seed"])
        self.params = init_mc_shading(key, self.mcfg)
        self.samples = make_direction_samples(self.mcfg)
        self._init_geometry()
        if training:
            self._init_dataset()

    # -------------------------------------------------------------- geometry
    def _init_geometry(self):
        mesh_data = read_ply(self.cfg["mesh"]) if isinstance(self.cfg["mesh"], str) \
            else self.cfg["mesh"]
        self.vertices = np.asarray(mesh_data["vertices"], np.float32)
        self.triangles = np.asarray(mesh_data["triangles"], np.int32)
        backend = self.cfg["tracer"]
        if backend == "neural":
            from nero_tpu.geometry.neural_tracer import NeuralTracer
            self.ray_tracer = NeuralTracer(
                self.vertices, self.triangles,
                distill_steps=self.cfg["tracer_distill_steps"],
                n_coarse=self.cfg["tracer_n_coarse"],
                march_mode=self.cfg["tracer_march_mode"],
                n_sphere=self.cfg["tracer_n_sphere"],
                n_refine=self.cfg["tracer_n_refine"],
                refine_mode=self.cfg["tracer_refine_mode"],
                field_topology=self.cfg["tracer_field_topology"],
                seed=self.cfg["random_seed"])
            threshold = self.cfg["tracer_rms_fallback"]
            if self.ray_tracer.distill_rms > threshold:
                print(f"[NeROMaterialModel] WARNING: neural tracer distill RMS "
                      f"{self.ray_tracer.distill_rms:.4f} > {threshold} — "
                      f"falling back to the exact grid tracer for this mesh")
                from nero_tpu.geometry.grid_tracer import GridTracer
                self.ray_tracer = GridTracer(self.vertices, self.triangles)
        elif backend == "grid":
            from nero_tpu.geometry.grid_tracer import GridTracer
            self.ray_tracer = GridTracer(self.vertices, self.triangles)
        elif backend == "bvh":
            self.ray_tracer = RayTracer(self.vertices, self.triangles)
        else:
            raise NotImplementedError(f"tracer backend {backend}")
        self.trace_fn = self.ray_tracer.trace_fn()

    # ---------------------------------------------------------------- dataset
    def _init_dataset(self):
        self.database = parse_database_name(self.cfg["database_name"])
        self.train_ids, self.test_ids = get_database_split(self.database, "validation")
        info = build_imgs_info(self.database, self.train_ids)
        self.train_batch = self._construct_hit_batch(info)
        self.tbn = len(self.train_batch["rays_o"])
        # device-resident hit store: the step samples its batch in-jit, so no
        # per-step host slicing / H2D transfer sits on the step's critical
        # path (measured ~35 ms/step over the TPU tunnel)
        self.train_data = {k: jnp.asarray(v) for k, v in self.train_batch.items()}
        self.test_imgs_info = build_imgs_info(self.database, self.test_ids)
        rng = np.random.RandomState(self.cfg["random_seed"])
        self._shuffle(rng)
        self._batch_i = 0
        self._rng = rng
        self._resolve_inner_compact()
        self._resolve_outer_compact()

    def _resolve_inner_compact(self):
        """Size the static hit capacity of the compacted inner-light path.

        The reference's inner_light runs only on actual hits (dynamic torch
        indexing, reference network/field.py:812-818); the fixed-shape
        equivalent needs a static capacity, so measure this scene's hemisphere
        hit rate on real surface points with the exact host tracer and add
        1.5x headroom. Explicit shader_cfg.inner_compact_frac wins."""
        if (self.cfg.get("shader_cfg") or {}).get("inner_compact_frac") is not None:
            return
        mode = self.cfg["inner_compact"]
        if mode in (0, 0.0, "off", False, None):
            return
        frac = float(mode) if mode != "auto" else None
        if frac is None:
            rate = self._estimate_hit_rate()
            frac = min(0.75, 1.5 * rate + 0.05)
            if frac >= 0.72:
                print(f"[NeROMaterialModel] inner_compact auto: hemisphere hit "
                      f"rate {rate:.3f} too high for compaction — keeping the "
                      f"full-lattice inner-light path")
                return
            print(f"[NeROMaterialModel] inner_compact auto: hemisphere hit rate "
                  f"{rate:.3f} -> inner-light capacity {frac:.3f} of sample dirs")
        self.mcfg = self.mcfg._replace(inner_compact_frac=frac)

    def _resolve_outer_compact(self):
        """Size the static MISS capacity of the compacted outer-light path —
        the symmetric optimization for concave scenes (bowl: 61% of sample
        dirs re-hit the object, so full-lattice outer light is mostly
        discarded). Capacity = 1.5x the larger per-family miss rate + 0.05,
        only engaged when that saves >=25% of the outer evals. Explicit
        shader_cfg.outer_compact_frac wins. Train-only (validation always
        shades the full lattice)."""
        if (self.cfg.get("shader_cfg") or {}).get("outer_compact_frac") is not None:
            return
        mode = self.cfg["outer_compact"]
        if mode in (0, 0.0, "off", False, None):
            return
        frac = float(mode) if mode != "auto" else None
        if frac is None:
            # capacity covers the COMBINED lattice's misses: the two direction
            # families appear in fixed counts (diffuse_sample_num /
            # specular_sample_num), so the expected miss fraction is their
            # sample-weighted mean; 1.5x headroom absorbs per-batch deviation
            miss_rate = 1.0 - self._estimate_hit_rate(reduce="weighted")
            frac = min(0.75, 1.5 * miss_rate + 0.05)
            if frac >= 0.72:
                return  # mostly-miss scene (convex): compaction saves nothing
            print(f"[NeROMaterialModel] outer_compact auto: hemisphere miss "
                  f"rate {miss_rate:.3f} -> outer-light capacity {frac:.3f} "
                  f"of sample dirs")
        self.mcfg = self.mcfg._replace(outer_compact_frac=frac)

    def _estimate_hit_rate(self, n_pts: int = 256, n_dirs: int = 64,
                           reduce: str = "max") -> float:
        """Hemisphere self-hit rate: cosine dirs + mirror dirs from a sample
        of real surface points, traced with the exact host tracer. reduce=
        'max' bounds the hit count (inner capacity), 'min' bounds the miss
        count (outer capacity) across the two direction families."""
        rng = np.random.RandomState(0)
        idx = rng.choice(self.tbn, min(n_pts, self.tbn), replace=False)
        pts = self.train_batch["inters"][idx]
        normals = self.train_batch["normals"][idx]
        normals = normals / np.maximum(
            np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        view = -self.train_batch["rays_d"][idx]
        refl = (np.sum(view * normals, -1, keepdims=True) * normals * 2 - view)

        # cosine-hemisphere dirs about each normal
        u = rng.rand(len(pts), n_dirs, 2)
        phi = 2 * np.pi * u[..., 0]
        st = np.sqrt(u[..., 1])
        ct = np.sqrt(1 - u[..., 1])
        local = np.stack([np.cos(phi) * st, np.sin(phi) * st, ct], -1)
        a = np.where(np.abs(normals[:, :1]) < 0.9,
                     np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
        t1 = np.cross(normals, a)
        t1 /= np.maximum(np.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
        t2 = np.cross(normals, t1)
        dirs_d = (local[..., :1] * t1[:, None] + local[..., 1:2] * t2[:, None]
                  + local[..., 2:] * normals[:, None])
        # mirror dirs with a small jitter (specular lobes concentrate here)
        jit = rng.randn(len(pts), n_dirs, 3).astype(np.float32) * 0.1
        dirs_s = refl[:, None] + jit
        dirs_s /= np.maximum(np.linalg.norm(dirs_s, axis=-1, keepdims=True), 1e-12)

        rates = []
        for dirs in (dirs_d, dirs_s):
            o = (pts[:, None] + dirs * 1e-5).reshape(-1, 3).astype(np.float32)
            d = dirs.reshape(-1, 3).astype(np.float32)
            _, _, _, hit = self.ray_tracer.trace_cpu(o, d)
            rates.append(float(np.mean(hit)))
        if reduce == "weighted":
            dn = self.mcfg.diffuse_sample_num
            sn = self.mcfg.specular_sample_num
            return (dn * rates[0] + sn * rates[1]) / (dn + sn)
        return max(rates) if reduce == "max" else min(rates)

    def _image_rays_np(self, K, pose, h, w):
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float32) + 0.5,
                             np.arange(h, dtype=np.float32) + 0.5)
        coords = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
        d_cam = coords @ np.linalg.inv(K).T
        R, t = pose[:, :3], pose[:, 3]
        rays_d = d_cam @ R
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o = np.broadcast_to(-R.T @ t, rays_d.shape).astype(np.float32)
        return rays_o.astype(np.float32), rays_d.astype(np.float32)

    def _construct_hit_batch(self, info) -> dict:
        """Trace every train pixel once on the host, keep hits (reference
        renderer.py:756-802)."""
        n, h, w, _ = info["imgs"].shape
        human = np.asarray(human_coordinate_poses(
            jnp.asarray(info["poses"]), self.cfg["fixed_camera"]))
        out = {k: [] for k in ["rays_o", "rays_d", "inters", "normals", "depth",
                               "human_poses", "rgb"]}
        for i in range(n):
            rays_o, rays_d = self._image_rays_np(info["Ks"][i], info["poses"][i], h, w)
            inters, normals, depth, hit = self.ray_tracer.trace_cpu(rays_o, rays_d)
            normals = -normals  # NeuS flip (reference renderer.py:722-723)
            rgb = info["imgs"][i].reshape(-1, 3).astype(np.float32) / 255.0
            out["rays_o"].append(rays_o[hit])
            out["rays_d"].append(rays_d[hit])
            out["inters"].append(inters[hit])
            out["normals"].append(normals[hit])
            out["depth"].append(depth[hit, None])
            out["human_poses"].append(np.broadcast_to(human[i], (h * w, 3, 4))[hit])
            out["rgb"].append(rgb[hit])
        batch = {k: np.concatenate(v, 0) for k, v in out.items()}
        n_hits = len(batch["rays_o"])
        rn = self.cfg["train_ray_num"]
        if 0 < n_hits < rn:
            # tiny scenes: tile the hit buffer up to one full batch so step
            # shapes stay static
            reps = -(-rn // n_hits)
            batch = {k: np.concatenate([v] * reps, 0)[:rn] for k, v in batch.items()}
        return batch

    def _shuffle(self, rng):
        idx = rng.permutation(self.tbn)
        for k in self.train_batch:
            self.train_batch[k] = self.train_batch[k][idx]

    def next_train_batch(self) -> dict:
        rn = self.cfg["train_ray_num"]
        if self._batch_i + rn > self.tbn:
            self._shuffle(self._rng)
            self._batch_i = 0
        sl = slice(self._batch_i, self._batch_i + rn)
        self._batch_i += rn
        return {k: jnp.asarray(v[sl]) for k, v in self.train_batch.items()}

    # -------------------------------------------------------------- training
    def make_train_step(self, optimizer: optax.GradientTransformation,
                        loss_names=None, donate: bool = True):
        mcfg, samples, trace_fn, cfg = self.mcfg, self.samples, self.trace_fn, self.cfg
        mesh = self.mesh
        loss_names = loss_names if loss_names is not None else cfg["loss"]
        rn = self.cfg["train_ray_num"]

        def step_fn(params, opt_state, key, step, train_data):
            # in-jit batch sampling from the device-resident hit store
            k_batch, key = jax.random.split(key)
            n = train_data["rays_o"].shape[0]
            idx = jax.random.randint(k_batch, (rn,), 0, n)
            batch = {k: v[idx] for k, v in train_data.items()}
            batch = constrain_rays(batch, mesh)

            def loss_fn(p):
                k_shade, k_reg = jax.random.split(key)
                colors, outputs = mc_shading_apply(
                    p, mcfg, samples, trace_fn, batch["inters"],
                    -batch["rays_d"], batch["normals"], batch["human_poses"],
                    key=k_shade)
                out = dict(outputs)
                out["loss_rgb"] = compute_rgb_loss(colors, batch["rgb"], cfg["rgb_loss"])
                if cfg["reg_mat"]:
                    out["loss_mat_reg"] = material_regularization(
                        p, mcfg, k_reg, batch["inters"], batch["normals"],
                        outputs["metallic"], outputs["roughness"],
                        outputs["albedo"], step)
                if cfg["reg_diffuse_light"]:
                    dl = outputs["diffuse_light"]
                    out["loss_diffuse_light"] = (
                        jnp.sum(jnp.abs(dl - jnp.mean(dl, axis=-1, keepdims=True)), -1)
                        * cfg["reg_diffuse_light_lambda"])
                log = compute_losses(loss_names, out, None, step, cfg)
                return total_loss(log), log

            (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            log = {k: jnp.mean(v) for k, v in log.items()}
            log["loss_total"] = loss
            return params, opt_state, log

        donate_args = (0, 1) if donate else ()
        return jax.jit(step_fn, donate_argnums=donate_args)

    # ------------------------------------------------------------ validation
    def make_shade_chunk(self):
        # validation/test renders always use the exact full-lattice inner-light
        # path (same policy as Stage I's shade_top_k: approximations train,
        # never evaluate)
        mcfg, samples, trace_fn = (self.mcfg._replace(inner_compact_frac=0.0,
                                                      outer_compact_frac=0.0),
                                   self.samples, self.trace_fn)

        def chunk_fn(params, pts, view_dirs, normals, human_poses):
            colors, outputs = mc_shading_apply(params, mcfg, samples, trace_fn,
                                               pts, view_dirs, normals,
                                               human_poses, key=None)
            keep = ["albedo", "metallic", "roughness", "specular_light",
                    "specular_color", "diffuse_light", "diffuse_color"]
            out = {k: outputs[k] for k in keep}
            out["rgb_pr"] = colors
            return out

        return jax.jit(chunk_fn)

    def test_step(self, params, index: int, step: int = 0, chunk_fn=None):
        if chunk_fn is None:
            chunk_fn = self.make_shade_chunk()
        info = {k: v[index:index + 1] for k, v in self.test_imgs_info.items()}
        h, w = info["imgs"].shape[1:3]
        rays_o, rays_d = self._image_rays_np(info["Ks"][0], info["poses"][0], h, w)
        inters, normals, depth, hit = self.ray_tracer.trace_cpu(rays_o, rays_d)
        normals = -normals
        human = np.asarray(human_coordinate_poses(
            jnp.asarray(info["poses"]), self.cfg["fixed_camera"]))[0]
        rgb_gt = info["imgs"][0].reshape(-1, 3).astype(np.float32) / 255.0

        keys = {"rgb_pr": 3, "specular_light": 3, "specular_color": 3,
                "diffuse_light": 3, "diffuse_color": 3, "albedo": 3,
                "metallic": 1, "roughness": 1}
        outputs = {k: np.zeros((h * w, d), np.float32) for k, d in keys.items()}

        hit_idx = np.nonzero(hit)[0]
        if len(hit_idx) == 0:  # view misses the object entirely
            outputs["rgb_gt"] = np.zeros((h * w, 3), np.float32)
            outputs["loss_rgb"] = np.zeros((h * w,), np.float32)
            return {k: (v.reshape(h, w, -1) if v.ndim == 2 and v.shape[0] == h * w else v)
                    for k, v in outputs.items()}
        trn = self.cfg["test_ray_num"]
        for ci in range(0, len(hit_idx), trn):
            sel = hit_idx[ci:ci + trn]
            n_pad = trn - len(sel)
            sel_pad = np.concatenate([sel, np.repeat(sel[-1:], n_pad)]) if n_pad else sel
            res = chunk_fn(params,
                           jnp.asarray(inters[sel_pad]),
                           jnp.asarray(-rays_d[sel_pad]),
                           jnp.asarray(normals[sel_pad]),
                           jnp.asarray(np.broadcast_to(human, (len(sel_pad), 3, 4))))
            res = jax.tree_util.tree_map(np.asarray, res)
            for k in keys:
                outputs[k][sel] = res[k][:len(sel)]
        # squared-roughness convention -> sqrt for display (reference renderer.py:879)
        outputs["roughness"] = np.sqrt(np.maximum(outputs["roughness"], 0.0))
        outputs["rgb_gt"] = np.where(hit[:, None], rgb_gt, 0.0)
        outputs["loss_rgb"] = np.asarray(compute_rgb_loss(
            jnp.asarray(outputs["rgb_pr"]), jnp.asarray(outputs["rgb_gt"]),
            self.cfg["rgb_loss"]))
        return {k: (v.reshape(h, w, -1) if v.ndim == 2 and v.shape[0] == h * w else v)
                for k, v in outputs.items()}

    # -------------------------------------------------------------- material
    def predict_materials(self, params=None, batch_size: int = 8192):
        """Per-vertex materials; roughness exported as sqrt (reference
        renderer.py:903-915)."""
        params = self.params if params is None else params
        verts = self.vertices
        fn = jax.jit(lambda p, x: predict_materials_mc(p, x))
        metallic, roughness, albedo = [], [], []
        for vi in range(0, len(verts), batch_size):
            chunk = verts[vi:vi + batch_size]
            n_pad = batch_size - len(chunk)
            if n_pad:
                chunk = np.concatenate([chunk, np.zeros((n_pad, 3), np.float32)])
            m, r, a = fn(params, jnp.asarray(chunk))
            n = batch_size - n_pad
            metallic.append(np.asarray(m)[:n])
            roughness.append(np.sqrt(np.maximum(np.asarray(r)[:n], 1e-7)))
            albedo.append(np.asarray(a)[:n])
        return {"metallic": np.concatenate(metallic, 0),
                "roughness": np.concatenate(roughness, 0),
                "albedo": np.concatenate(albedo, 0)}

    def predict_materials_at(self, points: np.ndarray, params=None) -> np.ndarray:
        """[N,3] pts -> [N,5] (albedo3, metallic, roughness) for texture baking."""
        params = self.params if params is None else params
        m, r, a = jax.jit(predict_materials_mc)(params, jnp.asarray(points, jnp.float32))
        return np.concatenate([np.asarray(a), np.asarray(m), np.asarray(r)], axis=1)

    def env_light(self, h: int, w: int, params=None, gamma: bool = True):
        params = self.params if params is None else params
        return np.asarray(env_light_image(params, self.mcfg, h, w, gamma))

    def get_step_input(self, step: int):
        """Per-step 5th argument of the train step: the device-resident hit
        store (constant across steps; the step samples its batch in-jit)."""
        return self.train_data

    def num_train_rays_per_step(self) -> int:
        return self.cfg["train_ray_num"]

    def make_render_chunk(self):
        return self.make_shade_chunk()
