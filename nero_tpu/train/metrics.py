"""Validation metrics: PSNR/SSIM + side-by-side visualisation JPEG dumps.

Parity target: reference network/metrics.py — `name2metrics` with
'shape_render' / 'mat_render', key metric 'psnr', and the per-image JPEG
grids written to data/train_vis/<model>/<step>-index-<i>.jpg. Runs on host
(numpy) after device outputs are fetched.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from nero_tpu.utils.color import color_map_backward
from nero_tpu.utils.image import compute_psnr, compute_ssim, concat_images_list, imsave


def _to_img(data, h, w):
    img = color_map_backward(np.asarray(data))
    img = img.reshape([h, w, -1])
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img


def _material_panels(data_pr, h, w):
    keys = ["diffuse_albedo", "diffuse_light", "diffuse_color",
            "specular_albedo", "specular_light", "specular_color", "specular_ref",
            "metallic", "roughness", "occ_prob", "indirect_light"]
    imgs = [_to_img(data_pr[k], h, w) for k in keys if k in data_pr]
    if not imgs:
        return []
    return [concat_images_list(*imgs[0:3]), concat_images_list(*imgs[3:7]),
            concat_images_list(*imgs[7:])]


def shape_render_metrics(data_pr, data_gt, step, *, data_index, model_name,
                         vis_dir="data/train_vis"):
    rgb_gt = color_map_backward(np.asarray(data_pr["gt_rgb"]))
    rgb_pr = color_map_backward(np.asarray(data_pr["ray_rgb"]))
    h, w, _ = rgb_pr.shape
    psnr = compute_psnr(rgb_gt, rgb_pr)
    ssim = compute_ssim(rgb_gt, rgb_pr)
    imgs = [rgb_gt, rgb_pr, _to_img(data_pr["normal"], h, w)]
    if "human_light" in data_pr:
        imgs.append(_to_img(data_pr["human_light"], h, w))
    panels = [concat_images_list(*imgs)] + _material_panels(data_pr, h, w)
    out_dir = Path(vis_dir) / model_name
    out_dir.mkdir(exist_ok=True, parents=True)
    imsave(str(out_dir / f"{step}-index-{data_index}.jpg"),
           concat_images_list(*panels, vert=True))
    return {"psnr": np.asarray([psnr]), "ssim": np.asarray([ssim])}


def mat_render_metrics(data_pr, data_gt, step, *, data_index, model_name,
                       vis_dir="data/train_vis"):
    rgb_gt = color_map_backward(np.asarray(data_pr["rgb_gt"]))
    rgb_pr = color_map_backward(np.asarray(data_pr["rgb_pr"]))
    h, w, _ = rgb_pr.shape
    psnr = compute_psnr(rgb_gt, rgb_pr)
    ssim = compute_ssim(rgb_gt, rgb_pr)
    imgs = [rgb_gt, rgb_pr]
    for k in ["albedo", "metallic", "roughness", "specular_light", "specular_color",
              "diffuse_light", "diffuse_color"]:
        if k in data_pr:
            imgs.append(_to_img(data_pr[k], h, w))
    panels = [concat_images_list(*imgs[:5]), concat_images_list(*imgs[5:])]
    out_dir = Path(vis_dir) / model_name
    out_dir.mkdir(exist_ok=True, parents=True)
    imsave(str(out_dir / f"{step}-index-{data_index}.jpg"),
           concat_images_list(*panels, vert=True))
    return {"psnr": np.asarray([psnr]), "ssim": np.asarray([ssim])}


name2metrics = {
    "shape_render": shape_render_metrics,
    "mat_render": mat_render_metrics,
}


def psnr_key_metric(results: dict) -> float:
    return float(np.mean(results["psnr"]))


name2key_metrics = {
    "psnr": psnr_key_metric,
}
