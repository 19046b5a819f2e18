"""Measure the PSNR delta of the bg_on_inner fast path on a trained checkpoint.

Loads the Stage-I bowl checkpoint (trained with full-lattice background
semantics) and renders the validation view with bg_on_inner True vs False.
The PSNR difference is the approximation error of skipping the background
NeRF on the inner lattice.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nero_tpu.core.checkpoint import load_checkpoint
    from nero_tpu.models.shape import NeROShapeModel
    from nero_tpu.utils.color import color_map_backward
    from nero_tpu.utils.image import compute_psnr
    import numpy as np

    ckpt = "data/demo_bowl/model/demo_shape/model.npz"
    base_cfg = {
        "name": "eval_bg", "network": "shape",
        "database_name": "proc/bowl/100_12",
        "loss": ["nerf_render"], "key_metric_name": "psnr",
        "downsample_ratio": 0.5,
    }
    imgs = {}
    gt = None
    for bg_on_inner in (True, False):
        cfg = dict(base_cfg, bg_on_inner=bg_on_inner)
        model = NeROShapeModel(cfg, training=True)
        _, _, params, _ = load_checkpoint(ckpt, model.params)
        out = model.test_step(params, 0, step=30000)
        gt = color_map_backward(np.asarray(out["gt_rgb"]))
        pred = color_map_backward(np.asarray(out["ray_rgb"]))
        psnr = compute_psnr(gt, pred)
        imgs[bg_on_inner] = pred
        print(f"bg_on_inner={bg_on_inner}: PSNR vs gt = {psnr:.4f}", flush=True)
    # direct image-vs-image delta between the two renders
    x = imgs[True].astype(np.float64)
    y = imgs[False].astype(np.float64)
    mse = np.mean((x - y) ** 2)
    print(f"render-vs-render PSNR = {10 * np.log10(255.0 ** 2 / max(mse, 1e-12)):.2f} dB, "
          f"max |delta| = {np.abs(x - y).max():.1f}/255")


if __name__ == "__main__":
    main()
