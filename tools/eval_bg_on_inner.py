"""Measure the PSNR delta of renderer config variants on a trained checkpoint.

Loads the Stage-I bowl checkpoint and renders the validation view under each
variant; reports PSNR vs gt and render-vs-render PSNR against the first
variant. Used to gate fast-math renderer options (bg_on_inner, bf16_hidden)
on real quality evidence rather than assumptions.

Usage:
  python tools/eval_bg_on_inner.py                 # bg_on_inner True vs False
  python tools/eval_bg_on_inner.py bf16            # bf16_hidden off vs on
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT_SETS = {
    "bg": [("bg_full", {"bg_on_inner": True}), ("bg_outer_only", {"bg_on_inner": False})],
    "bf16": [("f32_hidden", {"bf16_hidden": False}), ("bf16_hidden", {"bf16_hidden": True})],
    # rev-mode VJP spatial gradient vs the fused Pallas SDF-with-grad kernel
    "grad": [("grad_rev", {"sdf_grad_mode": "rev"}), ("grad_fused", {"sdf_grad_mode": "fused"})],
}


def main():
    from nero_tpu.core.checkpoint import load_checkpoint
    from nero_tpu.models.shape import NeROShapeModel
    from nero_tpu.utils.color import color_map_backward
    from nero_tpu.utils.image import compute_psnr
    import numpy as np

    which = sys.argv[1] if len(sys.argv) > 1 else "bg"
    variants = VARIANT_SETS[which]

    ckpt = "data/demo_bowl/model/demo_shape/model.npz"
    base_cfg = {
        "name": "eval_variant", "network": "shape",
        "database_name": "proc/bowl/100_12",
        "loss": ["nerf_render"], "key_metric_name": "psnr",
        "downsample_ratio": 0.5,
    }
    ref = None
    for name, extra in variants:
        cfg = dict(base_cfg, **extra)
        model = NeROShapeModel(cfg, training=True)
        if extra.get("sdf_grad_mode") is not None:
            # off-TPU, 'fused' silently resolves to 'rev' and the A/B is a
            # no-op — fail loudly instead (ADVICE r3)
            assert model.scfg.grad_mode == extra["sdf_grad_mode"], (
                f"{name}: sdf_grad_mode={extra['sdf_grad_mode']!r} resolved "
                f"to {model.scfg.grad_mode!r}")
        _, _, params, _ = load_checkpoint(ckpt, model.params)
        out = model.test_step(params, 0, step=30000)
        gt = color_map_backward(np.asarray(out["gt_rgb"]))
        pred = color_map_backward(np.asarray(out["ray_rgb"]))
        psnr = compute_psnr(gt, pred)
        print(f"{name}: PSNR vs gt = {psnr:.4f}", flush=True)
        if ref is None:
            ref = pred.astype(np.float64)
        else:
            mse = np.mean((pred.astype(np.float64) - ref) ** 2)
            print(f"render-vs-render PSNR = {10 * np.log10(255.0 ** 2 / max(mse, 1e-12)):.2f} dB, "
                  f"max |delta| = {np.abs(pred - ref).max():.1f}/255")


if __name__ == "__main__":
    main()
