"""Model-FLOPs-utilization accounting.

The reference has no profiling at all (reference train/train_valid.py:22 is a
wall-clock print); MFU is our own first-class metric: XLA's compiled cost
analysis gives FLOPs per step, divided by measured step time and the chip's
peak matmul throughput.

Peak numbers are the published bf16 MXU peaks (matmuls run with bf16 inputs /
f32 accumulation by default here, see Trainer.default_cfg matmul_precision).
"""
from __future__ import annotations

import jax

# device_kind -> peak bf16 FLOP/s per chip (dense), from published TPU specs
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}
_CPU_FALLBACK = 1e12  # nominal; MFU on CPU is not meaningful, avoid div0


def peak_flops_per_sec(device=None) -> float:
    device = device or jax.devices()[0]
    if device.platform != "tpu":
        return _CPU_FALLBACK
    return _PEAK_BF16.get(device.device_kind, 197e12)


def compiled_flops(jitted_fn, *args, **kwargs) -> float:
    """FLOPs of one invocation, from XLA's compiled cost analysis.

    Returns 0.0 if the backend doesn't expose cost analysis (never on
    TPU/CPU in this image).
    """
    try:
        ca = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def mfu(flops_per_step: float, step_time_s: float, device=None) -> float:
    if step_time_s <= 0 or flops_per_step <= 0:
        return 0.0
    return flops_per_step / step_time_s / peak_flops_per_sec(device)
