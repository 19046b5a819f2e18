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
    """Total FLOPs of one invocation: XLA cost analysis + Pallas kernels.

    XLA's ``cost_analysis()`` reports 0 FLOPs for ``tpu_custom_call``, so a
    step whose hot math lives in a Pallas kernel looks artificially cheap
    (VERDICT r3: driver-visible Stage-I "MFU" fell 19%→13% the round the
    fused SDF-grad kernel became the default while the step got 18% faster).
    This sums both; use :func:`flops_breakdown` for the split.

    Returns 0.0 if the backend doesn't expose cost analysis.
    """
    b = flops_breakdown(jitted_fn, *args, **kwargs)
    return b["total"]


def flops_breakdown(jitted_fn, *args, **kwargs) -> dict:
    """{'xla', 'pallas', 'total', 'pallas_by_kernel', 'unknown_custom_calls'}.

    Pallas FLOPs come from each kernel's closed-form ``hlo_flops`` counter
    (static shapes; exact matmul counts), matched to the compiled module's
    ``tpu_custom_call`` instructions by kernel name + operand/result shapes.
    Limitation (same as XLA's own analysis): an instruction inside a
    while/scan body is counted once, not per trip — no kernel here is
    invoked inside a loop body.
    """
    out = {"xla": 0.0, "pallas": 0.0, "total": 0.0, "pallas_by_kernel": {},
           "unknown_custom_calls": 0}
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["xla"] = float(ca.get("flops", 0.0))
    except Exception:
        return out
    try:
        pallas, by_kernel, unknown = pallas_flops_of_text(compiled.as_text())
        out["pallas"] = pallas
        out["pallas_by_kernel"] = by_kernel
        out["unknown_custom_calls"] = unknown
    except Exception:
        pass
    out["total"] = out["xla"] + out["pallas"]
    return out


# modules that publish `hlo_flops(name, out_shapes, in_shapes) -> float|None`
_KERNEL_MODULES = (
    "nero_tpu.ops.pallas.sdf_grad_kernel",
    "nero_tpu.ops.pallas.sdf_kernel",
    "nero_tpu.ops.pallas.field_kernel",
    "nero_tpu.ops.pallas.march_kernel",
    "nero_tpu.ops.pallas.predictor_kernel",
    "nero_tpu.ops.pallas.shader_kernel",
    "nero_tpu.ops.pallas.light_kernel",
)


def pallas_flops_of_text(hlo_text: str):
    """Sum analytic FLOPs over every tpu_custom_call in compiled HLO text.

    Returns (total_flops, {kernel_name: flops}, n_unmatched_calls). Kernel
    identity comes from the pallas_call ``name=`` (visible in the op_name
    metadata as ".../<name>/pallas_call"); shapes come from the instruction's
    result type and operand_layout_constraints.
    """
    import importlib
    import re

    counters = [importlib.import_module(m).hlo_flops for m in _KERNEL_MODULES]
    shape_re = re.compile(r"[a-z]+[0-9]+\[([0-9,]*)\]")
    name_re = re.compile(r'op_name="[^"]*?([A-Za-z0-9_]+)/pallas_call')

    total, by_kernel, unknown = 0.0, {}, 0
    for line in hlo_text.splitlines():
        if 'custom_call_target="tpu_custom_call"' not in line:
            continue
        head, _, tail = line.partition(" custom-call")
        outs = [tuple(int(d) for d in m.group(1).split(",") if d)
                for m in shape_re.finditer(head.split("=", 1)[-1])]
        opconst = re.search(r"operand_layout_constraints=\{([^}]*)\}", tail)
        ins = [tuple(int(d) for d in m.group(1).split(",") if d)
               for m in shape_re.finditer(opconst.group(1))] if opconst else []
        nm = name_re.search(tail)
        if nm:
            name = nm.group(1)
        else:
            # fall back to the HLO instruction name (XLA names the
            # custom-call after the pallas_call, plus a ".N" suffix)
            im = re.match(r"\s*(?:ROOT\s+)?%([A-Za-z0-9_]+?)(?:\.\d+)?\s*$",
                          head.split("=", 1)[0])
            name = im.group(1) if im else ""
        flops = None
        for counter in counters:
            flops = counter(name, outs, ins)
            if flops is not None:
                break
        if flops is None:
            unknown += 1
        else:
            total += flops
            by_kernel[name] = by_kernel.get(name, 0.0) + flops
    return total, by_kernel, unknown


def assert_kernels(names_or_fn, expect: dict, label: str = "", *args, **kwargs):
    """Abort unless each Pallas kernel-name PREFIX matches its expectation.

    ``expect`` maps a kernel-name prefix (e.g. ``"nero_shader"``) to True
    (must be present in the compiled program) or False (must be absent).
    ``names_or_fn`` is either an iterable of compiled kernel names (the keys
    of ``flops_breakdown``'s ``pallas_by_kernel``) or a jitted callable —
    in which case it is lowered with ``*args, **kwargs`` and the names are
    extracted from the compiled HLO here.

    This is the structural fix for the round-3 self-vs-self A/B: a variant
    whose config silently fell back (``fused_heads`` passed where nothing
    read it) benchmarked XLA against itself and published "neutral". Every
    A/B arm now states which kernels its configuration MUST (not) compile
    to, verified against the actual HLO, so a vacuous arm raises instead
    of measuring.

    Returns the compiled kernel names for logging.
    """
    if callable(names_or_fn):
        names = list(flops_breakdown(names_or_fn, *args, **kwargs)
                     ["pallas_by_kernel"])
    else:
        names = list(names_or_fn)
    for prefix, want in expect.items():
        have = any(n.startswith(prefix) for n in names)
        if have != want:
            raise AssertionError(
                f"{label or 'A/B arm'}: kernel {prefix!r} present={have}, "
                f"expected present={want} — the arm is not measuring what "
                f"it claims (compiled Pallas kernels: {names or 'none'}, "
                f"backend={jax.default_backend()})")
    return names


def mfu(flops_per_step: float, step_time_s: float, device=None) -> float:
    if step_time_s <= 0 or flops_per_step <= 0:
        return 0.0
    return flops_per_step / step_time_s / peak_flops_per_sec(device)
