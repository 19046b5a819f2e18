"""Fused light kernel step-time A/B (Stage-II), XLA vs kernel, both scenes.

HLO-verified arms (core/mfu.py::assert_kernels): the fused arm must compile
nero_lights_*, the XLA arm must not — a silent fallback aborts instead of
measuring XLA against itself.

Usage: python tools/ab_lights.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ceiling_stage2 import run_variant  # noqa: E402


def main():
    for scene in ("bowl", "sphere"):
        base = {"diffuse_sample_num": 512, "specular_sample_num": 256,
                "human_lights": False, "outer_light_version": "direction"}
        run_variant(f"{scene}_lights_xla", scene=scene,
                    extra={"shader_cfg": dict(base, fused_lights=False)},
                    expect_kernels={"nero_lights_": False})
        run_variant(f"{scene}_lights_fused", scene=scene,
                    extra={"shader_cfg": dict(base, fused_lights=True)},
                    expect_kernels={"nero_lights_": True})


if __name__ == "__main__":
    main()
