"""YAML config loading.

Keeps the reference's flat-YAML-over-default-dict convention
(reference utils/base_utils.py:286-288 and the `{**default_cfg, **cfg}`
merge used by every component) so the configs/ corpus stays verbatim
compatible with the reference CLI.
"""
from __future__ import annotations

import yaml


def load_cfg(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def merge_cfg(default_cfg: dict, cfg: dict) -> dict:
    return {**default_cfg, **cfg}
