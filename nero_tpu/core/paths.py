"""Repo-root anchoring for on-disk artifacts.

CLIs may run from any working directory; paths that are conceptually
repo-owned (bundled assets, derived caches) must not silently re-materialise
per-cwd. Anything the *user* owns (data/model, data/meshes, ...) stays
cwd-relative, matching the reference's layout contract.
"""
from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def repo_path(*parts: str) -> str:
    return os.path.join(REPO_ROOT, *parts)
