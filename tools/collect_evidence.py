"""Collect small measurement-evidence artifacts into tracked data/evidence/.

Every numeric table in IMPLEMENTATION_NOTES should be backed by a tracked
artifact (VERDICT r3 missing #4 — data/ was fully gitignored, so the JSONs
behind the notes' tables vanished between rounds). This copies the known
small artifacts (demo reports, ablations, convergence curves, quality gates)
into data/evidence/<flattened-name>, which .gitignore whitelists. Bulk data
(images, checkpoints, caches) is deliberately NOT collected.

Usage: python tools/collect_evidence.py   (then `git add data/evidence`)
"""
import glob
import os
import shutil

PATTERNS = [
    "data/demo*/report.json",
    "data/demo*/tracer_ablation.json",
    "data/smoke_*/report.json",
    "data/ref_convergence.json",
    "data/quality_grad_ab_*.json",
    "data/texel_utilization.json",
]


def main():
    os.makedirs("data/evidence", exist_ok=True)
    copied = []
    for pattern in PATTERNS:
        for src in sorted(glob.glob(pattern)):
            flat = src[len("data/"):].replace("/", "_")
            dst = f"data/evidence/{flat}"
            shutil.copyfile(src, dst)
            copied.append(dst)
    for c in copied:
        print(c)
    if not copied:
        print("nothing found to collect")


if __name__ == "__main__":
    main()
