"""Stage-II training throughput benchmark (standalone runner).

Delegates to bench.bench_stage2 (the driver-visible benchmark) so the
standalone tool and bench.py can never diverge. Prints one JSON line:
points/s, step ms, MFU, and effective traced-rays/s inside the step.
Reference workload: configs/material/syn/*.yaml (SURVEY.md §6).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_stage2  # noqa: E402


if __name__ == "__main__":
    print(json.dumps(bench_stage2()))
