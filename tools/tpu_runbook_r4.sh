#!/bin/bash
# Round-4 TPU measurement queue — VERDICT r3 tasks, ordered fail-fast:
# smoke the hard-mode scenes at tiny scale, then the full 30k pipelines
# (mirror + capture, r3 Missing #1), the mirror tracer ablation, and the
# 30k fused-vs-rev quality A/B (r3 Weak #5 / task #9).
# Usage: bash tools/tpu_runbook_r4.sh [outdir]   (default data/r4_tpu)
set -u
OUT=${1:-data/r4_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/runbook.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log"
  echo "--- $name exit=$rc $(date +%H:%M:%S)" | tee -a "$OUT/runbook.log"
}

# 0. Fail-fast smokes: the capture (human_light + sphere_direction) and
#    mirror paths have never run e2e — surface breakage in minutes, not hours.
run smoke_mirror 1800 python -u tools/run_pipeline_demo.py --scene mirror \
  --steps1 300 --steps2 100 --res 64 --out data/smoke_mirror
run smoke_capture 1800 python -u tools/run_pipeline_demo.py --scene capture \
  --steps1 300 --steps2 100 --res 64 --out data/smoke_capture

# 1. Full hard-mode pipelines (VERDICT r3 missing #1 / next #1).
run demo_mirror 10800 python -u tools/run_pipeline_demo.py --scene mirror \
  --steps1 30000 --steps2 2500 --res 100 --out data/demo_mirror
run demo_capture 10800 python -u tools/run_pipeline_demo.py --scene capture \
  --steps1 30000 --steps2 2500 --res 100 --out data/demo_capture

# 2. Tracer ablation on the mirror mesh — where visibility error shows.
run ablate_mirror 7200 python -u tools/ablate_stage2_tracer.py \
  --scene mirror --out data/demo_mirror

# 3. Long fused-vs-rev quality A/B with geometry endpoints (VERDICT r3 #9).
run quality_grad_30k 10800 python -u tools/quality_grad_ab.py 30000

echo "runbook_r4 complete" | tee -a "$OUT/runbook.log"
