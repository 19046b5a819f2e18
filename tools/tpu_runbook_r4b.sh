#!/bin/bash
# Round-4 TPU queue B — measurement + analysis after the hard-mode pipelines:
# Stage-II ceiling (VERDICT r3 next #3), Stage-I fused-mode roofline and
# shader-part bytes (next #4), the GlossyReal on-disk end-to-end run
# (next #5), and the driver bench with honest Pallas-FLOP MFU (next #2).
# Usage: bash tools/tpu_runbook_r4b.sh [outdir]   (default data/r4_tpu)
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

# 1. Stage-II ceiling: what binds the step (VERDICT r3 next #3).
run ceiling2_batch 2400 python -u tools/ceiling_stage2.py batch
run ceiling2_dirs 2400 python -u tools/ceiling_stage2.py dirs
run ceiling2_scene 2400 python -u tools/ceiling_stage2.py scene
run ceiling2_compact 2400 python -u tools/ceiling_stage2.py compact
run profile_stage2 1800 python -u tools/profile_stage2.py

# 2. Stage-I fused-mode roofline (r3 table was rev-only) + shader parts.
run ceiling1_fused 2400 python -u tools/ceiling_stage1.py fused 512 1024 2048 4096
run parts_bf16 1200 python -u tools/profile_core_parts.py --bf16
# heads A/B re-test: the r3 "no win" baseline was rev-grad (34.9 ms); with
# the fused grad default the shader share is larger
run ab_heads2 2400 python -u tools/bench_stage1_ab.py heads

# 3. Driver bench with the honest MFU accounting (both stages, both scenes).
run bench 2400 python -u bench.py

# 4. GlossyReal on-disk end-to-end (VERDICT r3 next #5).
run demo_real 10800 python -u tools/run_real_pipeline.py \
  --steps1 30000 --steps2 2500 --out data/demo_real

echo "runbook_r4b complete" | tee -a "$OUT/runbook.log"
