#!/bin/bash
# Round-5 TPU queue — the remaining VERDICT r4 measurements:
#  #9 fused Stage-II light kernel: HLO-verified step A/B + training gate
#  #2 wide-K march topology: agreement gate + step A/B on the concave bowl
#  #3 Stage-I operating point with the whole-shader kernel on (512-4096)
#     + component decomposition (trace_stage1 hangs under the axon tunnel)
#  #7 GlossyReal 'ours' convergence arm (ref arm: 200 steps / 128 rays,
#     data/ref_convergence.json)
# then the driver bench refresh. Serialized: one chip.
# Usage: bash tools/tpu_runbook_r5.sh [outdir]   (default data/r5_tpu)
set -u
OUT=${1:-data/r5_tpu}
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

# 1. fused Stage-II light kernel: step-time A/B, both scenes (VERDICT #9)
run ab_lights 2400 python -u tools/ab_lights.py

# 2. wide-K march topology: quality gate + HLO-verified step A/B (VERDICT #2)
run ab_topology_bowl 3600 python -u tools/ab_sphere_march.py topology bowl

# 3. light-kernel training-quality gate: 2.5k-step bowl A/B (VERDICT #9)
run quality_lights 7200 python -u tools/quality_lights_ab.py 2500

# 4. Stage-I operating point with the shader kernel on (VERDICT #3)
run ceiling1_r5 2400 python -u tools/ceiling_stage1.py fused 512 1024 2048 4096
run parts_r5 1800 python -u tools/profile_core_parts.py --bf16
run profile1_r5 1800 python -u tools/profile_stage1.py

# 5. GlossyReal 'ours' convergence arm, matching the recorded ref arm
run conv_ours_human 3600 python -u tools/compare_reference_convergence.py \
  --which ours --human_light --steps 200 --rays 128

# 6. driver bench refresh with whatever defaults survived the gates
run bench_r5 2400 python -u bench.py

echo "runbook_r5 complete" | tee -a "$OUT/runbook.log"
