#!/bin/bash
# Round-3 TPU measurement queue — run when the TPU tunnel is back.
# Usage: bash tools/tpu_runbook.sh [outdir]   (default data/r3_tpu)
# Priority order: the items VERDICT r2 asked to be measured, cheapest-first
# within each goal so partial completion still yields usable numbers.
set -u
OUT=${1:-data/r3_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/runbook.log"
  timeout "$t" "$@" 2>&1 | tee "$OUT/$name.log" | tail -20
  echo "--- $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/runbook.log"
}

# 1. Batch scaling with the segmented per-ray occ selection (VERDICT r2 #1):
#    does rays/s now rise with batch?
run batch_scaling 2400 python -u tools/bench_stage1_ab.py batch

# 2. Driver metric, both stages (VERDICT r2 #2) — captures the compacted
#    inner-light path on the convex bench scene.
run bench 1800 python -u bench.py

# 3. Stage-II detail + march-refine sweep headroom.
run bench_stage2 1200 python -u tools/bench_stage2.py
run sweep_march 1800 python -u tools/sweep_march_samples.py

# 4. Pallas kernel A/Bs at 512 and 2048 rays (committed TPU-gated, unmeasured).
run ab_grad 2400 python -u tools/bench_stage1_ab.py grad
run ab_heads 2400 python -u tools/bench_stage1_ab.py heads

# 5. Roofline: compute- vs bandwidth-bound vs batch (tools/ceiling_stage1.py).
run ceiling 2400 python -u tools/ceiling_stage1.py rev 512 1024 2048 4096

# 6. Quality gates for whichever perf knobs the above recommend.
run quality_grad 3600 python -u tools/eval_bg_on_inner.py grad

# 7. Hard-mode scene pipelines (VERDICT r2 #5) — the long pole, last.
run demo_mirror 7200 python -u tools/run_pipeline_demo.py --scene mirror \
  --steps1 30000 --steps2 2500 --res 100 --out data/demo_mirror
run demo_capture 7200 python -u tools/run_pipeline_demo.py --scene capture \
  --steps1 30000 --steps2 2500 --res 100 --out data/demo_capture
run ablate_mirror 3600 python -u tools/ablate_stage2_tracer.py \
  --scene mirror --out data/demo_mirror

echo "runbook complete" | tee -a "$OUT/runbook.log"
