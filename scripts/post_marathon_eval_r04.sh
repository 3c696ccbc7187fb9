#!/bin/bash
# Post-marathon checkpoint re-evaluation (round 4, CPU-only — never touches
# the TPU): when the 192px polish marathon exits, sweep the harvested
# keep-best checkpoints at 192px including the REAL coded-path bpp
# cross-check (est_vs_real_bpp from actual rANS streams), then refresh
# RESULTS.md and commit. Runs in parallel with the TPU bench battery.
set -u
cd "$(dirname "$0")/.."
PID=$(cat /tmp/rd_tpu.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
sleep 180   # let the harvest watcher's commit land first

SCRUB="env -u PALLAS_AXON_POOL_IPS"
$SCRUB JAX_PLATFORMS=cpu timeout 3600 python experiments/rd_eval.py \
  --profile mid --crops 192 --qps 8,20,32,44,56 \
  > logs/rd_eval_r04_final.log 2>&1
rc=$?
echo "[post-eval] rd_eval rc=$rc $(date)"

$SCRUB JAX_PLATFORMS=cpu python experiments/rd_report.py \
  > /dev/null 2>&1 || true

for i in 1 2 3 4 5; do
  git add artifacts/rd_eval.json artifacts/rd_eval_curves_192px.png \
          artifacts/rd_curves.png RESULTS.md logs/rd_eval_r04_final.log \
          2>/dev/null
  if git commit -m "Re-evaluate final 192px checkpoints: real-bitstream bpp cross-check (auto)" \
       -m "No-Verification-Needed: artifact/doc-only results recording" \
       > /dev/null 2>&1; then
    break
  fi
  sleep 30
done
echo "[post-eval] done $(date)"
