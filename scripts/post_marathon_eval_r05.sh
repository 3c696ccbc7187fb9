#!/bin/bash
# Round-5 post-marathon checkpoint evaluation (CPU-only, scrubbed env —
# never touches the tunnel, so it runs in parallel with the TPU bench
# battery). Produces:
#   * artifacts/rd_eval.json — all four -roisub variants at 192px
#     (estimated) + the est-vs-real bpp gap on TRAINED checkpoints at 64px
#     for performance,plain (VERDICT r04 #3: gap <5% everywhere)
#   * artifacts/mask_prop_value.json — fast-vs-mask_prop trade + mask
#     side-channel bpp
# then refreshes RESULTS.md and commits.
#
# Detach-safe:
#   setsid nohup bash scripts/post_marathon_eval_r05.sh < /dev/null \
#     > /dev/null 2>&1 & echo $! > /tmp/post_eval_r05.pid
set -u
cd "$(dirname "$0")/.."
LOG=logs/post_eval_r05.log
mkdir -p logs artifacts
echo "=== post-eval waiter start $(date) ===" >> "$LOG"

for i in $(seq 1 480); do
  [ -f /tmp/rd_marathon_r05_done ] && break
  sleep 30
done
echo "=== marathon done-marker seen $(date) ===" >> "$LOG"

SCRUB="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"

# 0. MASK_TRAIN phase: the marathon trains mask_prop with the RD loss only,
#    which reaches MaskPredictor just indirectly; the reference's dedicated
#    BCE-only phase (MASK_TRAIN) is run here post hoc so the evaluated
#    chain uses a predictor actually trained to predict masks.
$SCRUB timeout 2400 python experiments/mask_train_phase.py 2000 \
  --profile mid --crop 64 --batch 8 --budget-min 30 >> "$LOG" 2>&1
echo "=== mask_train rc=$? $(date) ===" >> "$LOG"

# 1. one sweep, both crops, all four variants: 192px estimated curves +
#    the est-vs-real bpp gap on TRAINED checkpoints via the 64px coded path
$SCRUB timeout 9000 python experiments/rd_eval.py \
  --profile mid --ckpt-extra -roisub --roi-subset \
  --variants performance,plain,fast,mask_prop \
  --crops 64,192 --qps 8,20,32,44,56 >> "$LOG" 2>&1
echo "=== rd_eval rc=$? $(date) ===" >> "$LOG"

# 2. mask_prop trade quantification at eval res
$SCRUB timeout 3600 python experiments/mask_prop_value.py \
  --profile mid --crop 192 >> "$LOG" 2>&1
echo "=== mask_prop_value rc=$? $(date) ===" >> "$LOG"

$SCRUB python experiments/rd_report.py >> "$LOG" 2>&1 || true
for i in 1 2 3 4 5; do
  git add artifacts/rd_eval.json artifacts/mask_train_phase.json \
          artifacts/mask_prop_value.json artifacts/rd_curves.png \
          artifacts/rd_eval_curves_*px.png RESULTS.md \
          logs/post_eval_r05.log 2>/dev/null
  if git commit -m "Post-marathon r05 checkpoint evaluation (auto)" \
       -m "No-Verification-Needed: artifact/doc-only results recording" \
       > /dev/null 2>&1; then
    break
  fi
  sleep 30
done
echo "=== post-eval done $(date) ===" >> "$LOG"
