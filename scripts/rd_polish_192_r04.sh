#!/bin/bash
# Round-4 run 2: polish at 192px — the EVAL resolution — resuming run 1's
# 128px keep-best checkpoints (artifacts/rd_ckpt_*_mid-skip). Run 1 showed
# the chip does 24k steps / 12 min per variant at 128px/bs16, so resolution,
# not step count, is the binding constraint; training at eval res removes
# the last train/eval distribution gap. bs 8 keeps activation volume near
# the smoke-tested 128px/bs16 envelope.
#
# Usage: scripts/rd_polish_192_r04.sh [budget_min] [steps]
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-170}
STEPS=${2:-120000}
mkdir -p logs
exec timeout $(( (BUDGET + 20) * 60 )) python experiments/rd_tpu.py \
  --budget-min "$BUDGET" --profile mid --k 100 --crop 192 --batch 8 \
  --steps "$STEPS" --lnorm --recon-skip --base-lr 3e-4 \
  --dmci-steps 24000 --dmci-lr 2e-4 \
  >> logs/rd_tpu_r04c.log 2>&1
