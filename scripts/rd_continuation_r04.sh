#!/bin/bash
# Round-4 RD continuation: resume the 330-min marathon's 30k-step mid-profile
# checkpoints (artifacts/rd_ckpt_*_mid-skip) and train at 128px crop.
#
# Why 128px: the marathon plateaued at 64px (performance score +0.04 over its
# final 6k steps) while evals run at 192px — the crop/eval resolution gap is
# the measured next bottleneck, and smoke_128px.py sizes the step budget.
# The DMCI anchor also continues (cosine from 3e-4) at the new crop.
#
# Usage: scripts/rd_continuation_r04.sh [budget_min] [steps]
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-330}
STEPS=${2:-24000}
mkdir -p logs
exec timeout $(( (BUDGET + 20) * 60 )) python experiments/rd_tpu.py \
  --budget-min "$BUDGET" --profile mid --k 100 --crop 128 --batch 16 \
  --steps "$STEPS" --lnorm --recon-skip --base-lr 4e-4 \
  --dmci-steps 12000 --dmci-lr 3e-4 \
  >> logs/rd_tpu_r04b.log 2>&1
