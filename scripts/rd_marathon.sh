#!/bin/bash
# RD marathon: fresh lambda-normalized tiny-profile run with the
# recon_residual training aid (copy-prev bound from step 0), then
# continuation cycles. Interrupt-safe at every stage: pretrain_dmci saves
# artifacts/rd_ckpt_dmci_tiny (reused via --reuse-dmci on restart), the
# variant loops checkpoint every <=10 min, and rd_continue picks up
# artifacts/rd_ckpt_*_tiny-skip wherever the previous stage stopped.
# A collapse liveness gate aborts a doomed cycle at ~1k steps.
#
# All stages run with the axon env scrubbed so nothing ever dials the TPU
# relay (one-TPU-client rule; see memory/env-quirks).
cd /root/repo
LOG=logs/rd_marathon.log
SCRUB="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
echo "=== marathon start $(date) (recon-skip recipe) ===" >> "$LOG"
if [ ! -d artifacts/rd_ckpt_performance_tiny-skip ] || \
   [ ! -d artifacts/rd_ckpt_plain_tiny-skip ]; then
  $SCRUB timeout 11000 python experiments/rd_full.py 200000 \
    --budget-min 150 --profile tiny --lnorm --recon-skip --reuse-dmci \
    >> "$LOG" 2>&1
  echo "=== rd_full done $(date) rc=$? ===" >> "$LOG"
else
  echo "=== rd_full skipped (checkpoints exist) $(date) ===" >> "$LOG"
fi
for i in 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16; do
  $SCRUB timeout 8000 python experiments/rd_continue.py 200000 \
    --budget-min 100 --profile tiny --lnorm --recon-skip --seed "$i" \
    >> "$LOG" 2>&1
  echo "=== continue cycle $i done $(date) rc=$? ===" >> "$LOG"
done
