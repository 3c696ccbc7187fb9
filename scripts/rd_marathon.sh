#!/bin/bash
# RD marathon: fresh lambda-normalized tiny-profile run, then continuation
# cycles. Each stage saves checkpoints + partial artifacts, so the marathon
# is resumable at any cut point (rd_continue picks up artifacts/rd_ckpt_*).
cd /root/repo
LOG=logs/rd_marathon.log
echo "=== marathon start $(date) ===" >> "$LOG"
timeout 11000 python experiments/rd_full.py 200000 --budget-min 150 --profile tiny --lnorm >> "$LOG" 2>&1
echo "=== rd_full done $(date) rc=$? ===" >> "$LOG"
for i in 1 2 3 4 5 6 7 8; do
  timeout 8000 python experiments/rd_continue.py 200000 --budget-min 100 --profile tiny --lnorm >> "$LOG" 2>&1
  echo "=== continue cycle $i done $(date) rc=$? ===" >> "$LOG"
done
