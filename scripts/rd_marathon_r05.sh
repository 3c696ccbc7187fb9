#!/bin/bash
# Round-5 RD marathon: the three training deliverables VERDICT r04 asked for,
# serialized on the one TPU with hard stage deadlines so the tunnel is FREE
# again ~3h after launch (the driver's end-of-round bench must find it idle —
# the r04 rc=124 postmortem is consistent with a detached marathon still
# holding the tunnel when the driver ran).
#
#   A. roi_subset, rd-mid, FOUR variants (adds fast + mask_prop RD — the
#      first RD numbers for either) at crop 64/bs 32 with the widened QP
#      sampler (20% extreme draws) + 20x gain ramp.
#   B. 192px polish of the same four checkpoints (training at eval res).
#   C. rd-half (ch_d=128) performance+plain pair — the scale-up step.
#
# Detach-safe:
#   setsid nohup bash scripts/rd_marathon_r05.sh < /dev/null \
#     > /dev/null 2>&1 & echo $! > /tmp/rd_marathon_r05.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p logs artifacts
LOG=logs/rd_marathon_r05.log
echo "=== r05 marathon start $(date) ===" >> "$LOG"

# exclusive tunnel lock for the whole marathon (children see LOCK_HELD)
exec 9>/tmp/ssgvc_tpu_client.lock
flock -n 9 || { echo "tunnel busy — aborting" >> "$LOG"; exit 1; }
export SSGVC_TPU_LOCK_HELD=1

# Stage A: fresh 4-variant roisub train @64px (wall ~= 1.85 * budget)
echo "=== stage A $(date) ===" >> "$LOG"
timeout 100m python experiments/rd_tpu.py \
  --budget-min 45 --profile mid --k 100 --crop 64 --batch 32 \
  --steps 60000 --lnorm --recon-skip --roi-subset \
  --variants performance,plain,fast,mask_prop \
  --base-lr 7e-4 --out artifacts/rd_tpu_r05a.json >> "$LOG" 2>&1
echo "=== stage A rc=$? $(date) ===" >> "$LOG"

# Stage B: 192px polish, resuming stage A's checkpoints (same ckpt paths)
echo "=== stage B $(date) ===" >> "$LOG"
timeout 60m python experiments/rd_tpu.py \
  --budget-min 26 --profile mid --k 50 --crop 192 --batch 8 \
  --steps 120000 --lnorm --recon-skip --roi-subset \
  --variants performance,plain,fast,mask_prop \
  --base-lr 3e-4 --dmci-steps 6000 \
  --out artifacts/rd_tpu_r05b.json >> "$LOG" 2>&1
echo "=== stage B rc=$? $(date) ===" >> "$LOG"

# Stage C: rd-half scale-up pair (wall ~= 1.0 * budget)
echo "=== stage C $(date) ===" >> "$LOG"
timeout 55m python experiments/rd_tpu.py \
  --budget-min 45 --profile half --k 50 --crop 64 --batch 16 \
  --steps 60000 --lnorm --recon-skip --roi-subset \
  --variants performance,plain \
  --base-lr 5e-4 --out artifacts/rd_tpu_r05c.json >> "$LOG" 2>&1
echo "=== stage C rc=$? $(date) ===" >> "$LOG"

echo "=== r05 marathon done $(date); tunnel released ===" >> "$LOG"
touch /tmp/rd_marathon_r05_done

# CPU-only self-harvest (scrubbed env — never re-touches the tunnel): commit
# the artifacts even if no interactive session is alive.
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python experiments/rd_report.py >> "$LOG" 2>&1 || true
git add artifacts/rd_tpu_r05*.json artifacts/rd_curves.png RESULTS.md \
        logs/rd_marathon_r05.log 2>/dev/null
git commit -m "Harvest r05 RD marathon artifacts (auto)" \
  -m "No-Verification-Needed: artifact/doc-only results recording" \
  > /dev/null 2>&1 || true
echo "=== self-harvest done $(date) ===" >> "$LOG"
