#!/bin/bash
# End-of-round RD harvest: stop the marathon cleanly, re-evaluate the final
# checkpoints at both resolutions, refresh the coded-bench row and
# RESULTS.md. Run ~60-90 min before the round deadline.
#
#   bash scripts/rd_harvest.sh [marathon_pgid]
#
# The marathon checkpoints every <=10 min, so stopping it mid-cycle loses
# almost nothing; rd_continue can resume from artifacts/rd_ckpt_* any time.
set -u
cd /root/repo
SCRUB="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"

PGID="${1:-$(cat /tmp/marathon.pid 2>/dev/null || true)}"
if [ -n "${PGID}" ] && kill -0 -- "-${PGID}" 2>/dev/null; then
  echo "[harvest] stopping marathon process group ${PGID}"
  kill -TERM -- "-${PGID}"
  sleep 10
  kill -KILL -- "-${PGID}" 2>/dev/null
else
  echo "[harvest] no live marathon (pgid '${PGID:-none}')"
fi

echo "[harvest] rd_eval at 64px (train res) + 192px (MS-SSIM), full QP range"
$SCRUB timeout 6000 python experiments/rd_eval.py --profile tiny \
  --crops 64,192 --qps 0,8,20,32,44,56,63 2>&1 | tail -30

echo "[harvest] rANS microbench"
$SCRUB timeout 600 python experiments/bench_rans.py 2>&1 | tail -1 || true

echo "[harvest] coded-pipeline bench row (CPU provenance)"
$SCRUB timeout 1800 python experiments/bench_coded.py 4 --profile tiny \
  --res 256x256 --json artifacts/bench_coded.json 2>&1 | tail -5 || true

echo "[harvest] RD trajectory from the marathon log"
python experiments/rd_trajectory.py || true

echo "[harvest] regenerate RESULTS.md"
$SCRUB timeout 600 python experiments/rd_report.py

echo "[harvest] done — review artifacts/ + RESULTS.md, update README, commit"
