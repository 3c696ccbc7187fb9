#!/bin/bash
# Watches the 192px polish marathon (PID in /tmp/rd_tpu.pid) and, when it
# exits, freezes the artifact, regenerates RESULTS.md and commits — so the
# harvest happens even if no interactive session is alive at the deadline
# (round-4 sessions have been dying on transient API errors).
#
# CPU-only: never touches the TPU (the driver's end-of-round bench needs the
# tunnel free and unwedged).
set -u
cd "$(dirname "$0")/.."
PID=$(cat /tmp/rd_tpu.pid 2>/dev/null || echo "")
[ -z "$PID" ] && exit 0
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
sleep 10   # let rd_tpu.py's final _save land

python - <<'EOF'
import json, shutil, sys
try:
    r = json.load(open("artifacts/rd_tpu.json"))
except Exception as e:
    sys.exit(f"no rd_tpu.json: {e}")
done = [v for v, c in r.get("variants", {}).items() if "estimated_rd" in c]
print(f"[watch-harvest] variants complete: {done}, crop={r.get('crop')}")
if r.get("crop") == 192 and done:
    shutil.copy("artifacts/rd_tpu.json", "artifacts/rd_tpu_r04c_harvest.json")
EOF

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python experiments/rd_report.py > /dev/null 2>&1 || true
git add artifacts/rd_tpu.json artifacts/rd_tpu_r04c_harvest.json \
        artifacts/rd_curves.png RESULTS.md logs/rd_tpu_r04c.log 2>/dev/null
git commit -m "Harvest 192px polish marathon artifacts (auto)" \
  -m "No-Verification-Needed: artifact/doc-only results recording" \
  > /dev/null 2>&1 || true
echo "[watch-harvest] done $(date)"
