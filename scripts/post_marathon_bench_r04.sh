#!/bin/bash
# Post-marathon TPU bench battery (round 4): waits for the 192px polish
# marathon (PID in /tmp/rd_tpu.pid) to exit AND for the CPU-side harvest to
# land, then serializes — under the shared TPU-client lock — the benches that
# need the chip:
#   1. bench.py           (single-stream headline, banked as bench_r04_final)
#   2. SSGVC_BENCH_BATCH=2/4  (serving throughput: independent 1080p streams)
#   3. SSGVC_BENCH_VARIANT=plain  (performance-variant overhead vs the
#      reference's ~14% claim, reference README.md:7)
# Each step is a separate process that fully exits before the next starts
# (tunnel-wedge hygiene). Artifacts + a commit happen even if no interactive
# session is alive.
set -u
cd "$(dirname "$0")/.."
PID=$(cat /tmp/rd_tpu.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
sleep 240   # let the CPU harvest watcher finish + final _save land

exec 9>/tmp/ssgvc_tpu_client.lock
flock -w 600 9 || { echo "TPU lock busy after 10 min — aborting"; exit 1; }
export SSGVC_TPU_LOCK_HELD=1

run() {  # run <outfile> <env...>
  out=$1; shift
  echo "== $out: $*"
  env "$@" timeout 900 python bench.py > "artifacts/$out" 2> "logs/${out%.json}.err"
  rc=$?
  echo "== rc=$rc"; tail -1 "artifacts/$out" || true
}

mkdir -p artifacts logs
run bench_r04_final.json    SSGVC_BENCH_BATCH=1
run bench_r04_b2.json       SSGVC_BENCH_BATCH=2
run bench_r04_b4.json       SSGVC_BENCH_BATCH=4
run bench_r04_plain.json    SSGVC_BENCH_VARIANT=plain SSGVC_BENCH_BATCH=1

flock -u 9   # release before any CPU-side reporting

python - <<'EOF'
import json
rows = {}
for name in ("bench_r04_final", "bench_r04_b2", "bench_r04_b4", "bench_r04_plain"):
    try:
        # bench.py's stdout can carry a leading xla_bridge WARNING line on
        # the axon runtime — the JSON result is the last non-empty line
        lines = [l for l in open(f"artifacts/{name}.json") if l.strip()]
        rows[name] = json.loads(lines[-1])
    except Exception as e:
        rows[name] = {"error": str(e)}
single = rows["bench_r04_final"].get("value", 0)
plain = rows["bench_r04_plain"].get("value", 0)
if single and plain:
    rows["performance_overhead_vs_plain_pct"] = round((plain / single - 1) * 100, 1)
with open("artifacts/bench_r04_battery.json", "w") as f:
    json.dump(rows, f, indent=2)
print(json.dumps(rows, indent=2)[:800])
EOF

git add artifacts/bench_r04_*.json logs/bench_r04_*.err 2>/dev/null
git commit -m "Post-marathon bench battery: single/multi-stream + plain-variant overhead (auto)" \
  -m "No-Verification-Needed: artifact-only results recording" \
  > /dev/null 2>&1 || true
echo "[post-bench] done $(date)"
