#!/bin/bash
# Round-5 post-marathon bench battery: waits for the marathon's done-marker,
# then takes the tunnel for a short battery and releases it well before the
# driver's end-of-round bench. Each run is a separate bench.py process
# (orchestrator/worker with its own deadline), serialized via the lockfile.
#
# Detach-safe:
#   setsid nohup bash scripts/post_marathon_bench_r05.sh < /dev/null \
#     > /dev/null 2>&1 & echo $! > /tmp/post_bench_r05.pid
set -u
cd "$(dirname "$0")/.."
LOG=logs/post_bench_r05.log
mkdir -p logs artifacts
echo "=== post-bench waiter start $(date) ===" >> "$LOG"

# wait for the marathon (up to 4h), then grab the lock
for i in $(seq 1 480); do
  [ -f /tmp/rd_marathon_r05_done ] && break
  sleep 30
done
echo "=== marathon done-marker seen $(date) ===" >> "$LOG"

run() {
  name=$1; shift
  echo "== $name start $(date)" >> "$LOG"
  timeout 1000 env "$@" SSGVC_BENCH_DEADLINE=900 python bench.py \
    > "artifacts/bench_r05_$name.json.tmp" 2>> "$LOG"
  rc=$?
  tail -1 "artifacts/bench_r05_$name.json.tmp" \
    > "artifacts/bench_r05_$name.json"
  rm -f "artifacts/bench_r05_$name.json.tmp"
  echo "== $name rc=$rc: $(cat artifacts/bench_r05_$name.json)" >> "$LOG"
}

# 1. the round's headline config, freshly measured (what the driver reruns)
run default SSGVC_NOOP=1
# 2. scoped-VMEM experiment: deeper fusion headroom for the 1080p schedule
run vmem64 LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536
# 3. plain-variant overhead row refresh
run plain SSGVC_BENCH_VARIANT=plain

python - <<'PY' >> "$LOG" 2>&1
import json
out = {}
for name in ("default", "vmem64", "plain"):
    try:
        out[name] = json.load(open(f"artifacts/bench_r05_{name}.json"))
    except Exception as e:
        out[name] = {"error": str(e)}
d, p = out.get("default", {}), out.get("plain", {})
if d.get("value") and p.get("value"):
    out["performance_overhead_vs_plain_pct"] = round(
        (p["value"] - d["value"]) / d["value"] * 100, 1)
json.dump(out, open("artifacts/bench_r05_battery.json", "w"), indent=2)
print("battery:", {k: v.get("value") if isinstance(v, dict) else v
                   for k, v in out.items()})
PY

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python experiments/rd_report.py >> "$LOG" 2>&1 || true
git add artifacts/bench_r05_*.json RESULTS.md logs/post_bench_r05.log \
  2>/dev/null
git commit -m "Post-marathon r05 bench battery (auto)" \
  -m "No-Verification-Needed: artifact/doc-only results recording" \
  > /dev/null 2>&1 || true
echo "=== post-bench done $(date); tunnel free ===" >> "$LOG"
