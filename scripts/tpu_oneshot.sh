#!/bin/bash
# One-shot serialized TPU session: run the moment scripts/tpu_probe.sh says
# the relay is back. ONE client at a time, each step a separate process that
# fully exits before the next starts (tunnel-wedge hygiene — see
# memory/env-quirks). Logs to logs/tpu_oneshot_<ts>/.
set -u
TS=$(date +%Y%m%d_%H%M%S)
OUT="logs/tpu_oneshot_$TS"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# exclusive TPU-client lock for the whole session (bench.py shares this
# lockfile; SSGVC_TPU_LOCK_HELD tells children the parent already holds it)
exec 9>/tmp/ssgvc_tpu_client.lock
flock -n 9 || { echo "another TPU client holds the lock — aborting"; exit 1; }
export SSGVC_TPU_LOCK_HELD=1

step() {
  name=$1; shift
  echo "== $name: $*" | tee -a "$OUT/summary.log"
  timeout "$STEP_TIMEOUT" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "== $name rc=$rc" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  return $rc
}

# 0. relay probe (no PJRT client)
scripts/tpu_probe.sh || { echo "relay down — aborting"; exit 1; }

# 1. backend sanity (3 min cap)
STEP_TIMEOUT=240 step devices python -c "import jax; print(jax.devices())" \
  || { echo "backend init failed — aborting"; exit 1; }

# 2. the round's most precious artifact: the driver-format bench
STEP_TIMEOUT=900 step bench python bench.py

# 2b. serving-style chip fill: two independent 1080p streams per scan step
STEP_TIMEOUT=900 step bench_batch2 env SSGVC_BENCH_BATCH=2 python bench.py || true

# 2c. no-mask baseline: performance-variant runtime overhead vs plain
# (reference claims ~14%, README.md:7)
STEP_TIMEOUT=900 step bench_plain env SSGVC_BENCH_VARIANT=plain python bench.py || true

# 3. pallas_dcb Mosaic compile attempt (bounded; failure is non-fatal)
STEP_TIMEOUT=600 step pallas_compile python experiments/pallas_dcb_hw.py || true

# 4. pallas-enabled bench, only if step 3 succeeded
if [ -f "$OUT/pallas_compile.log" ] && grep -q "PALLAS_HW_OK" "$OUT/pallas_compile.log"; then
  STEP_TIMEOUT=900 step bench_pallas env SSGVC_PALLAS_DCB=1 python bench.py
fi

# 5. real-bitstream 1080p coded bench -> artifacts/bench_coded.json
STEP_TIMEOUT=1800 step bench_coded python experiments/bench_coded.py \
  --json artifacts/bench_coded.json --label default || true
STEP_TIMEOUT=1800 step bench_coded_skip python experiments/bench_coded.py \
  --skip 0.12 --json artifacts/bench_coded.json --label skip0.12 || true
STEP_TIMEOUT=1800 step bench_coded_ecpart python experiments/bench_coded.py \
  --ec-part --json artifacts/bench_coded.json --label ec_part || true
STEP_TIMEOUT=1800 step bench_coded_packed python experiments/bench_coded.py \
  --packed --skip 0.12 --json artifacts/bench_coded.json \
  --label packed_skip0.12 || true

echo "one-shot complete; logs in $OUT"
