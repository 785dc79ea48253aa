#!/usr/bin/env bash
# Round-4b TPU measurement queue (second half of the round): the corrected
# SD/SDXL MFU accounting and the f8 KV-cache option. SEQUENTIAL (never two
# TPU clients at once — the axon relay wedges); logs to $OUT; re-runnable
# (each stage skips itself if its log ends with DONE rc=0).
set -u
OUT="${OUT:-/tmp/tpum4}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run_stage() { # name timeout_s cmd...
  local name="$1" t="$2"; shift 2
  local log="$OUT/$name.log"
  if [ -f "$log" ] && tail -1 "$log" | grep -q "^DONE rc=0"; then
    echo "[skip] $name (already DONE)"; return 0
  fi
  echo "[run ] $name -> $log"
  { echo "# $(date -u +%FT%TZ) $*"; timeout "$t" "$@"; rc=$?;
    echo; echo "DONE rc=$rc"; } >"$log" 2>&1
}

# 1. corrected MFU accounting (delta-method marginal step + 1-step flops)
run_stage sd21_512_fixed 3600 python bench.py --config sd21 --size 512
run_stage sdxl_1024_fixed 3600 python bench.py --config sdxl-turbo --size 1024

# 2. SD/SDXL MFU gap study with the fixed two-depth conv microbench
run_stage sd_mfu_prof 3600 python scripts/prof_sd_mfu.py 512
run_stage sdxl_mfu_prof 5400 python scripts/prof_sd_mfu.py --sdxl 1024

# 3. f8 KV cache: long-form first (the target: >=5.5x realtime at 2500
#    steps), then the v2 short-form and the bf16 controls from the same
#    session for a clean comparison
FGT_MG_KV=f8 run_stage mg_f8_2500 7200 \
  python bench.py --config musicgen-e2e --steps 2500
run_stage mg_bf16_2500 7200 python bench.py --config musicgen-e2e --steps 2500
FGT_MG_KV=f8 run_stage mg_f8_200 5400 \
  python bench.py --config musicgen-e2e --steps 200
run_stage mg_bf16_200 5400 python bench.py --config musicgen-e2e --steps 200

echo "all stages done: $OUT"
