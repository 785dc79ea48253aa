#!/usr/bin/env bash
# Round-4 TPU measurement queue. SEQUENTIAL (never two TPU clients at once —
# the axon relay wedges) and logs to $OUT (default /tmp/tpum4). Re-runnable:
# each stage skips itself if its log already ends with DONE rc=0.
#
# Stages (VERDICT r3 "next round" items):
#   1. dreambooth bench      -> #3 training as a driver-visible bench
#   2. sd21 + sdxl MFU       -> #4 honest SD/SDXL FLOP accounting
#   3. flux e2e W8A8+pallas  -> #1 fused W8A8 kernel (target <= 0.35 s)
#   4. flux e2e W8A8 control -> #1 (XLA W8A8 path, FGT_PALLAS_W8A8=0)
#   5. flux 2048 W8A8+pallas -> #1 (target <= 12.5 s)
#   6. flux-dev 1024 25-step -> #5 serving-depth, int8 weight-only
#   7. flux-dev 1024 25-step W8A8 -> #5
#   8. musicgen e2e v3 short/long + v1 long control + batched AR -> #2
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

# 1. training as a first-class bench (claimed 485 ms/step r2)
run_stage dreambooth 3600 python bench.py --config dreambooth

# 2. SD/SDXL with XLA-cost-analysis MFU columns
run_stage sd21_512 3600 python bench.py --config sd21 --size 512
run_stage sdxl_1024 3600 python bench.py --config sdxl-turbo --size 1024

# 3/4. flux 512^2 e2e: the three W8A8 activation-quant formulations
FGT_W8A8=1 FGT_W8A8_IMPL=pq run_stage flux_w8a8_pq 5400 \
  python bench.py --config flux-schnell
FGT_W8A8=1 FGT_W8A8_IMPL=pallas run_stage flux_w8a8_pallas 5400 \
  python bench.py --config flux-schnell
FGT_W8A8=1 FGT_W8A8_IMPL=xla run_stage flux_w8a8_xla 5400 \
  python bench.py --config flux-schnell

# 5. flux 2048^2 W8A8 with the winning impl (r3: 13.4 s XLA W8A8)
FGT_W8A8=1 run_stage flux_2048_w8a8 7200 \
  python bench.py --config flux-denoise --size 2048

# 6/7. flux-dev at serving depth (25 steps, native 1024^2)
run_stage dev_25step_int8 7200 python scripts/prove_flux_dev.py --size 1024 --steps 25
FGT_W8A8=1 run_stage dev_25step_w8a8 7200 \
  python scripts/prove_flux_dev.py --size 1024 --steps 25

# 8. musicgen: v3 at short + long form, v1/v2 controls, batched AR n=4
FGT_MG_FUSED_IMPL=v3 run_stage mg_v3_200 5400 \
  python bench.py --config musicgen-e2e --steps 200
FGT_MG_FUSED_IMPL=v2 run_stage mg_v2_200 5400 \
  python bench.py --config musicgen-e2e --steps 200
FGT_MG_FUSED_IMPL=v3 run_stage mg_v3_2500 7200 \
  python bench.py --config musicgen-e2e --steps 2500
FGT_MG_FUSED_IMPL=v1 run_stage mg_v1_2500 7200 \
  python bench.py --config musicgen-e2e --steps 2500
FGT_MG_FUSED_IMPL=v3 FGT_QUANTIZE=1 run_stage mg_v3_b4 5400 \
  python bench.py --config musicgen --steps 500 --batch 4

# 9. batch-aware threshold validation (VERDICT r3 #2 tail): the 1500-step
# v2->v1 crossover was measured at n=1; at n=4 (CFG batch 8) the VMEM window
# footprint is 4x, so the cliff should arrive ~4x earlier. Measure both
# impls at n=4, 500 steps (past the predicted ~375-step batched crossover).
FGT_MG_FUSED_IMPL=v2 FGT_QUANTIZE=1 run_stage mg_v2_b4 5400 \
  python bench.py --config musicgen --steps 500 --batch 4
FGT_MG_FUSED_IMPL=v1 FGT_QUANTIZE=1 run_stage mg_v1_b4 5400 \
  python bench.py --config musicgen --steps 500 --batch 4
FGT_MG_FUSED_IMPL=v2 FGT_QUANTIZE=1 run_stage mg_v2_b4_200 5400 \
  python bench.py --config musicgen --steps 200 --batch 4
FGT_MG_FUSED_IMPL=v1 FGT_QUANTIZE=1 run_stage mg_v1_b4_200 5400 \
  python bench.py --config musicgen --steps 200 --batch 4

echo "all stages attempted; logs in $OUT"
