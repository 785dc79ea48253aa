#!/usr/bin/env bash
# One-command TPU measurement queue for the open round-3 items. Runs each
# measurement SEQUENTIALLY (never two TPU clients at once — the axon relay
# wedges) and logs to $OUT (default /tmp/tpum). Re-runnable: each stage
# skips itself if its log already ends with DONE.
#
# Stages:
#   1. musicgen fused-decode remeasure (v1/v2/xla at windows 256/512/1504,
#      one-jit chain timing) -> decides the FGT_MG_FUSED default
#   2. 1024-sq flux batch scaling (batch 1/2/4) -> decides whether the
#      server coalescer should batch at 1024
#   3. 2048-sq flux with int8 attention tiers (qk/full, on top of W8A8)
#   4. headline bench refresh (512-sq e2e) + musicgen e2e with fused kernel
set -u
OUT="${OUT:-/tmp/tpum}"
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

# 1. MusicGen fused decode kernel: the only trustworthy numbers come from
#    the one-jit chain profiler (per-step dispatch through the tunnel is
#    ~4-5 ms of noise). Matrix mode: all windows/impls in ONE process.
run_stage mg_fused 3600 python scripts/prof_fused_decode.py \
  --window 256,512,1504 --impl v1,v2 --mode both --steps 50

# 2. 1024-sq batch scaling (denoise config isolates the flow).
for b in 1 2 4; do
  run_stage "flux1024_b$b" 3000 python bench.py --config flux-denoise --size 1024 --batch "$b"
done

# 3. 2048-sq with the int8 attention tiers (attention is ~4.8 s of the
#    13.4 s W8A8 denoise; int8 dots run 2x bf16 MXU throughput).
run_stage flux2048_w8a8 3600 env FGT_W8A8=1 python bench.py --config flux-denoise --size 2048
run_stage flux2048_qk   3600 env FGT_W8A8=1 FGT_ATTN_INT8=qk   python bench.py --config flux-denoise --size 2048
run_stage flux2048_full 3600 env FGT_W8A8=1 FGT_ATTN_INT8=full python bench.py --config flux-denoise --size 2048

# 3b. Conditioning-phase breakdown (0.26 s of the 0.58 s headline is
#     conditioning — ~10x its bandwidth/compute floor; find where it goes).
run_stage conditioning 3600 python scripts/prof_conditioning.py

# 4. Headline refresh + musicgen e2e with the fused megakernel.
run_stage headline 3600 python bench.py
run_stage mg_e2e_fused 3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=1 python bench.py --config musicgen-e2e

# 5. Conditioning deep-dive (T5-XXL 256-token encode is ~100-140 ms vs a
#    ~13 ms compute floor; int4g128-Pallas measured SLOWER than int8
#    weight-only). Which path/format is fastest at M=256?
run_stage cond_int4_xla  3000 env FGT_PALLAS_INT4=0 python scripts/prof_conditioning.py --modes int4g128
run_stage cond_int8_w8a8 3000 env FGT_W8A8=1 python scripts/prof_conditioning.py --modes int8
run_stage cond_bf16      3000 python scripts/prof_conditioning.py --modes bf16
run_stage t5_micro       3000 python scripts/prof_t5_micro.py

# 6. MusicGen e2e WITHOUT the fused megakernel: the fixed one-jit chain
#    profiler shows plain XLA decode at 1.14 ms/step (window 256) vs 5.4 ms
#    for the megakernel — the 3.26/2.8 ms "fused wins" numbers were harness
#    dispatch noise. Decide the default from e2e audio-sec/sec.
run_stage mg_e2e_xla 3600 env FGT_QUANTIZE=1 python bench.py --config musicgen-e2e
run_stage mg_e2e_xla_long 3600 env FGT_QUANTIZE=1 python bench.py --config musicgen-e2e --steps 1000
# e2e decides the default (fused won at 200 steps: 6.98x vs 4.45x); check
# long-form before flipping FGT_MG_FUSED on.
run_stage mg_e2e_fused_long 3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=1 python bench.py --config musicgen-e2e --steps 1000
# default-flag verification: no FGT_MG_FUSED in env — auto must pick the
# fused kernel on TPU and reproduce the ~6.9x number.
run_stage mg_e2e_default 3600 python bench.py --config musicgen-e2e

# 7. Megakernel batched generation + long-form UI-cap refresh: the batched
#    rows (14.4 aggregate audio-sec/sec) and the 1500/2500-step rows were
#    measured on the XLA loop; the fused kernel is now the TPU default.
for b in 1 2 4; do
  run_stage "mg_batch$b" 3000 env FGT_QUANTIZE=1 python bench.py --config musicgen --steps 200 --batch "$b"
done
run_stage mg_e2e_2500 3600 env FGT_QUANTIZE=1 python bench.py --config musicgen-e2e --steps 2500
# crossover mapping: fused degrades with window (2500-step fused 2.11x);
# place the fused->xla switchover from both paths at 1500/2500.
run_stage mg_e2e_xla_2500   3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=0 python bench.py --config musicgen-e2e --steps 2500
run_stage mg_e2e_fused_1500 3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=1 python bench.py --config musicgen-e2e --steps 1500
run_stage mg_e2e_xla_1500   3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=0 python bench.py --config musicgen-e2e --steps 1500
# ceiling placement: is fused still ahead at 2000?
run_stage mg_e2e_fused_2000 3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=1 FGT_MG_FUSED_MAX_STEPS=4000 python bench.py --config musicgen-e2e --steps 2000
run_stage mg_e2e_xla_2000   3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=0 python bench.py --config musicgen-e2e --steps 2000
# v1 streams the cache window via manual double-buffered DMA (VMEM bounded
# per chunk) — does it dodge the v2 long-window cliff?
run_stage mg_e2e_v1_2000 3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=1 FGT_MG_FUSED_MAX_STEPS=4000 FGT_MG_FUSED_IMPL=v1 python bench.py --config musicgen-e2e --steps 2000
run_stage mg_e2e_v1_2500 3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=1 FGT_MG_FUSED_MAX_STEPS=4000 FGT_MG_FUSED_IMPL=v1 python bench.py --config musicgen-e2e --steps 2500
# complete the impl matrix: is v1 also ahead at short/mid windows (could
# simplify auto to v1-everywhere)?
for s in 200 1000 1500; do
  run_stage "mg_e2e_v1_$s" 3600 env FGT_QUANTIZE=1 FGT_MG_FUSED=1 FGT_MG_FUSED_IMPL=v1 python bench.py --config musicgen-e2e --steps "$s"
done

# 8. int8 attention tiers on their INTENDED (one-shot) path: 1024-sq flux
#    is 4352 tokens -> one-shot kernel. Decision data for the quality gate.
run_stage flux1024_w8a8 3600 env FGT_W8A8=1 python bench.py --config flux-denoise --size 1024
run_stage flux1024_qk   3600 env FGT_W8A8=1 FGT_ATTN_INT8=qk   python bench.py --config flux-denoise --size 1024
run_stage flux1024_full 3600 env FGT_W8A8=1 FGT_ATTN_INT8=full python bench.py --config flux-denoise --size 1024

echo "all stages complete; logs in $OUT"
