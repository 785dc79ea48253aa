"""Runtime feature switches.

FGT_PALLAS=auto|1|0 — use the Pallas flash-attention (+fused RoPE) kernel on
the Flux hot path. "auto" (default) enables it only on TPU backends; CPU
tests run the einsum path (the kernel itself is covered by interpret-mode
tests in tests/test_pallas_flash.py).
"""

from __future__ import annotations

import os


def _flag(name: str) -> bool:
    import jax

    v = os.environ.get(name, os.environ.get("FGT_PALLAS", "auto")).lower()
    if v == "auto":
        return jax.default_backend() == "tpu"
    return v not in ("0", "off", "false", "no")


def use_pallas_attention() -> bool:
    return _flag("FGT_PALLAS_ATTENTION")


# --------------------------------------------------------------- ring ctx
# Sequence/context parallelism switch (SURVEY §2.6): when set, model
# attention dispatches to parallel.ring_attention for sequences at or above
# the threshold (>2048² generation: 16k+ image tokens). Set via
# FluxPipeline.enable_ring_attention or set_ring_attention directly.
_RING_CTX: dict = {"mesh": None, "axis": "model", "threshold": 32768}


def set_ring_attention(mesh, axis: str = "model", threshold: int = 32768):
    """Enable (mesh != None) or disable (mesh=None) ring attention for
    sequences of length >= threshold."""
    _RING_CTX.update(mesh=mesh, axis=axis, threshold=threshold)


def ring_attention_params(seq_len: int):
    """Returns (mesh, axis) when ring attention should handle seq_len."""
    mesh = _RING_CTX["mesh"]
    if mesh is not None and seq_len >= _RING_CTX["threshold"] \
            and seq_len % mesh.shape[_RING_CTX["axis"]] == 0:
        return mesh, _RING_CTX["axis"]
    return None, None


def use_pallas_int4() -> bool:
    """Packed-int4 matmuls through the Pallas unpack-in-kernel path
    (ops/pallas/int4_matmul.py) — the nibble extraction never fuses as well
    in XLA as it does issued straight into the MXU feed. auto = on for TPU."""
    return _flag("FGT_PALLAS_INT4")


def w8a8_impl() -> str:
    """Which W8A8 activation-quant formulation ops/linear.dense uses when
    w8a8_enabled() selected the int8-activation path (FGT_W8A8_IMPL):
      "xla"    — discrete XLA ops (amax + round + dot). DEFAULT: measured
                 e2e it ties "pq" (0.441 vs 0.454 s flux 512² same session)
                 because XLA already overlaps the quant passes with MXU
                 work inside the big program, and it is the only
                 formulation proven at every geometry — at dev-1024²/2048²
                 token counts XLA places the pq kernel's int8 output in
                 scoped VMEM inside the denoise loop and compile OOMs
                 ("scoped allocation 23.97M exceeded 16.00M").
      "pq"     — one-pass Pallas row-quantizer (ops/pallas/w8a8_matmul.
                 quantize_rows) feeding the XLA int8 dot; wins standalone
                 microbenches (325-407 vs 255-381 TOPS-eff,
                 scripts/prof_w8a8.py) but not in-program.
      "pallas" — fully fused Pallas matmul (quant + int8 MXU dots + dequant
                 epilogue in one pallas_call); loses in-program (0.654 s).
    """
    v = os.environ.get("FGT_W8A8_IMPL", "auto").lower()
    if v == "auto":
        return "xla"
    return v if v in ("pq", "pallas", "xla") else "xla"


# ------------------------------------------------------------- call-time knobs
# Env vars are read at CALL time (not module import), and every knob has a
# programmatic setter so a live server can retune without re-importing —
# the set_w8a8() pattern (VERDICT r2 weak #7). set_*(None) reverts to env.
_KNOBS: dict = {}


def _knob(name: str, env: str, default: int) -> int:
    v = _KNOBS.get(name)
    if v is not None:
        return v
    return int(os.environ.get(env, str(default)))


def set_flash_attention(*, blk_k: int | None = None,
                        one_shot_max: int | None = None,
                        blk_q: int | None = None):
    """Override the flash-attention K/Q block sizes and/or the one-shot-path
    length threshold for subsequent calls (None = back to env/default)."""
    _KNOBS["flash_blk_k"] = blk_k
    _KNOBS["one_shot_max"] = one_shot_max
    _KNOBS["flash_blk_q"] = blk_q


def flash_blk_k() -> int:
    return _knob("flash_blk_k", "FGT_FLASH_BLK_K", 1024)


def flash_blk_q() -> int:
    """Q block size; 0 = auto (256 one-shot / 1024 streamed). The streamed
    path's cost is dominated by per-grid-step overhead (~1 µs × bh·n_q·n_kb,
    measured: 16640-token call 39.5→31.2 ms kernel going 256→1024 — the
    BLK_K sweep was flat because K traffic was never the binding term)."""
    return _knob("flash_blk_q", "FGT_FLASH_BLK_Q", 0)


def flash_one_shot_max() -> int:
    """One-shot (single logits tile) attention up to this padded length; the
    streamed flash path beyond. 6144 ≈ 22 MB VMEM tile (measured safe)."""
    return _knob("one_shot_max", "FGT_ONE_SHOT_MAX", 6144)


def set_attn_int8(mode: str | None = None):
    """Force the int8-MXU attention mode: "" (off), "qk", "full"
    (None = back to FGT_ATTN_INT8 / default off)."""
    if mode is not None and mode not in ("", "qk", "full"):
        raise ValueError(f"attn_int8 mode must be ''|'qk'|'full', got {mode!r}")
    _KNOBS["attn_int8"] = mode


def attn_int8() -> str:
    """int8 MXU feed for the flash-attention kernels — ONE-SHOT path only
    (≤ ONE_SHOT_MAX). MEASURED A PERF LOSS ON BOTH PATHS on v5e (the
    int8-dots-run-2x premise does not materialize in Mosaic at d=128
    contractions): one-shot 1024² flux W8A8 1.91 s → qk 2.21 / full 2.22;
    streamed 2048² 14.2 s → qk 31.7 / full 17.1 (the wrapper therefore
    ignores the knob on the streamed path; the kernel tier stays
    test-covered via _flash_attention_jit). Retained as an experimentation
    knob only — never auto-enabled.
    "qk": only the QK^T logits dot —
    per-row q/k max-abs scales factor out exactly; measured error budget
    ~1.3% max / 0.13% mean vs f32 (the quality-safe tier). "full": also the
    PV dot — softmax weights per-row-in-block int8, V per column; ~2-4x the
    error (the p rounding dominates), 2x the attention saving. Attention is
    ~33% of the 2048-sq flux step and the one datapath W8A8 leaves in bf16.
    DEFAULT OFF pending the real-weight image-quality check (same gate as
    FGT_W8A8); kernel-level budget in tests/test_attn_int8.py."""
    v = _KNOBS.get("attn_int8")
    if v is not None:
        return v
    env = os.environ.get("FGT_ATTN_INT8", "").lower()
    if env in ("", "0", "off", "false", "no"):
        return ""
    if env in ("1", "on", "true", "yes", "qk"):
        return "qk"
    return "full" if env == "full" else ""


def set_musicgen_loop(*, cache_chunk: int | None = None,
                      ar_unroll: int | None = None):
    """Override the MusicGen AR loop's chunked-cache window / scan unroll."""
    _KNOBS["cache_chunk"] = cache_chunk
    _KNOBS["ar_unroll"] = ar_unroll


def musicgen_cache_chunk() -> int:
    return _knob("cache_chunk", "FGT_CACHE_CHUNK", 256)


def musicgen_ar_unroll() -> int:
    return _knob("ar_unroll", "FGT_AR_UNROLL", 1)


def set_musicgen_layer_loop(mode: str | None = None):
    """Override decode_step's layer-loop structure: "fori" (fori_loop +
    dynamic_index_in_dim weight gathers), "scan" (lax.scan with the stacked
    layer weights as xs so XLA prefetches per-iteration slices), or
    "unroll" (python-unrolled, statically indexed). None = back to env."""
    _KNOBS["mg_layer_loop"] = mode


def set_remat_policy(policy: str | None = None):
    """Force the training remat policy (None = back to FGT_REMAT_POLICY)."""
    if policy is not None and policy not in ("block", "dots"):
        raise ValueError(f"remat policy must be block|dots, got {policy!r}")
    _KNOBS["remat_policy"] = policy


def remat_policy() -> str:
    """Gradient-checkpoint granularity for the flux block stacks:
      block — full per-block remat (recompute everything in bwd; minimum
              activation memory, the r2 shipping default)
      dots  — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
              matmul outputs are SAVED, only elementwise/norm work
              recomputes. Trades ~5 GB of saved activations (57 blocks at
              512² batch 1) against one fwd's worth of recompute FLOPs.
    Measured A/B in BENCH_RESULTS 'training remat policy'."""
    v = _KNOBS.get("remat_policy")
    if v is None:
        v = os.environ.get("FGT_REMAT_POLICY", "block")
    if v not in ("block", "dots"):
        raise ValueError(f"FGT_REMAT_POLICY must be block|dots, got {v!r}")
    return v


def musicgen_layer_loop() -> str:
    v = _KNOBS.get("mg_layer_loop")
    if v is None:
        v = os.environ.get("FGT_MG_LAYER_LOOP", "fori")
    if v not in ("fori", "scan", "unroll"):
        raise ValueError(f"FGT_MG_LAYER_LOOP must be fori|scan|unroll, got {v!r}")
    return v


def set_musicgen_fused(enabled: bool | None = None):
    """Force the fused decode-step Pallas kernel on/off (None = back to
    FGT_MG_FUSED / auto)."""
    _KNOBS["mg_fused"] = enabled


def musicgen_fused_step() -> bool:
    """Fused decode-step megakernel (ops/pallas/decode_layer.py): one
    pallas_call per AR step streams all layer weights as uniform (H, H)
    chunks and folds the whole per-step dependent chain (projections,
    attention, FFN) into one program. DEFAULT AUTO = ON for TPU backends:
    measured END-TO-END in generate() it wins decisively — 6.98x vs 4.45x
    realtime at 200 AR steps, 6.41x vs 3.74x at 1000 (the bare
    static-window chain profiler says the opposite, 5.4 vs 1.1 ms/step,
    because it times only the decode matmuls; the kernel's win is
    eliminating the ~288 small-op dispatch chain around them — BENCH_RESULTS
    "MusicGen decode megakernel"). generate() additionally requires a
    packable weight layout (per-out-channel int8 or plain bf16, ffn = 4h)
    and falls back to the XLA layer loop otherwise; CPU runs keep the XLA
    loop (the kernel is interpret-mode tested)."""
    v = _KNOBS.get("mg_fused")
    if v is not None:
        return v
    v_env = os.environ.get("FGT_MG_FUSED", "auto").lower()
    if v_env == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return v_env not in ("0", "off", "false", "no")


def set_musicgen_fused_max_steps(n: int | None = None):
    """Force the v2→v1 window threshold (None = back to
    FGT_MG_FUSED_MAX_STEPS / default)."""
    _KNOBS["mg_fused_max_steps"] = n


def musicgen_fused_max_steps() -> int:
    """AR-step threshold where the auto impl switches from the v2 kernel
    (blocked-input cache delivery — whole window mapped per grid step) to
    v1 (manual double-buffered chunk DMA, VMEM bounded per chunk). v2's
    K/V window outgrows the 16 MB VMEM between 1500 and 2000 steps and
    thrashes (e2e 5.90× at 1500 → 2.85× at 2000), while v1 holds 4.97× at
    2000 / 4.49× at 2500 — BENCH_RESULTS 'MusicGen long-form crossover'."""
    v = _KNOBS.get("mg_fused_max_steps")
    if v is not None:
        return v
    return int(os.environ.get("FGT_MG_FUSED_MAX_STEPS", "1500"))


def set_musicgen_fused_impl(impl: str | None = None):
    """Select the fused decode-step kernel implementation (None = back to
    FGT_MG_FUSED_IMPL / default)."""
    if impl is not None and impl not in ("v1", "v2", "v3", "auto"):
        raise ValueError(f"impl must be v1|v2|v3|auto, got {impl!r}")
    _KNOBS["mg_fused_impl"] = impl


def musicgen_fused_impl() -> str:
    """Which fused decode-step kernel: "v1" streams the KV cache with
    manual double-buffered DMAs (VMEM bounded per chunk — survives long
    windows); "v2" lets the automatic grid pipeline deliver the cache
    window as blocked inputs and folds the flash chunks into the
    k/v-projection phases (no in-kernel semaphores, per-layer K/V rows
    leave through one constant-index output — slightly ahead at short
    windows). Default "auto": generate() picks v2 up to
    musicgen_fused_max_steps() AR steps and v1 beyond."""
    v = _KNOBS.get("mg_fused_impl")
    if v is not None:
        return v
    v = os.environ.get("FGT_MG_FUSED_IMPL", "auto")
    return v if v in ("v1", "v2", "v3", "auto") else "auto"


def musicgen_fused_impl_for(max_steps: int, n_samples: int = 1) -> str:
    """Resolve the fused-kernel impl for a concrete AR loop.

    n=1: v2 up to musicgen_fused_max_steps() (measured crossover), v1
    beyond. n>1 (batched serving): always v1 — r4 measured v1 ≡ v2 at n=4
    for both 200 steps (3.73 vs 3.68 ms/step) and 500 steps (5.08 vs
    5.09), so v2 has no batched advantage, and picking v1 removes the
    unvalidated region where the 4×-larger K/V window footprint could hit
    v2's VMEM cliff at some unmeasured step count (BENCH_RESULTS
    'batched crossover validation')."""
    v = musicgen_fused_impl()
    if v != "auto":
        return v
    if musicgen_kv_dtype() == "f8":
        # v2 delivers K/V as fixed-size half-window blocks, so the f8
        # arithmetic decode runs over the FULL block from step 0 (measured
        # collapse: 2.61x vs bf16 6.41x at 1000 steps); v1's manual chunks
        # track the live window, so decode cost grows with it instead
        return "v1"
    if n_samples > 1:
        return "v1"
    return "v2" if max_steps <= musicgen_fused_max_steps() else "v1"


def set_musicgen_kv_dtype(d: str | None = None):
    """Force the MusicGen self-attention KV-cache storage dtype (None =
    back to FGT_MG_KV / default bf16)."""
    if d is not None and d not in ("bf16", "f8"):
        raise ValueError(f"kv dtype must be bf16|f8, got {d!r}")
    _KNOBS["mg_kv_dtype"] = d


def musicgen_kv_dtype() -> str:
    """Storage dtype for the MusicGen decoder's self-attention KV cache:
    "bf16" (default, bit-exact with the reference math) or "f8"
    (float8_e4m3fn bytes in int8 buffers — halves the cache-window HBM
    traffic that grows with generation length and caps long-form realtime;
    see models/musicgen/model.kv_cache_dtype for why the bytes travel as
    int8; parity tests test_kv_cache_f8_close_to_bf16 and
    test_decode_step_parity_f8_cache). FGT_MG_KV=f8 opts in; quality-gated
    OFF by default pending the real-weight listen test (same policy as
    FGT_W8A8)."""
    v = _KNOBS.get("mg_kv_dtype")
    if v is not None:
        return v
    v = os.environ.get("FGT_MG_KV", "bf16").lower()
    return "f8" if v in ("f8", "e4m3", "fp8", "float8") else "bf16"


def use_pallas_lstm() -> bool:
    # default "auto" = ON for TPU backends (CPU uses the lax.scan LSTM; the
    # kernel is covered by interpret-mode tests). Round 1 shipped this
    # opt-in because kernel + full conv stack in one program blew XLA's
    # 128 MB vmem scheduling budget; EnCodec decode now runs as two jitted
    # programs split at the LSTM stage (models/musicgen/encodec.py), which
    # schedules cleanly.
    return _flag("FGT_PALLAS_LSTM")
