"""Real-hardware kernel-parity tier (`-m tpu`).

CI runs every Pallas parity in interpret mode on the CPU backend, so Mosaic
tiling/DMA constraints are never exercised there (ADVICE r4 #2 called this
out for the f8 KV path specifically — its hardware correctness rested on
manual profiling runs). This module re-runs the load-bearing parities
COMPILED on the actual chip, with tile-friendly geometries (head_dim 64/128,
32-row-aligned int8 cache windows — the real models' shapes, scaled down).

Run:  FGT_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py -q
  or: python scripts/run_tests.py --tier tpu
(The env var stops tests/conftest.py from forcing the CPU backend; without
it — i.e. in the quick/full CPU tiers — every test here self-skips.)

Ref anchor: the reference trusts its Metal kernels to the MLX test suite it
runs on-device (musicgen/test.py, stable_diffusion tests); this is the
equivalent on-TPU gate for our kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="hardware tier: needs the real TPU backend "
               "(FGT_TEST_TPU=1, axon tunnel up)",
    ),
]


def _nmax(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / max(1e-3, float(np.abs(a).max())))


# ---------------------------------------------------------------- attention


def test_flash_one_shot_hw():
    """One-shot flash kernel vs the XLA einsum reference, compiled on chip.
    (b, l, h, d) = (1, 1024, 4, 128) — flux head geometry at 512² tokens."""
    from flux_generator_tpu.ops.attention import dot_product_attention
    from flux_generator_tpu.ops.pallas.flash_attention import flash_attention

    b, l, h, d = 1, 1024, 4, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, l, h, d))
    k = jax.random.normal(ks[1], (b, l, h, d))
    v = jax.random.normal(ks[2], (b, l, h, d))
    ref = jax.jit(dot_product_attention)(q, k, v)
    out = jax.jit(flash_attention)(q, k, v)
    # hardware kernel feeds the MXU in bf16 (measured max|Δ| ~2e-3 in the
    # r3 study); 2e-2 normalized leaves 10x margin
    assert _nmax(ref, out) < 2e-2


def test_flash_streamed_hw():
    """Streamed path (l > one-shot max): K/V walked block-by-block with
    running-softmax scratch. l=8192 ≈ the 1408² regime."""
    from flux_generator_tpu.ops.attention import dot_product_attention
    from flux_generator_tpu.ops.pallas.flash_attention import flash_attention
    from flux_generator_tpu.runtime.config import flash_one_shot_max

    b, l, h, d = 1, 8192, 1, 128
    assert l > flash_one_shot_max()
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, l, h, d))
    k = jax.random.normal(ks[1], (b, l, h, d))
    v = jax.random.normal(ks[2], (b, l, h, d))
    ref = jax.jit(dot_product_attention)(q, k, v)
    out = jax.jit(flash_attention)(q, k, v)
    assert _nmax(ref, out) < 2e-2


@pytest.mark.slow
def test_flash_streamed_2048sq_regime_hw():
    """The 2048²-generation regime on chip: 16640 tokens, streamed path at
    its tuned BLK_Q=1024 default. The smoke script TIMES this configuration
    (scripts/smoke_kernel_defaults.py T2) but never checks its numerics on
    hardware. The reference is q-chunked (a 16640² monolithic einsum
    reference never finished on chip — 1.1 GB logits; each 1040-row chunk
    keeps the exact softmax math at ~69 MB)."""
    from flux_generator_tpu.ops.attention import dot_product_attention
    from flux_generator_tpu.ops.pallas.flash_attention import flash_attention

    b, l, h, d = 1, 16640, 1, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (b, l, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, l, h, d), jnp.bfloat16)

    @jax.jit
    def ref_chunked(q, k, v):
        qc = q.reshape(b, l // 1040, 1040, h, d).swapaxes(0, 1)
        out = jax.lax.map(lambda qi: dot_product_attention(qi, k, v), qc)
        return out.swapaxes(0, 1).reshape(b, l, h, d)

    ref = ref_chunked(q, k, v)
    out = jax.jit(flash_attention)(q, k, v)
    assert _nmax(ref, out) < 3e-2


def test_flash_rope_hw():
    """Fused-RoPE one-shot path on chip (the flux serving configuration)."""
    from flux_generator_tpu.ops.attention import dot_product_attention
    from flux_generator_tpu.ops.pallas.flash_attention import flash_attention
    from flux_generator_tpu.ops.rope import apply_rope, rope_cos_sin

    b, l, h, d = 1, 512, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, l, h, d))
    k = jax.random.normal(ks[1], (b, l, h, d))
    v = jax.random.normal(ks[2], (b, l, h, d))
    pos = jnp.broadcast_to(jnp.arange(l, dtype=jnp.float32), (b, l))
    cos, sin = rope_cos_sin(pos, d)
    ref = jax.jit(
        lambda q, k, v: dot_product_attention(
            apply_rope(q, cos, sin), apply_rope(k, cos, sin), v)
    )(q, k, v)
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v, cos=cos, sin=sin))(
        q, k, v)
    assert _nmax(ref, out) < 2e-2


# ------------------------------------------------------- musicgen megakernel


def _mg_setup(w: int, s_text: int = 16):
    """Hardware-shaped tiny MusicGen: hidden 512 / 8 heads (the real d=64),
    ffn 4h, 2 layers — small enough to compile fast, tile-legal on Mosaic."""
    from flux_generator_tpu.models.musicgen import model as mg
    from flux_generator_tpu.ops.pallas.decode_layer import (
        pack_decode_weights,
        packable,
    )

    cfg = mg.tiny_musicgen_config(hidden_size=512, ffn_dim=2048,
                                  num_attention_heads=8, num_hidden_layers=2)
    params = mg.init_musicgen(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    assert packable(params["layers"])
    b2 = 2
    cond = (jax.random.normal(jax.random.PRNGKey(1),
                              (b2, s_text, cfg.hidden_size)) * 0.3
            ).astype(jnp.bfloat16)
    cross_kv = mg.precompute_cross_kv(params, cfg, cond)
    packed = pack_decode_weights(params["layers"], cfg.hidden_size,
                                 cfg.ffn_dim)
    ckv_flat = tuple(a.reshape(cfg.num_hidden_layers, b2, a.shape[2],
                               cfg.hidden_size) for a in cross_kv)
    return mg, cfg, params, packed, cross_kv, ckv_flat, b2, w


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_fused_decode_parity_hw(impl):
    """bf16 fused decode-layer megakernel vs the XLA layer loop, on chip."""
    from flux_generator_tpu.runtime.config import set_musicgen_fused_impl

    mg, cfg, params, packed, cross_kv, ckv_flat, b2, w = _mg_setup(w=64)
    h, L = cfg.hidden_size, cfg.num_hidden_layers
    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, jnp.bfloat16)
    kc_f = jnp.zeros((L, b2, w, h), jnp.bfloat16)
    vc_f = jnp.zeros_like(kc_f)
    key = jax.random.PRNGKey(2)
    set_musicgen_fused_impl(impl)
    try:
        for off in range(3):
            tok = jax.random.randint(
                jax.random.fold_in(key, off), (b2, 1, cfg.num_codebooks), 0,
                cfg.codebook_size)
            lg_x, kc_x, vc_x = mg.decode_step(
                params, cfg, tok, cross_kv, kc_x, vc_x, jnp.int32(off))
            lg_f, kc_f, vc_f = mg.decode_step_fused(
                packed, params, cfg, tok, ckv_flat, kc_f, vc_f,
                jnp.int32(off))
            assert _nmax(lg_x, lg_f) < 0.04, (off, _nmax(lg_x, lg_f))
        kx = np.asarray(kc_x, np.float32).reshape(L, b2, w, h)
        assert np.abs(kx - np.asarray(kc_f, np.float32)).max() < 0.02
    finally:
        set_musicgen_fused_impl(None)


def test_fused_decode_parity_f8_cache_hw():
    """THE ADVICE r4 #2 gap: f8 (e4m3-byte int8) KV caches through the fused
    kernel compiled on real hardware — (32, 128) int8 native tiles, the
    8-vs-32-row window DMA alignment, in-kernel arithmetic f8 decode. Parity
    against the XLA loop running the same f8 cache dtype."""
    from flux_generator_tpu.runtime.config import set_musicgen_fused_impl

    mg, cfg, params, packed, cross_kv, ckv_flat, b2, w = _mg_setup(w=64)
    h, L = cfg.hidden_size, cfg.num_hidden_layers
    f8 = jnp.int8  # e4m3 bytes (zeros == +0.0)
    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, f8)
    kc_f = jnp.zeros((L, b2, w, h), f8)
    vc_f = jnp.zeros_like(kc_f)
    key = jax.random.PRNGKey(3)
    set_musicgen_fused_impl("v1")  # the f8 routing choice (auto picks v1)
    try:
        for off in range(3):
            tok = jax.random.randint(
                jax.random.fold_in(key, off), (b2, 1, cfg.num_codebooks), 0,
                cfg.codebook_size)
            lg_x, kc_x, vc_x = mg.decode_step(
                params, cfg, tok, cross_kv, kc_x, vc_x, jnp.int32(off))
            lg_f, kc_f, vc_f = mg.decode_step_fused(
                packed, params, cfg, tok, ckv_flat, kc_f, vc_f,
                jnp.int32(off))
            assert _nmax(lg_x, lg_f) < 0.08, (off, _nmax(lg_x, lg_f))
    finally:
        set_musicgen_fused_impl(None)
    assert kc_f.dtype == f8


def test_generate_fused_f8_runs_hw():
    """End-to-end generate() with the fused kernel + f8 KV on chip: the
    32-row-aligned window allocation must produce a legal Mosaic program
    and valid codes (the traced-shape test in test_fused_decode.py checks
    alignment; this checks the chip accepts it)."""
    from flux_generator_tpu.runtime.config import (
        set_musicgen_fused,
        set_musicgen_kv_dtype,
    )

    mg, cfg, params, _, _, _, _, _ = _mg_setup(w=64)
    cond = (jax.random.normal(jax.random.PRNGKey(4), (1, 16, cfg.hidden_size))
            * 0.3).astype(jnp.bfloat16)
    set_musicgen_fused(True)
    set_musicgen_kv_dtype("f8")
    try:
        codes = mg.generate(params, cfg, cond, max_steps=24, top_k=1,
                            key=jax.random.PRNGKey(0))
    finally:
        set_musicgen_fused(None)
        set_musicgen_kv_dtype(None)
    codes = np.asarray(codes)
    assert codes.shape == (1, cfg.num_codebooks, 24 - cfg.num_codebooks + 1)
    assert codes.min() >= 0 and codes.max() < cfg.codebook_size


# ----------------------------------------------------------- quant matmuls


def test_w8a8_matmul_hw():
    """Fused W8A8 kernel (in-kernel activation quant + int8 MXU dots) on
    chip vs the weight-quant-only truth and the XLA W8A8 formulation."""
    from flux_generator_tpu.ops.pallas.w8a8_matmul import (
        supported,
        w8a8_matmul,
    )

    M, K, N = 64, 1024, 256
    kx, kw = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(kx, (M, K), jnp.float32)
    w = jax.random.normal(kw, (K, N), jnp.float32)
    ws = jnp.max(jnp.abs(w), axis=0) / 127.0
    wq = jnp.round(w / ws).astype(jnp.int8)
    assert supported(K, ws)

    ref = x @ (wq.astype(jnp.float32) * ws)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0,
                     1e-8)
    x_q = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    xla = (jax.lax.dot_general(x_q, wq, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
           .astype(jnp.float32) * sx * ws)
    out = jax.jit(w8a8_matmul)(x, wq, ws)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 0.025
    assert float(jnp.max(jnp.abs(out - xla))) / scale < 0.035
    # per-(row, k-block) scales are finer than per-row: at least as accurate
    err_pallas = float(jnp.mean(jnp.abs(out - ref)))
    err_xla = float(jnp.mean(jnp.abs(xla - ref)))
    assert err_pallas <= err_xla * 1.35, (err_pallas, err_xla)


def test_int4_matmul_hw():
    """Nibble-unpack-in-kernel int4 matmul on chip vs the XLA dense()
    dequant path (grouped g=128 scales, packed uint8 storage)."""
    from flux_generator_tpu.ops.linear import dense, init_dense
    from flux_generator_tpu.ops.pallas.int4_matmul import int4_matmul
    from flux_generator_tpu.ops.quant import quantize_dense

    K, N, M = 2048, 640, 96
    q = quantize_dense(init_dense(jax.random.PRNGKey(6), K, N, bias=False,
                                  dtype=jnp.float32),
                       bits=4, group_size=128, pack=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (M, K), jnp.float32)
    ref = jax.jit(lambda x: dense(q, x))(x)
    out = jax.jit(lambda x: int4_matmul(x, q["kernel_q4"],
                                        q["kernel_scale"]))(x)
    assert _nmax(ref, out) < 1e-2


# ------------------------------------------------------------------- lstm


def test_lstm_hw():
    """Pallas LSTM (HBM-resident Wh, rolled recurrence) vs the eager scan
    on chip at a tile-legal width."""
    from flux_generator_tpu.models.musicgen.encodec import lstm_forward
    from flux_generator_tpu.ops.pallas.lstm import lstm_pallas

    d, t, b = 128, 64, 2
    ks = jax.random.split(jax.random.PRNGKey(8), 4)
    p = {
        "wx": jax.random.normal(ks[0], (d, 4 * d)) * 0.3,
        "wh": jax.random.normal(ks[1], (d, 4 * d)) * 0.3,
        "bias": jax.random.normal(ks[2], (4 * d,)) * 0.1,
    }
    x = jax.random.normal(ks[3], (b, t, d))
    ref = jax.jit(lambda p, x: lstm_forward(p, x))(p, x)
    out = jax.jit(lambda p, x: lstm_pallas(p, x))(p, x)
    assert _nmax(ref, out) < 5e-3
