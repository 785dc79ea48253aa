"""Parity tests for the fused MusicGen decode-step megakernel
(ops/pallas/decode_layer.py) against the XLA layer loop (decode_step).

Runs the Pallas kernel in interpret mode on the CPU test backend; the same
code path compiles for TPU. Covers bf16 and int8-quantized weights, multi-
step cache buildup, and the generate() integration (flat cache layout +
chunked windows) via the runtime knob."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.models.musicgen import model as mg
from flux_generator_tpu.ops.pallas.decode_layer import (
    pack_decode_weights,
    packable,
)
from flux_generator_tpu.runtime.config import set_musicgen_fused

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def tiny_cfg():
    # ffn = 4h (the chunk schedule's assumption; the real model is 4h too)
    return mg.tiny_musicgen_config(hidden_size=32, ffn_dim=128,
                                   num_attention_heads=4, num_hidden_layers=2)


def make_setup(quantize: bool, n: int = 1, s_text: int = 6, w: int = 8):
    cfg = tiny_cfg()
    params = mg.init_musicgen(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if quantize:
        from flux_generator_tpu.ops.quant import quantize_tree

        params = dict(
            params,
            layers=quantize_tree(
                params["layers"], predicate=lambda node: True
            ),
        )
        assert "kernel_q" in params["layers"]["self_attn"]["qkv"]
    assert packable(params["layers"])
    b2 = 2 * n
    conditioning = (
        jax.random.normal(jax.random.PRNGKey(1), (b2, s_text, cfg.hidden_size))
        * 0.3
    ).astype(jnp.bfloat16)
    cross_kv = mg.precompute_cross_kv(params, cfg, conditioning)
    packed = pack_decode_weights(params["layers"], cfg.hidden_size, cfg.ffn_dim)
    return cfg, params, packed, cross_kv, b2, w


@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
@pytest.mark.parametrize("quantize", [False, True])
def test_decode_step_parity(quantize, impl):
    from flux_generator_tpu.runtime.config import set_musicgen_fused_impl

    cfg, params, packed, cross_kv, b2, w = make_setup(quantize)
    h = cfg.hidden_size
    L = cfg.num_hidden_layers

    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, jnp.bfloat16)
    kc_f = jnp.zeros((L, b2, w, h), jnp.bfloat16)
    vc_f = jnp.zeros_like(kc_f)
    ckv_flat = tuple(a.reshape(L, b2, a.shape[2], h) for a in cross_kv)

    key = jax.random.PRNGKey(2)
    set_musicgen_fused_impl(impl)
    try:
        for off in range(4):  # multi-step: later steps attend over real cache
            tok = jax.random.randint(
                jax.random.fold_in(key, off), (b2, 1, cfg.num_codebooks), 0,
                cfg.codebook_size,
            )
            lg_x, kc_x, vc_x = mg.decode_step(
                params, cfg, tok, cross_kv, kc_x, vc_x, jnp.int32(off)
            )
            lg_f, kc_f, vc_f = mg.decode_step_fused(
                packed, params, cfg, tok, ckv_flat, kc_f, vc_f, jnp.int32(off),
                interpret=True,
            )
            _check_step(lg_x, lg_f, kc_x, kc_f, cfg, b2, w)
    finally:
        set_musicgen_fused_impl(None)


def _check_step(lg_x, lg_f, kc_x, kc_f, cfg, b2, w):
    a = np.asarray(lg_x, np.float32)
    b = np.asarray(lg_f, np.float32)
    denom = max(1e-3, float(np.abs(a).max()))
    assert np.abs(a - b).max() / denom < 0.03, np.abs(a - b).max()
    # caches agree (flat layout == heads-flattened XLA layout)
    L, h = cfg.num_hidden_layers, cfg.hidden_size
    kx = np.asarray(kc_x, np.float32).reshape(L, b2, w, h)
    kf = np.asarray(kc_f, np.float32)
    assert np.abs(kx - kf).max() < 0.02


def test_decode_step_parity_two_chunks():
    """v2 splits windows > 768 into two pipelined chunks; drive it with a
    prefilled cache and an offset deep inside chunk 1 so both chunks (and
    the block-pad masking on the second) carry live attention mass."""
    from flux_generator_tpu.runtime.config import set_musicgen_fused_impl

    cfg, params, packed, cross_kv, b2, w = make_setup(False, w=1024)
    h = cfg.hidden_size
    L = cfg.num_hidden_layers

    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, jnp.bfloat16)
    r_k = (jax.random.normal(jax.random.PRNGKey(7), (L, b2, w, h)) * 0.2
           ).astype(jnp.bfloat16)
    r_v = (jax.random.normal(jax.random.PRNGKey(8), (L, b2, w, h)) * 0.2
           ).astype(jnp.bfloat16)
    kc_x = r_k.reshape(kc_x.shape)
    vc_x = r_v.reshape(vc_x.shape)
    ckv_flat = tuple(a.reshape(L, b2, a.shape[2], h) for a in cross_kv)

    tok = jax.random.randint(
        jax.random.PRNGKey(9), (b2, 1, cfg.num_codebooks), 0,
        cfg.codebook_size,
    )
    off = jnp.int32(700)  # chunk 0 fully live, chunk 1 partially live
    lg_x, kc_x, vc_x = mg.decode_step(
        params, cfg, tok, cross_kv, kc_x, vc_x, off
    )
    set_musicgen_fused_impl("v2")
    try:
        lg_f, kc_f, vc_f = mg.decode_step_fused(
            packed, params, cfg, tok, ckv_flat, r_k, r_v, off,
            interpret=True,
        )
    finally:
        set_musicgen_fused_impl(None)
    _check_step(lg_x, lg_f, kc_x, kc_f, cfg, b2, w)


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("n", [1, 4])
def test_decode_step_parity_v3_multichunk(quantize, n):
    """v3 streams the window in >2 pipelined chunks (the long-form shape the
    v1/v2 split existed for): force chunk=256 over a 1024-position window →
    4 chunks, offset deep inside chunk 3 so every chunk carries live mass
    and the block-pad masking on the tail is exercised. n=4 → CFG batch 8,
    the batched-serving footprint VERDICT r3 flagged as unvalidated."""
    from flux_generator_tpu.ops.pallas.decode_layer import fused_decode_step3

    cfg, params, packed, cross_kv, b2, w = make_setup(quantize, n=n, w=1024)
    h = cfg.hidden_size
    L = cfg.num_hidden_layers

    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, jnp.bfloat16)
    r_k = (jax.random.normal(jax.random.PRNGKey(7), (L, b2, w, h)) * 0.2
           ).astype(jnp.bfloat16)
    r_v = (jax.random.normal(jax.random.PRNGKey(8), (L, b2, w, h)) * 0.2
           ).astype(jnp.bfloat16)
    kc_x = r_k.reshape(kc_x.shape)
    vc_x = r_v.reshape(vc_x.shape)
    ckv_flat = tuple(a.reshape(L, b2, a.shape[2], h) for a in cross_kv)

    tok = jax.random.randint(
        jax.random.PRNGKey(9), (b2, 1, cfg.num_codebooks), 0,
        cfg.codebook_size,
    )
    off = jnp.int32(900)  # chunks 0-2 fully live, chunk 3 partially live
    lg_x, kc_x, vc_x = mg.decode_step(
        params, cfg, tok, cross_kv, kc_x, vc_x, off
    )

    x = mg._embed_tokens(params, cfg, tok, off)
    y, kc_f, vc_f = fused_decode_step3(
        packed, x[:, 0, :], ckv_flat[0], ckv_flat[1], off, r_k, r_v,
        n_heads=cfg.num_attention_heads, chunk=256, interpret=True,
    )
    from flux_generator_tpu.ops.norms import layer_norm

    xn = layer_norm(y[:, None, :], params["out_norm"])
    lg_f = jnp.einsum("btd,kdv->btvk", xn, params["linears"].astype(xn.dtype))
    _check_step(lg_x, lg_f, kc_x, kc_f, cfg, b2, w)


def test_v3_chunk_rows_batch_aware():
    """The v3 chunk size shrinks with the CFG batch so the double-buffered
    K/V blocks stay inside the VMEM budget at n=4 serving (B=8) — the
    batch-blind FGT_MG_FUSED_MAX_STEPS constant this replaces was measured
    at n=1 only."""
    from flux_generator_tpu.ops.pallas.decode_layer import (
        _V3_KV_VMEM_BUDGET, v3_chunk_rows,
    )

    h = 1536
    for B in (2, 4, 8, 16):
        chunk = v3_chunk_rows(B, h, W=4096)
        assert chunk % 8 == 0
        assert 4 * B * chunk * h * 2 <= _V3_KV_VMEM_BUDGET
    assert v3_chunk_rows(2, h, W=4096) >= v3_chunk_rows(8, h, W=4096)
    # short windows collapse to one chunk
    assert v3_chunk_rows(2, h, W=200) == 200


def test_generate_fused_integration():
    """generate() with the knob forced on (interpret kernel on CPU) matches
    the XLA path's output SHAPE contract and produces in-vocab codes across
    a chunk boundary (cache_chunk windows slice axis 2 of the flat cache)."""
    cfg, params, _, _, _, _ = make_setup(False)
    cond = (
        jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.hidden_size)) * 0.3
    ).astype(jnp.bfloat16)

    from flux_generator_tpu.runtime.config import set_musicgen_loop

    set_musicgen_fused(True)
    set_musicgen_loop(cache_chunk=8)  # force >1 window chunk at 20 steps
    try:
        codes = mg.generate(
            params, cfg, cond, max_steps=20, top_k=4,
            key=jax.random.PRNGKey(4),
        )
    finally:
        set_musicgen_fused(None)
        set_musicgen_loop(cache_chunk=None)
    assert codes.shape == (1, cfg.num_codebooks, 20 - cfg.num_codebooks + 1)
    assert int(codes.min()) >= 0
    assert int(codes.max()) <= cfg.codebook_size


def test_decode_step_parity_batched():
    """n_samples=2 batched generation runs the kernel at B=4 (CFG 2x per
    sample) — exercises the pad_rows/per-b loops beyond the default B=2."""
    cfg, params, packed, cross_kv, b2, w = make_setup(False, n=2)
    h = cfg.hidden_size
    L = cfg.num_hidden_layers

    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, jnp.bfloat16)
    kc_f = jnp.zeros((L, b2, w, h), jnp.bfloat16)
    vc_f = jnp.zeros_like(kc_f)
    ckv_flat = tuple(a.reshape(L, b2, a.shape[2], h) for a in cross_kv)

    tok = jax.random.randint(
        jax.random.PRNGKey(5), (b2, 1, cfg.num_codebooks), 0,
        cfg.codebook_size,
    )
    lg_x, kc_x, vc_x = mg.decode_step(
        params, cfg, tok, cross_kv, kc_x, vc_x, jnp.int32(0)
    )
    lg_f, kc_f, vc_f = mg.decode_step_fused(
        packed, params, cfg, tok, ckv_flat, kc_f, vc_f, jnp.int32(0),
        interpret=True,
    )
    _check_step(lg_x, lg_f, kc_x, kc_f, cfg, b2, w)


@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
def test_decode_step_parity_b8_no_pad(impl):
    """n_samples=4 → B=8: the ys scratch needs NO zero-padding rows, which
    the original pad_rows turned into a zero-size vector Mosaic rejects
    ('vector types must have positive constant sizes but got 0, 1536' —
    first hit by bench --config musicgen --batch 4 on chip). Interpret mode
    pins the rows-only branch's numerics for both kernel impls."""
    from flux_generator_tpu.runtime.config import set_musicgen_fused_impl

    cfg, params, packed, cross_kv, b2, w = make_setup(False, n=4)
    h = cfg.hidden_size
    L = cfg.num_hidden_layers

    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, jnp.bfloat16)
    kc_f = jnp.zeros((L, b2, w, h), jnp.bfloat16)
    vc_f = jnp.zeros_like(kc_f)
    ckv_flat = tuple(a.reshape(L, b2, a.shape[2], h) for a in cross_kv)

    tok = jax.random.randint(
        jax.random.PRNGKey(5), (b2, 1, cfg.num_codebooks), 0,
        cfg.codebook_size,
    )
    lg_x, kc_x, vc_x = mg.decode_step(
        params, cfg, tok, cross_kv, kc_x, vc_x, jnp.int32(0)
    )
    set_musicgen_fused_impl(impl)
    try:
        lg_f, kc_f, vc_f = mg.decode_step_fused(
            packed, params, cfg, tok, ckv_flat, kc_f, vc_f, jnp.int32(0),
            interpret=True,
        )
    finally:
        set_musicgen_fused_impl(None)
    _check_step(lg_x, lg_f, kc_x, kc_f, cfg, b2, w)


def test_fused_impl_window_switch():
    """Long-form runs stay on the fused path but switch kernel impl: v2's
    blocked-input cache delivery thrashes VMEM past ~1500-step windows
    while v1's manual chunk DMA holds (measured crossover,
    runtime.config.musicgen_fused_max_steps)."""
    from flux_generator_tpu.runtime.config import (
        musicgen_fused_impl_for,
        set_musicgen_fused_impl,
        set_musicgen_fused_max_steps,
    )

    set_musicgen_fused_max_steps(4)
    try:
        assert musicgen_fused_impl_for(4) == "v2"
        assert musicgen_fused_impl_for(5) == "v1"
        set_musicgen_fused_impl("v2")  # explicit impl overrides auto
        assert musicgen_fused_impl_for(5) == "v2"
    finally:
        set_musicgen_fused_impl(None)
        set_musicgen_fused_max_steps(None)
    assert musicgen_fused_impl_for(1500) == "v2"
    assert musicgen_fused_impl_for(1501) == "v1"
    # batched serving always routes v1: r4 measured v1 ≡ v2 at n=4 (200 and
    # 500 steps), and v1 has no VMEM cliff at any window
    assert musicgen_fused_impl_for(200, n_samples=4) == "v1"
    assert musicgen_fused_impl_for(1500, n_samples=2) == "v1"
    set_musicgen_fused_impl("v2")
    try:
        assert musicgen_fused_impl_for(200, n_samples=4) == "v2"
    finally:
        set_musicgen_fused_impl(None)

    # generate() above the threshold runs the v1 kernel end-to-end
    cfg, params, _, _, _, _ = make_setup(False)
    cond = (
        jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.hidden_size)) * 0.3
    ).astype(jnp.bfloat16)
    set_musicgen_fused(True)
    set_musicgen_fused_max_steps(4)
    try:
        codes = mg.generate(
            params, cfg, cond, max_steps=8, top_k=4,
            key=jax.random.PRNGKey(4),
        )
    finally:
        set_musicgen_fused(None)
        set_musicgen_fused_max_steps(None)
    assert codes.shape == (1, cfg.num_codebooks, 8 - cfg.num_codebooks + 1)


def test_fused_falls_back_on_unpackable():
    """Grouped-int4 layouts must route generate() to the XLA path."""
    cfg, params, _, _, _, _ = make_setup(False)
    from flux_generator_tpu.ops.quant import quantize_tree

    qparams = dict(
        params,
        layers=quantize_tree(
            params["layers"], predicate=lambda node: True, bits=4,
            group_size=16,
        ),
    )
    assert not packable(qparams["layers"])
    cond = (
        jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.hidden_size)) * 0.3
    ).astype(jnp.bfloat16)
    set_musicgen_fused(True)
    try:
        codes = mg.generate(
            qparams, cfg, cond, max_steps=8, top_k=4,
            key=jax.random.PRNGKey(4),
        )
    finally:
        set_musicgen_fused(None)
    assert codes.shape == (1, cfg.num_codebooks, 8 - cfg.num_codebooks + 1)


@pytest.mark.parametrize("impl", ["v1", "v2", "v3"])
def test_decode_step_parity_f8_cache(impl):
    """f8 KV caches (FGT_MG_KV=f8) through every fused kernel: loads widen
    to bf16 in-kernel, new rows round to f8 on the way out. Parity against
    the XLA layer loop running the SAME f8 cache dtype; tolerances are
    looser than bf16 because the two paths round to f8 from different
    intermediate precisions (bf16 vs f32)."""
    from flux_generator_tpu.runtime.config import set_musicgen_fused_impl

    cfg, params, packed, cross_kv, b2, w = make_setup(False, w=16)
    h = cfg.hidden_size
    L = cfg.num_hidden_layers
    f8 = jnp.int8  # e4m3 BYTES (zeros == +0.0 in e4m3)

    kc_x, vc_x = mg.init_kv_cache(cfg, b2, w, f8)
    kc_f = jnp.zeros((L, b2, w, h), f8)
    vc_f = jnp.zeros_like(kc_f)
    ckv_flat = tuple(a.reshape(L, b2, a.shape[2], h) for a in cross_kv)

    key = jax.random.PRNGKey(2)
    set_musicgen_fused_impl(impl)
    try:
        for off in range(4):
            tok = jax.random.randint(
                jax.random.fold_in(key, off), (b2, 1, cfg.num_codebooks), 0,
                cfg.codebook_size,
            )
            lg_x, kc_x, vc_x = mg.decode_step(
                params, cfg, tok, cross_kv, kc_x, vc_x, jnp.int32(off)
            )
            lg_f, kc_f, vc_f = mg.decode_step_fused(
                packed, params, cfg, tok, ckv_flat, kc_f, vc_f, jnp.int32(off),
                interpret=True,
            )
            a = np.asarray(lg_x, np.float32)
            b = np.asarray(lg_f, np.float32)
            denom = max(1e-3, float(np.abs(a).max()))
            assert np.abs(a - b).max() / denom < 0.06, (
                off, np.abs(a - b).max() / denom)
    finally:
        set_musicgen_fused_impl(None)
    assert kc_f.dtype == f8


def test_store_kv_rows_f8_saturates():
    """e4m3fn has no inf: |x| > 448 would round to the NaN byte, which the
    kernel's arithmetic decode reads back as ±480 while the XLA bitcast
    load path propagates NaN — silent divergence. store_kv_rows must clamp
    so both decode paths agree at the format max."""
    from flux_generator_tpu.ops.pallas.decode_layer import (
        _f8_decode, store_kv_rows,
    )

    rows = jnp.array([[1000.0, -1000.0, 464.0, -464.0, 448.0, 3.5, 0.0]],
                     jnp.float32)
    enc = store_kv_rows(rows, jnp.int8)
    # kernel-side arithmetic decode
    dec_k = np.asarray(_f8_decode(enc, jnp.float32))
    # XLA-side bitcast decode (what decode_step's non-kernel path does)
    dec_x = np.asarray(
        jax.lax.bitcast_convert_type(enc, jnp.float8_e4m3fn).astype(
            jnp.float32)
    )
    expect = np.array([[448.0, -448.0, 448.0, -448.0, 448.0, 3.5, 0.0]])
    np.testing.assert_array_equal(dec_k, expect)
    np.testing.assert_array_equal(dec_x, expect)


def test_generate_f8_window_is_32_row_aligned():
    """int8 (f8-byte) caches tile at (32, 128) on TPU: generate() must
    allocate — and slice — the window in 32-row multiples, else the v1
    kernel's window DMA crosses a mid-tile boundary. Checked by tracing
    generate() with a max_steps that is 8- but not 32-aligned."""
    from flux_generator_tpu.runtime.config import (
        set_musicgen_fused, set_musicgen_kv_dtype,
    )

    cfg, params, _, _, _, _ = make_setup(False)
    cond = (
        jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.hidden_size))
        * 0.3
    ).astype(jnp.bfloat16)
    seen = {}
    orig = mg.decode_step_fused

    def spy(packed, params_, cfg_, tok, ckv, kc, vc, off, **kw):
        seen["window"] = kc.shape[2]
        seen["dtype"] = kc.dtype
        kw["interpret"] = True
        return orig(packed, params_, cfg_, tok, ckv, kc, vc, off, **kw)

    set_musicgen_fused(True)
    set_musicgen_kv_dtype("f8")
    mg.decode_step_fused = spy
    try:
        mg.generate(params, cfg, cond, max_steps=24, top_k=1,
                    key=jax.random.PRNGKey(0))
    finally:
        mg.decode_step_fused = orig
        set_musicgen_fused(None)
        set_musicgen_kv_dtype(None)
    assert seen["dtype"] == jnp.int8
    assert seen["window"] % 32 == 0, seen


def test_fused_impl_routing_f8_picks_v1():
    """Under FGT_MG_KV=f8 the auto impl must avoid v2 at every length: v2's
    fixed-size half-window blocks make the f8 decode cost full-block from
    step 0 (measured 2.61x vs bf16 6.41x realtime at 1000 steps)."""
    from flux_generator_tpu.runtime.config import (
        musicgen_fused_impl_for, set_musicgen_kv_dtype,
    )

    set_musicgen_kv_dtype("f8")
    try:
        for steps in (100, 1000, 2500):
            assert musicgen_fused_impl_for(steps) == "v1"
    finally:
        set_musicgen_kv_dtype(None)
    assert musicgen_fused_impl_for(100) == "v2"  # bf16 default unchanged
