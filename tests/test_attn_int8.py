"""int8-MXU flash attention (FGT_ATTN_INT8) quality budget.

Both kernel paths (one-shot and streamed) can feed their MXU dots as
int8xint8->int32 (2x bf16 throughput on v5e) in two tiers: "qk" quantizes
only the logits dot
(per-row q/k max-abs scales factor out exactly — the quality-safe tier),
"full" also quantizes the PV dot (softmax weights per-row-in-block, V per
column). These tests bound the numerics in interpret mode; the knob stays
default-off behind the same real-weight image gate as FGT_W8A8
(tests/test_quant_quality.py). Measured here (1024 tokens, 256-blocks,
unit-normal q/k/v): qk ~0.6% max / 0.05% mean; full ~2.7% max / 0.3% mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.ops.attention import dot_product_attention
from flux_generator_tpu.ops.pallas.flash_attention import flash_attention
from flux_generator_tpu.runtime.config import set_attn_int8, set_flash_attention


def _mk(l, b=1, h=2, d=64, seed=0, dtype=jnp.float32, scale=1.0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, l, h, d), dtype) * scale
    k = jax.random.normal(ks[1], (b, l, h, d), dtype) * scale
    v = jax.random.normal(ks[2], (b, l, h, d), dtype)
    return q, k, v


def _errs(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    den = max(np.abs(b).max(), 1e-9)
    e = np.abs(a - b)
    return float(e.max() / den), float(e.mean() / den)


def _streamed(q, k, v, mode, cos=None, sin=None):
    # Calls the jitted core directly: the public wrapper refuses int8 on
    # the streamed path (measured regression at 16k tokens — see
    # test_int8_streamed_guard), but the kernel tier stays quality-bounded
    # here in case a future hardware generation flips the tradeoff.
    from flux_generator_tpu.ops.pallas.flash_attention import (
        _flash_attention_jit,
    )

    return _flash_attention_jit(q, k, v, cos, sin, scale=None,
                                interpret=True, blk_k=256, one_shot_max=256,
                                blk_q=256, int8_mxu=mode)


def test_int8_streamed_guard():
    """The public wrapper must IGNORE the int8 tiers once the call would
    take the streamed path: measured 2048² flux regression (qk 31.7 s /
    full 17.1 s vs 14.2 s bf16 dots, BENCH_RESULTS.md)."""
    q, k, v = _mk(1024)
    set_flash_attention(one_shot_max=256, blk_q=256, blk_k=256)
    try:
        base = flash_attention(q, k, v, interpret=True)
        set_attn_int8("full")
        out = flash_attention(q, k, v, interpret=True)
    finally:
        set_attn_int8(None)
        set_flash_attention()
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


@pytest.mark.parametrize("mode,max_bound,mean_bound", [
    ("qk", 1.5e-2, 1.5e-3),
    ("full", 5e-2, 5e-3),
])
def test_int8_streamed_error_budget(mode, max_bound, mean_bound):
    q, k, v = _mk(1024)
    ref = dot_product_attention(q, k, v)
    base = _streamed(q, k, v, "")
    out8 = _streamed(q, k, v, mode)
    e_base, _ = _errs(base, ref)
    assert e_base < 5e-3, e_base
    e_max, e_mean = _errs(out8, ref)
    assert e_max < max_bound, (mode, e_max)
    assert e_mean < mean_bound, (mode, e_mean)
    # the knob is live (numerics actually change)
    assert _errs(out8, base)[0] > 1e-6


def test_int8_diffuse_attention_not_collapsed():
    """Near-uniform attention (small logits) is the worst case for weight
    quantization: per-row in-block scaling must keep the output a true
    average, not a hard max."""
    l = 768
    q, k, v = _mk(l, h=1, seed=7, scale=0.1)
    ref = dot_product_attention(q, k, v)
    out8 = _streamed(q, k, v, "full")
    err = float(np.abs(np.asarray(out8) - np.asarray(ref)).max())
    assert err < 2.5e-2 * float(np.abs(np.asarray(v)).max()), err


def test_int8_off_is_bit_exact_one_shot():
    """Default-off means the one-shot path keeps the bit-exact bf16/f32
    single-tile math."""
    q, k, v = _mk(512, seed=3)
    base = flash_attention(q, k, v, interpret=True)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


@pytest.mark.parametrize("mode,max_bound,mean_bound", [
    ("qk", 1.5e-2, 1.5e-3),
    ("full", 5e-2, 5e-3),
])
def test_int8_one_shot_error_budget(mode, max_bound, mean_bound):
    """The tiers also apply on the one-shot path (≤ ONE_SHOT_MAX), so an
    opted-in 1024²-class geometry gets the int8 dots too. Same budget as
    streamed; the 'full' tier's p-scale is the exact constant 1/127 here
    (single softmax ⇒ every row peaks at 1)."""
    q, k, v = _mk(512, seed=3)
    ref = dot_product_attention(q, k, v)
    set_attn_int8(mode)
    try:
        out8 = flash_attention(q, k, v, interpret=True)  # one-shot path
    finally:
        set_attn_int8(None)
    e_max, e_mean = _errs(out8, ref)
    assert e_max < max_bound, (mode, e_max)
    assert e_mean < mean_bound, (mode, e_mean)
    base = flash_attention(q, k, v, interpret=True)
    assert _errs(out8, base)[0] > 1e-6  # knob is live


@pytest.mark.parametrize("mode", ["qk", "full"])
def test_int8_one_shot_with_padding(mode):
    """Non-block-multiple lengths pad K with zero rows; the zero-row
    quantization scale floor (1e-20) must not poison the masked logits."""
    q, k, v = _mk(300, seed=5)  # pads to 512 at BLK_Q=256
    ref = dot_product_attention(q, k, v)
    set_attn_int8(mode)
    try:
        out8 = flash_attention(q, k, v, interpret=True)
    finally:
        set_attn_int8(None)
    assert out8.shape == ref.shape
    e_max, _ = _errs(out8, ref)
    assert e_max < 5e-2, (mode, e_max)


def test_int8_one_shot_with_fused_rope():
    """One-shot keeps the in-kernel (fused) rotation; int8 quantization
    happens on the rotated q/k and composes with it."""
    from flux_generator_tpu.ops.rope import rope_cos_sin

    l, d = 384, 64
    q, k, v = _mk(l, d=d, seed=13)
    pos = jnp.arange(l)[None].astype(jnp.float32)
    cos, sin = rope_cos_sin(pos, d, theta=10000.0)
    ref = flash_attention(q, k, v, cos, sin, interpret=True)
    set_attn_int8("qk")
    try:
        out8 = flash_attention(q, k, v, cos, sin, interpret=True)
    finally:
        set_attn_int8(None)
    assert _errs(out8, ref)[0] < 1.5e-2


@pytest.mark.parametrize("mode", ["qk", "full"])
def test_int8_with_rope_prerotation(mode):
    """The streamed path pre-rotates q/k in HBM before the kernel; int8
    quantization composes with RoPE (2048²-geometry miniature)."""
    from flux_generator_tpu.ops.rope import rope_cos_sin

    l, d = 1024, 64
    q, k, v = _mk(l, d=d, seed=11)
    pos = jnp.arange(l)[None].astype(jnp.float32)
    cos, sin = rope_cos_sin(pos, d, theta=10000.0)
    ref = flash_attention(q, k, v, cos, sin, interpret=True)  # bf16/f32 path
    out8 = _streamed(q, k, v, mode, cos, sin)
    assert _errs(out8, ref)[0] < 5e-2
