"""Parity tests for the fused W8A8 Pallas matmul (ops/pallas/w8a8_matmul):
in-kernel per-(row, k-block) activation quantization + int8 MXU dots must
agree with (a) the plain dequantized-weight matmul up to activation-quant
error and (b) the XLA W8A8 formulation in ops/linear.dense up to the scale
granularity difference (per-row-per-block is strictly finer than per-row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.ops.pallas.w8a8_matmul import (
    quantize_rows,
    supported,
    w8a8_matmul,
)


def _mk(key, M, K, N, dtype=jnp.float32):
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (M, K), dtype)
    w = jax.random.normal(kw, (K, N), jnp.float32)
    ws = jnp.max(jnp.abs(w), axis=0) / 127.0
    wq = jnp.round(w / ws).astype(jnp.int8)
    return x, wq, ws


def _xla_w8a8(x, wq, ws):
    """The ops/linear.dense W8A8 branch, inlined (per-row full-K scales)."""
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-8)
    x_q = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(x.dtype) * sx.astype(x.dtype) * ws.astype(x.dtype)


@pytest.mark.parametrize("shape", [(64, 1024, 256), (200, 1536, 700),
                                   (16, 512, 128)])
@pytest.mark.slow
def test_w8a8_matmul_parity(shape):
    M, K, N = shape
    x, wq, ws = _mk(jax.random.PRNGKey(0), M, K, N)
    assert supported(K, ws)
    ref = x @ (wq.astype(jnp.float32) * ws)        # weight-quant-only truth
    xla = _xla_w8a8(x, wq, ws)
    out = w8a8_matmul(x, wq, ws, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    # activation-quant error vs the bf16-activation truth
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 0.02
    # per-block scales are finer than the XLA path's per-row — at least as
    # accurate, and close to it
    assert float(jnp.max(jnp.abs(out - xla))) / scale < 0.03
    err_pallas = float(jnp.mean(jnp.abs(out - ref)))
    err_xla = float(jnp.mean(jnp.abs(xla - ref)))
    assert err_pallas <= err_xla * 1.25, (err_pallas, err_xla)


def test_w8a8_matmul_lead_dims_and_bf16():
    M, K, N = 96, 1024, 384
    x, wq, ws = _mk(jax.random.PRNGKey(1), M, K, N, jnp.bfloat16)
    out2 = w8a8_matmul(x, wq, ws, interpret=True)
    out3 = w8a8_matmul(x.reshape(4, 24, K), wq, ws, interpret=True)
    assert out3.shape == (4, 24, N)
    assert out2.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out3.reshape(M, N)),
                                  np.asarray(out2))


def test_w8a8_zero_rows_safe():
    """All-zero activation rows must not NaN (amax guard)."""
    K, N = 512, 128
    x = jnp.zeros((16, K), jnp.float32)
    _, wq, ws = _mk(jax.random.PRNGKey(2), 4, K, N)
    out = w8a8_matmul(x, wq, ws, interpret=True)
    assert not bool(jnp.any(jnp.isnan(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_quantize_rows_matches_xla_quant():
    x = jax.random.normal(jax.random.PRNGKey(3), (100, 768), jnp.float32)
    xq, sx = quantize_rows(x, interpret=True)
    sx_ref = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    xq_ref = jnp.round(x / sx_ref).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))
    np.testing.assert_allclose(np.asarray(sx), np.asarray(sx_ref), rtol=1e-6)


def test_supported_guards():
    assert not supported(100, jnp.ones((64,)))          # K doesn't tile
    assert not supported(1024, jnp.ones((8, 64)))       # grouped scales
    assert supported(1024, jnp.ones((64,)))


@pytest.mark.parametrize("impl", ["pq", "pallas"])
def test_dense_w8a8_impl_parity(impl, monkeypatch):
    """ops/linear.dense with FGT_W8A8=1 + each FGT_W8A8_IMPL must agree with
    the XLA formulation (tolerance = activation-quant granularity). Runs the
    kernels in interpret mode on the CPU test backend."""
    from flux_generator_tpu.ops import linear

    monkeypatch.setenv("FGT_W8A8_IMPL", impl)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 48, 512), jnp.float32)
    _, wq, ws = _mk(jax.random.PRNGKey(6), 4, 512, 256)
    p = {"kernel_q": wq, "kernel_scale": ws,
         "bias": jnp.arange(256, dtype=jnp.float32) * 0.01}
    linear.set_w8a8(True)
    try:
        monkeypatch.setenv("FGT_W8A8_IMPL", "xla")
        ref = linear.dense(p, x)
        monkeypatch.setenv("FGT_W8A8_IMPL", impl)
        out = linear.dense(p, x)
    finally:
        linear.set_w8a8(None)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 0.03
