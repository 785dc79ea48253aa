"""Pallas int4 matmul kernel vs the XLA dense() dequant path (interpret mode
on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.ops.linear import dense, init_dense
from flux_generator_tpu.ops.pallas.int4_matmul import int4_matmul, supported
from flux_generator_tpu.ops.quant import quantize_dense


def _quantized(key, K, N, group_size=None):
    p = init_dense(key, K, N, bias=False, dtype=jnp.float32)
    return quantize_dense(p, bits=4, group_size=group_size, pack=True)


@pytest.mark.parametrize("group_size", [
    None,
    pytest.param(128, marks=pytest.mark.slow),
    pytest.param(256, marks=pytest.mark.slow),
])
def test_int4_matmul_matches_dense(group_size):
    K, N, M = 2048, 640, 96
    q = _quantized(jax.random.PRNGKey(0), K, N, group_size)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
    ref = dense(q, x)
    out = int4_matmul(x, q["kernel_q4"], q["kernel_scale"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_int4_matmul_batched_lead_dims():
    K, N = 2048, 512
    q = _quantized(jax.random.PRNGKey(2), K, N, 128)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, K), jnp.float32)
    ref = dense(q, x)
    out = int4_matmul(x, q["kernel_q4"], q["kernel_scale"], interpret=True)
    assert out.shape == (2, 7, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int4_matmul_small_m_ar_decode_shape():
    """M=2 (CFG batch, one token) — the MusicGen AR-loop shape."""
    K, N = 1024, 1536
    q = _quantized(jax.random.PRNGKey(4), K, N, 64)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1, K), jnp.float32)
    ref = dense(q, x)
    out = int4_matmul(x, q["kernel_q4"], q["kernel_scale"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_supported_predicate():
    K = 2048
    assert supported(K, jnp.ones((K // 128, 64)))
    assert supported(K, jnp.ones((64,)))
    assert not supported(1000, jnp.ones((64,)))        # packed rows unaligned
    assert not supported(K, jnp.ones((K // 1024, 64)))  # group 1024 > BK


@pytest.mark.parametrize("K,N,M,gs", [
    (1024, 384, 1, 64),     # N needs padding; M=1
    (2560, 512, 17, None),  # per-channel; odd M
    (1536, 640, 33, 128),   # bk=256 path (Kp=768)
    (2048, 128, 8, 256),
])
@pytest.mark.slow
def test_int4_matmul_shape_sweep(K, N, M, gs):
    """Shape fuzz across block-padding and bk-selection paths."""
    q = _quantized(jax.random.PRNGKey(K + N), K, N, gs)
    x = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.float32)
    ref = dense(q, x)
    out = int4_matmul(x, q["kernel_q4"], q["kernel_scale"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
