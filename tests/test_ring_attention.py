"""Ring attention (sequence parallel) vs single-device reference on the fake
8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flux_generator_tpu.ops.attention import dot_product_attention
from flux_generator_tpu.ops.rope import apply_rope, rope_cos_sin
from flux_generator_tpu.parallel.mesh import create_mesh
from flux_generator_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_matches_reference(n_shards):
    mesh = create_mesh(data=1, model=n_shards,
                       devices=jax.devices()[:n_shards])
    b, l, h, d = 1, 64, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, l, h, d))
    k = jax.random.normal(ks[1], (b, l, h, d))
    v = jax.random.normal(ks[2], (b, l, h, d))

    ref = dot_product_attention(q, k, v)

    spec = NamedSharding(mesh, P(None, "model"))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = ring_attention(qs, ks_, vs, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_with_rope_prefix():
    """RoPE applied before ring attention (sharded elementwise) must equal the
    fused single-device path."""
    mesh = create_mesh(data=1, model=4, devices=jax.devices()[:4])
    b, l, h, d = 2, 32, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, l, h, d))
    k = jax.random.normal(ks[1], (b, l, h, d))
    v = jax.random.normal(ks[2], (b, l, h, d))
    pos = jnp.broadcast_to(jnp.arange(l, dtype=jnp.float32), (b, l))
    cos, sin = rope_cos_sin(pos, d)

    qr, kr = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    ref = dot_product_attention(qr, kr, v)

    spec = NamedSharding(mesh, P(None, "model"))
    out = ring_attention(
        jax.device_put(qr, spec), jax.device_put(kr, spec), jax.device_put(v, spec),
        mesh,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_under_jit():
    mesh = create_mesh(data=1, model=4, devices=jax.devices()[:4])
    b, l, h, d = 1, 32, 1, 8
    q = jax.random.normal(jax.random.PRNGKey(2), (b, l, h, d))
    ref = dot_product_attention(q, q, q)
    spec = NamedSharding(mesh, P(None, "model"))
    qs = jax.device_put(q, spec)
    f = jax.jit(lambda a: ring_attention(a, a, a, mesh))
    np.testing.assert_allclose(np.asarray(f(qs)), np.asarray(ref), atol=2e-5)
