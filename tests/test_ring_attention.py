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


@pytest.mark.parametrize("n_shards", [
    2,
    pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow),
])
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_flux_pipeline_dispatches_ring_attention():
    """End-to-end seam test (VERDICT r1 next #9): the SAME flux forward must
    produce the same output with ring attention enabled on an 8-device mesh
    as with the single-device einsum path, at a sequence length right at the
    dispatch threshold."""
    import jax.numpy as jnp

    from flux_generator_tpu.models.flux.model import flux_forward, init_flux, tiny_flux_config
    from flux_generator_tpu.pipelines.flux import FluxPipeline, latent_ids, pack_latents
    from flux_generator_tpu.runtime.config import set_ring_attention

    cfg = tiny_flux_config()
    key = jax.random.PRNGKey(0)
    params = init_flux(key, cfg, jnp.float32)

    b, h, w = 1, 16, 16  # 64 img tokens + 16 txt = 80 total (div by 8)
    img = pack_latents(jax.random.normal(key, (b, h, w, cfg.in_channels // 4), jnp.float32))
    img_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.fold_in(key, 1), (b, 16, cfg.context_in_dim), jnp.float32)
    txt_ids = jnp.zeros((b, 16, 3), jnp.int32)
    t = jnp.array([0.5], jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 2), (b, cfg.vec_in_dim), jnp.float32)

    args = (img, img_ids, txt, txt_ids, t, y)
    ref = np.asarray(flux_forward(params, cfg, *args))

    pipe = FluxPipeline(
        "flux-schnell", {"flow": params}, cfg, None, None, None,
        dtype=jnp.float32,
    )
    pipe.enable_ring_attention(threshold=80)  # mesh over all 8 fake devices
    try:
        got = np.asarray(flux_forward(params, cfg, *args))
    finally:
        set_ring_attention(None)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)
    # below the threshold nothing changes either (sanity that the switch is
    # length-gated, not global)
    pipe.enable_ring_attention(threshold=10_000)
    try:
        got2 = np.asarray(flux_forward(params, cfg, *args))
    finally:
        set_ring_attention(None)
    np.testing.assert_allclose(got2, ref, atol=0, rtol=0)
