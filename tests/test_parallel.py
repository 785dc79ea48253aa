"""Mesh/sharding tests on the 8 fake CPU devices (SURVEY §4: the reference
has no distributed tests; these validate the GSPMD TP/DP path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flux_generator_tpu.models.flux.model import flux_forward, init_flux, tiny_flux_config
from flux_generator_tpu.parallel.mesh import create_mesh
from flux_generator_tpu.parallel.sharding import logical_sharding, shard_params


def test_mesh_axes():
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharding_rules_classify_kernels():
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(data=2, model=4)
    shardings = logical_sharding(params, mesh)
    qkv = shardings["double_blocks"]["img_attn"]["qkv"]["kernel"]
    proj = shardings["double_blocks"]["img_attn"]["proj"]["kernel"]
    # stacked kernels: leading layer axis never sharded
    assert qkv.spec == P(None, None, "model")
    assert proj.spec == P(None, "model", None)
    # norms replicated
    assert shardings["double_blocks"]["img_attn"]["q_norm"]["scale"].spec == P()


@pytest.mark.slow
def test_tp_forward_matches_replicated():
    """Tensor-parallel sharded flux forward must equal the single-device
    result bit-for-bit up to float tolerance."""
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    b, l_img, l_txt = 2, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (b, l_img, cfg.in_channels))
    img_ids = jnp.zeros((b, l_img, 3), jnp.int32)
    txt = jax.random.normal(ks[1], (b, l_txt, cfg.context_in_dim))
    txt_ids = jnp.zeros((b, l_txt, 3), jnp.int32)
    t = jnp.full((b,), 0.5)
    y = jax.random.normal(ks[2], (b, cfg.vec_in_dim))

    ref = flux_forward(params, cfg, img, img_ids, txt, txt_ids, t, y)

    mesh = create_mesh(data=2, model=4)
    sharded = shard_params(params, mesh)
    data_in = jax.device_put(
        (img, img_ids, txt, txt_ids, t, y),
        NamedSharding(mesh, P("data")),
    )
    fwd = jax.jit(lambda p, *a: flux_forward(p, cfg, *a))
    with mesh:
        out = fwd(sharded, *data_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_pipeline_shard_denoise():
    """FluxPipeline.shard() TP-shards weights; denoise still matches the
    unsharded result."""
    from flux_generator_tpu.pipelines.flux import FluxPipeline, latent_ids, pack_latents

    pipe = FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)
    b, h, w = 1, 4, 4
    zc = pipe.ae_cfg.z_channels
    x_t = pack_latents(jax.random.normal(jax.random.PRNGKey(0), (b, h, w, zc)))
    x_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.PRNGKey(1), (b, 4, pipe.flow_cfg.context_in_dim))
    txt_ids = jnp.zeros((b, 4, 3), jnp.int32)
    vec = jax.random.normal(jax.random.PRNGKey(2), (b, pipe.flow_cfg.vec_in_dim))

    ref = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, 2, 4.0)
    pipe.shard(create_mesh(data=1, model=4, devices=jax.devices()[:4]))
    out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, 2, 4.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_dp_batch_sharded_forward():
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(data=8, model=1)
    b = 8
    img = jax.random.normal(jax.random.PRNGKey(2), (b, 4, cfg.in_channels))
    ref = flux_forward(
        params, cfg, img, jnp.zeros((b, 4, 3), jnp.int32),
        jnp.ones((b, 2, cfg.context_in_dim)), jnp.zeros((b, 2, 3), jnp.int32),
        jnp.full((b,), 0.3), jnp.ones((b, cfg.vec_in_dim)),
    )
    sharded_img = jax.device_put(img, NamedSharding(mesh, P("data")))
    with mesh:
        out = flux_forward(
            params, cfg, sharded_img, jnp.zeros((b, 4, 3), jnp.int32),
            jnp.ones((b, 2, cfg.context_in_dim)), jnp.zeros((b, 2, 3), jnp.int32),
            jnp.full((b,), 0.3), jnp.ones((b, cfg.vec_in_dim)),
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
