import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.models.sd import sampler as smp
from flux_generator_tpu.models.sd.config import (
    DiffusionConfig,
    tiny_sd_ae_config,
    tiny_unet_config,
)
from flux_generator_tpu.models.sd.unet import init_unet, unet_forward
from flux_generator_tpu.models.sd.vae import init_sd_vae, sd_vae_decode, sd_vae_encode

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def test_sigmas_monotone():
    sig = smp.make_sigmas(DiffusionConfig())
    assert sig[0] == 0
    assert np.all(np.diff(sig) > 0)
    assert len(sig) == 1001


def test_interp_sigma_endpoints():
    sig = smp.make_sigmas(DiffusionConfig())
    np.testing.assert_allclose(float(smp.interp_sigma(sig, 0.0)), 0.0)
    np.testing.assert_allclose(float(smp.interp_sigma(sig, 1000.0)), sig[-1], rtol=1e-6)
    mid = float(smp.interp_sigma(sig, 500.5))
    assert sig[500] < mid < sig[501]


def test_euler_step_denoises_exactly_with_true_eps():
    """If eps_pred is the true noise, stepping to t=0 recovers x0."""
    sig = smp.make_sigmas(DiffusionConfig())
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = 800.0
    s = float(smp.interp_sigma(sig, t))
    x_t = (x0 + noise * s) / np.sqrt(s**2 + 1)
    x_prev = smp.euler_step(sig, noise, x_t, jnp.asarray(t), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), atol=1e-4)


def test_ancestral_step_reduces_to_euler_at_zero_sigma_up():
    sig = smp.make_sigmas(DiffusionConfig())
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    # t_prev=0 → sigma_prev=0 → sigma_up=0 → deterministic
    a = smp.euler_ancestral_step(jax.random.PRNGKey(4), sig, eps, x, jnp.asarray(500.0), jnp.asarray(0.0))
    b = smp.euler_step(sig, eps, x, jnp.asarray(500.0), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.fixture(scope="module")
def unet():
    cfg = tiny_unet_config()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_unet_shapes(unet):
    params, cfg = unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.full((2,), 500.0)
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 6, cfg.cross_attention_dim[0]))
    out = unet_forward(params, cfg, x, t, enc)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet_text_time():
    cfg = tiny_unet_config(
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=8 + 48,
    )
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.cross_attention_dim[0]))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 8))
    time_ids = jnp.array([[512, 512, 0, 0, 512, 512.0]])
    out = unet_forward(params, cfg, x, jnp.full((1,), 1.0), enc, text_time=(pooled, time_ids))
    assert out.shape == x.shape


def test_sd_vae_roundtrip():
    cfg = tiny_sd_ae_config()
    params = init_sd_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    mean, logvar = sd_vae_encode(params, cfg, x)
    assert mean.shape == (1, 8, 8, 4)
    assert logvar.shape == (1, 8, 8, 4)
    y = sd_vae_decode(params, cfg, mean)
    assert y.shape == (1, 16, 16, 3)


def test_flop_count_unrolls_stacked_transformer_layers():
    """bench MFU accounting regression (r4 found SDXL '20.4% MFU' was an
    artifact): XLA cost_analysis counts a lax.scan body ONCE regardless of
    trip count, so the stacked transformer layers (SDXL: 10 per site) were
    invisible to the rolled count. bench._xla_flops must unroll the block
    scan (unet._FLOP_COUNT_UNROLL) so every stacked layer is counted."""
    import bench

    x = jnp.zeros((1, 16, 16, 4), jnp.float32)
    ts = jnp.zeros((1,), jnp.float32)
    enc = jnp.zeros((1, 7, 16), jnp.float32)

    def counts(n_layers):
        cfg = tiny_unet_config(
            transformer_layers_per_block=(n_layers, n_layers))
        params = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
        f = jax.jit(lambda p, xx, t, e: unet_forward(p, cfg, xx, t, e))
        unrolled = bench._xla_flops(f, params, x, ts, enc)
        f.clear_cache()
        ca = f.lower(params, x, ts, enc).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), unrolled

    rolled1, unrolled1 = counts(1)
    rolled6, unrolled6 = counts(6)
    if rolled1 == 0.0:  # backend without a cost model: nothing to check
        pytest.skip("cost_analysis exposes no flops on this backend")
    # 1-layer scans count correctly either way
    assert abs(unrolled1 - rolled1) < 0.01 * rolled1
    # the regression that matters: the unrolled count must grow with the
    # stacked layers (6 layers at 2 sites vs 1: measured 55.3M vs 15.7M
    # flops on the tiny config)
    assert unrolled6 > 3.0 * unrolled1
    if rolled6 < 1.05 * rolled1:
        # the known jaxlib artifact: cost_analysis counts a scan body once
        # regardless of trip count, hiding 5 of every 6 stacked layers —
        # the reason bench._xla_flops unrolls. Only check the fix's effect
        # while the artifact exists; a future jaxlib that counts trips
        # correctly makes this branch (not the test) obsolete.
        assert unrolled6 > 3.0 * rolled6
