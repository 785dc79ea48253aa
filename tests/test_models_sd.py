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
