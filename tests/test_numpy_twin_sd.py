"""Triangulation test for the SD/SDXL UNet math (VERDICT r2 #7): the JAX
forward must agree with an INDEPENDENT float64 numpy derivation ported
line-by-line from the reference's own MLX code (tests/twins/sd_unet_numpy.py
← /root/reference/stable_diffusion/stable_diffusion/unet.py:403-460). The
existing torch-twin parity test (test_hf_parity_sd.py) and this one now
come from different sources, closing the same-author blind spot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full-matrix tier: the float64 twin compile costs ~40 s on the 1-core CPU machine
pytestmark = pytest.mark.slow

from flux_generator_tpu.models.sd.config import tiny_unet_config
from flux_generator_tpu.models.sd.unet import init_unet, unet_forward

from .twins.sd_unet_numpy import sinusoidal_encoding, unet_forward_numpy


def _inputs(cfg, b=2, h=8, w=8, s=5, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, cfg.in_channels)), jnp.float32)
    t = jnp.asarray(rng.uniform(1, 999, (b,)), jnp.float32)
    enc = jnp.asarray(
        rng.standard_normal((b, s, cfg.cross_attention_dim[0])), jnp.float32
    )
    return x, t, enc


def test_sd_unet_matches_reference_math():
    cfg = tiny_unet_config()
    params = init_unet(jax.random.PRNGKey(7), cfg, jnp.float32)
    x, t, enc = _inputs(cfg)
    ours = np.asarray(unet_forward(params, cfg, x, t, enc))
    # t2d_gn_eps=1e-6 mirrors our diffusers-native Transformer2D eps;
    # everything else in the twin is the reference's math
    ref = unet_forward_numpy(params, cfg, x, t, enc, t2d_gn_eps=1e-6)
    scale = np.abs(ref).mean()
    err = np.max(np.abs(ours - ref)) / scale
    assert err < 1e-4, f"JAX UNet diverges from reference math: rel {err}"


def test_sdxl_text_time_matches_reference_math():
    """SDXL's added text_time conditioning path (unet.py:416-422)."""
    cfg = tiny_unet_config(
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 6 * 8,
    )
    params = init_unet(jax.random.PRNGKey(8), cfg, jnp.float32)
    x, t, enc = _inputs(cfg, seed=1)
    rng = np.random.default_rng(2)
    pooled = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    time_ids = jnp.asarray(
        np.tile([512, 512, 0, 0, 512, 512], (2, 1)), jnp.float32
    )
    ours = np.asarray(
        unet_forward(params, cfg, x, t, enc, text_time=(pooled, time_ids))
    )
    ref = unet_forward_numpy(
        params, cfg, x, t, enc, text_time=(pooled, time_ids), t2d_gn_eps=1e-6
    )
    scale = np.abs(ref).mean()
    err = np.max(np.abs(ours - ref)) / scale
    assert err < 1e-4, f"SDXL text_time path diverges: rel {err}"


def test_t2d_groupnorm_eps_divergence_is_bounded():
    """Reference (mlx default 1e-5) vs ours (diffusers-native 1e-6) inside
    Transformer2D is a KNOWN, documented divergence (models/sd/unet.py:216)
    — it must stay far below bf16 resolution."""
    cfg = tiny_unet_config()
    params = init_unet(jax.random.PRNGKey(7), cfg, jnp.float32)
    x, t, enc = _inputs(cfg)
    a = unet_forward_numpy(params, cfg, x, t, enc, t2d_gn_eps=1e-5)
    b = unet_forward_numpy(params, cfg, x, t, enc, t2d_gn_eps=1e-6)
    scale = np.abs(a).mean()
    rel = np.max(np.abs(a - b)) / scale
    assert rel < 1e-3, f"eps divergence unexpectedly large: {rel}"


def test_sinusoidal_parametrization_reduces_to_classic_form():
    """The mlx SinusoidalPositionalEncoding parametrization used by the
    reference (max_freq=1, min_freq=exp(-ln 1e4 + 2 ln 1e4/D), cos first)
    must equal the classic 10000^(-2i/D) transformer form our
    ops.embeddings.timestep_embedding implements."""
    from flux_generator_tpu.ops.embeddings import timestep_embedding

    t = np.asarray([0.0, 1.0, 47.5, 999.0], np.float32)
    d = 32
    ref = sinusoidal_encoding(t, d)
    ours = np.asarray(
        timestep_embedding(jnp.asarray(t), d, time_factor=1.0), np.float64
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4)
