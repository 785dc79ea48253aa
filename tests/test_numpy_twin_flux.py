"""Triangulation test for the Flux MMDiT math (VERDICT r2 #7): the JAX
forward must agree with an INDEPENDENT float64 numpy derivation ported
line-by-line from the reference's own MLX code (tests/twins/flux_numpy.py
← /root/reference/flux/model.py:99-136, flux/layers.py). The existing
torch-twin parity test (test_hf_parity_flux.py) and this one now come from
different sources, closing the same-author blind spot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.models.flux.model import (
    flux_forward, init_flux, tiny_flux_config,
)
from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

from .twins.flux_numpy import flux_forward_numpy, timestep_embedding as np_temb


def _inputs(cfg, b=2, h=8, w=8, s=6, seed=0):
    rng = np.random.default_rng(seed)
    img = pack_latents(jnp.asarray(
        rng.standard_normal((b, h, w, cfg.in_channels // 4)), jnp.float32))
    img_ids = latent_ids(b, h, w)
    txt = jnp.asarray(rng.standard_normal((b, s, cfg.context_in_dim)), jnp.float32)
    txt_ids = jnp.zeros((b, s, 3), jnp.int32)
    t = jnp.asarray(rng.uniform(0.1, 0.9, (b,)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.float32)
    return img, img_ids, txt, txt_ids, t, y


@pytest.mark.parametrize("guidance_embed", [False, True])
def test_flux_forward_matches_reference_math(guidance_embed):
    cfg = tiny_flux_config(guidance_embed=guidance_embed)
    params = init_flux(jax.random.PRNGKey(3), cfg, jnp.float32)
    img, img_ids, txt, txt_ids, t, y = _inputs(cfg)
    guidance = jnp.full((2,), 4.0, jnp.float32) if guidance_embed else None

    ours = np.asarray(flux_forward(params, cfg, img, img_ids, txt, txt_ids,
                                   t, y, guidance=guidance, use_pallas=False))
    # qk_eps=1e-6 mirrors our rms_norm: everything else in the twin is the
    # reference's math, so this must match to float32 round-off
    ref = flux_forward_numpy(params, cfg, img, img_ids, txt, txt_ids, t, y,
                             guidance=guidance, qk_eps=1e-6)
    err = np.max(np.abs(ours - ref))
    assert err < 1e-4, f"JAX forward diverges from reference math: {err}"


def test_qknorm_eps_divergence_is_bounded():
    """The reference's mlx RMSNorm eps (1e-5) vs ours (1e-6) is a KNOWN,
    documented divergence; it must stay far below bf16 resolution."""
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(3), cfg, jnp.float32)
    img, img_ids, txt, txt_ids, t, y = _inputs(cfg)
    a = flux_forward_numpy(params, cfg, img, img_ids, txt, txt_ids, t, y,
                           qk_eps=1e-5)
    b = flux_forward_numpy(params, cfg, img, img_ids, txt, txt_ids, t, y,
                           qk_eps=1e-6)
    scale = np.abs(a).mean()
    rel = np.max(np.abs(a - b)) / scale
    assert rel < 1e-3, f"qk-eps divergence unexpectedly large: {rel}"


def test_timestep_embedding_matches():
    t = jnp.asarray([0.0, 0.25, 1.0], jnp.float32)
    from flux_generator_tpu.ops.embeddings import timestep_embedding

    ours = np.asarray(timestep_embedding(t, 256))
    ref = np_temb(np.asarray(t), 256)
    # at t=1.0 the lowest-frequency angle is 1000 rad: one f32 ulp of the
    # angle (~1.2e-4 rad) moves cos by the same order — pure round-off
    assert np.max(np.abs(ours - ref)) < 5e-4
