import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.pipelines.sd import StableDiffusion, StableDiffusionXL

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


class _FakeTokenizer:
    def tokenize(self, text):
        toks = [1] + [min(60, 3 + ord(c) % 50) for c in text[:6]] + [63]
        return toks


@pytest.fixture(scope="module")
def sd():
    pipe = StableDiffusion.random_init(tiny=True)
    pipe.tokenizers = [_FakeTokenizer()]
    return pipe


@pytest.fixture(scope="module")
def sdxl():
    pipe = StableDiffusionXL.random_init(tiny=True)
    pipe.tokenizers = [_FakeTokenizer(), _FakeTokenizer()]
    return pipe


def test_sd_generate_latents(sd):
    latents = list(sd.generate_latents("a cat", num_steps=2, latent_size=(8, 8), seed=7))
    assert len(latents) == 2
    assert latents[-1].shape == (1, 8, 8, 4)
    img = sd.decode(latents[-1])
    assert img.shape == (1, 16, 16, 3)
    assert (np.asarray(img) >= 0).all() and (np.asarray(img) <= 1).all()


def test_sd_seed_reproducible(sd):
    a = list(sd.generate_latents("a cat", num_steps=1, latent_size=(8, 8), seed=3))[-1]
    b = list(sd.generate_latents("a cat", num_steps=1, latent_size=(8, 8), seed=3))[-1]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sd_cfg_changes_output(sd):
    a = list(sd.generate_latents("a cat", num_steps=1, cfg_weight=7.5, latent_size=(8, 8), seed=3))[-1]
    b = list(sd.generate_latents("a cat", num_steps=1, cfg_weight=0.0, latent_size=(8, 8), seed=3))[-1]
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_sd_fused_denoise_matches_generator(sd):
    cond = sd.get_text_conditioning("a cat", 1, 0.0, "")
    key = jax.random.PRNGKey(11)
    from flux_generator_tpu.models.sd import sampler as smp

    k_prior, k_steps = jax.random.split(key)
    x_T = smp.sample_prior(k_prior, sd.sigmas, (1, 8, 8, 4), sd.dtype)
    fused = sd._denoise(
        sd.params["unet"], x_T,
        jnp.asarray(smp.timesteps(sd.sigmas, 2), jnp.float32),
        cond, jnp.asarray(0.0, jnp.float32), k_steps, cfg_on=False,
    )
    ts = smp.timesteps(sd.sigmas, 2)
    x = x_T
    for i in range(2):
        x = sd._step(
            sd.params["unet"], x, jnp.asarray(ts[i]), jnp.asarray(ts[i + 1]),
            cond, jnp.asarray(0.0, jnp.float32), jax.random.fold_in(k_steps, i), False, None,
        )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(x), atol=1e-5)


def test_sd_img2img(sd):
    img = jnp.zeros((16, 16, 3))
    latents = list(
        sd.generate_latents_from_image(img, "a cat", strength=0.5, num_steps=4, seed=5)
    )
    assert len(latents) == 2  # int(4 * 0.5)
    assert latents[-1].shape == (1, 8, 8, 4)


def test_sdxl_generate(sdxl):
    latents = list(
        sdxl.generate_latents("a cat", num_steps=2, cfg_weight=0.0, latent_size=(8, 8), seed=1)
    )
    assert len(latents) == 2
    img = sdxl.decode(latents[-1])
    assert img.shape == (1, 16, 16, 3)


def test_sdxl_conditioning_shapes(sdxl):
    cond, pooled = sdxl.get_text_conditioning("hi", 2, 0.0, "")
    assert cond.shape[0] == 2 and cond.shape[-1] == 16  # concat of two 8-dim encoders
    assert pooled.shape == (2, 8)


def test_sd_decode_u8_matches_host_conversion(sd):
    x_t = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 8, 4), jnp.float32)
    f = np.asarray(sd.decode(x_t))
    u8 = np.asarray(sd.decode_u8(x_t))
    assert u8.dtype == np.uint8
    expect = (np.clip(f.astype(np.float32), 0, 1) * 255).astype(np.uint8)
    assert np.max(np.abs(u8.astype(int) - expect.astype(int))) <= 1


def test_sd_batch_matches_singles(sd):
    """generate_latents_batch (the serving coalescer's entry) must give each
    prompt/seed pair the same result it gets alone (Euler is deterministic).
    Prompts of DIFFERENT token counts: all paths pad conditioning to the
    model's fixed max_length, so co-batched users' prompt lengths cannot
    change an item's cross-attention keys."""
    texts = ["a cat", "a very fluffy dog wearing a tiny red hat"]
    seeds = [3, 9]
    batch = None
    for batch in sd.generate_latents_batch(texts, seeds, num_steps=2,
                                           cfg_weight=7.5,
                                           negative_text="blurry",
                                           latent_size=(8, 8)):
        pass
    for i, (t, s) in enumerate(zip(texts, seeds)):
        single = None
        for single in sd.generate_latents(t, num_steps=2, cfg_weight=7.5,
                                          negative_text="blurry",
                                          latent_size=(8, 8), seed=s):
            pass
        # batched matmuls tile differently than batch-2 ones in f32, and CFG
        # (×7.5) amplifies the round-off; scale-relative bound (latents are
        # O(σ_max)≈14, measured drift ≈ 9e-5 absolute ≈ 7e-6 relative)
        scale = float(jnp.max(jnp.abs(single)))
        err = float(jnp.max(jnp.abs(batch[i] - single[0]))) / scale
        assert err < 1e-4, f"batched item {i} diverged from single run: {err}"


def test_sdxl_batch_runs(sdxl):
    """SDXL batched path: dual-encoder conditioning + text_time rows follow
    the CFG double-batch layout."""
    out = None
    for out in sdxl.generate_latents_batch(["a cat", "a dog"], [1, 2],
                                           num_steps=2, cfg_weight=7.5,
                                           negative_text="bad",
                                           latent_size=(8, 8)):
        pass
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # and without CFG (turbo default)
    for out in sdxl.generate_latents_batch(["x", "y"], [1, 2], num_steps=2,
                                           cfg_weight=0.0,
                                           latent_size=(8, 8)):
        pass
    assert out.shape == (2, 8, 8, 4)
