import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.pipelines.flux import (

    FluxPipeline,
    latent_ids,
    pack_latents,
    unpack_latents,
)

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    packed = pack_latents(x)
    assert packed.shape == (2, 16, 16)
    np.testing.assert_allclose(np.asarray(unpack_latents(packed, 8, 8)), np.asarray(x))


def test_latent_ids_layout():
    ids = latent_ids(1, 8, 8)
    assert ids.shape == (1, 16, 3)
    assert (np.asarray(ids[0, :, 0]) == 0).all()
    # row-major: second patch is (row 0, col 1)
    assert np.asarray(ids[0, 1]).tolist() == [0, 0, 1]
    assert np.asarray(ids[0, 4]).tolist() == [0, 1, 0]


@pytest.fixture(scope="module")
def pipe():
    return FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)


def test_denoise_latents_shapes(pipe):
    b, h, w = 1, 8, 8
    zc = pipe.ae_cfg.z_channels
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, zc), jnp.float32)
    x_t = pack_latents(x)
    x_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.PRNGKey(2), (b, 4, pipe.flow_cfg.context_in_dim), jnp.float32)
    txt_ids = jnp.zeros((b, 4, 3), jnp.int32)
    vec = jax.random.normal(jax.random.PRNGKey(3), (b, pipe.flow_cfg.vec_in_dim), jnp.float32)
    out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, num_steps=2, guidance=4.0)
    assert out.shape == x_t.shape
    assert np.isfinite(np.asarray(out)).all()
    img = pipe.decode(out, (h, w))
    assert img.shape == (b, h * 8 // 4, w * 8 // 4, 3)  # tiny AE has 1 downsample
    assert (np.asarray(img) >= 0).all() and (np.asarray(img) <= 1).all()


def test_fused_matches_stepwise(pipe):
    """One-scan denoise must equal per-step denoise (same math, no resample)."""
    b, h, w = 1, 4, 4
    zc = pipe.ae_cfg.z_channels
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, zc), jnp.float32)
    x_t = pack_latents(x)
    x_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.PRNGKey(2), (b, 4, pipe.flow_cfg.context_in_dim), jnp.float32)
    txt_ids = jnp.zeros((b, 4, 3), jnp.int32)
    vec = jax.random.normal(jax.random.PRNGKey(3), (b, pipe.flow_cfg.vec_in_dim), jnp.float32)

    fused = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, 3, 4.0)

    ts = pipe.timesteps(3, x_t.shape[1])
    x_step = x_t
    for i in range(3):
        x_step = pipe._step(
            pipe.params["flow"], x_step, x_ids, txt, txt_ids, vec,
            jnp.asarray(ts[i], jnp.float32), jnp.asarray(ts[i + 1], jnp.float32),
            jnp.asarray(4.0, jnp.float32),
        )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(x_step), atol=1e-5)


def test_training_loss_finite_and_differentiable(pipe):
    b, h, w = 2, 4, 4
    zc = pipe.ae_cfg.z_channels
    x0 = jax.random.normal(jax.random.PRNGKey(4), (b, h, w, zc), jnp.float32)
    t5f = jax.random.normal(jax.random.PRNGKey(5), (b, 4, pipe.flow_cfg.context_in_dim), jnp.float32)
    clipf = jax.random.normal(jax.random.PRNGKey(6), (b, pipe.flow_cfg.vec_in_dim), jnp.float32)

    def loss_fn(fp):
        return pipe.training_loss(fp, jax.random.PRNGKey(7), x0, t5f, clipf, None)

    loss, grads = jax.value_and_grad(loss_fn)(pipe.params["flow"])
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(l.astype(jnp.float32) ** 2)), grads, 0.0
    )
    assert gnorm > 0


def test_decode_u8_matches_host_conversion(pipe):
    """decode_u8 quantizes pixels on device; must equal the host-side
    clip*255 conversion of the float decode (the serving PNG path)."""
    b, h, w = 1, 4, 4
    x_t = jax.random.normal(
        jax.random.PRNGKey(8), (b, h * w // 4, pipe.ae_cfg.z_channels * 4), jnp.float32
    )
    f = np.asarray(pipe.decode(x_t, (h, w)))
    u8 = np.asarray(pipe.decode_u8(x_t, (h, w)))
    assert u8.dtype == np.uint8
    expect = (np.clip(f.astype(np.float32), 0, 1) * 255).astype(np.uint8)
    # device vs host float rounding can differ by 1 ULP at bin edges
    assert np.max(np.abs(u8.astype(int) - expect.astype(int))) <= 1


def test_flux_img2img_generator(pipe):
    """Flux img2img (addition over the reference's SD-only img2img):
    conditioning-first protocol, strength controls the denoised step count,
    and the final latent decodes at the input geometry."""

    class _Tok:
        def __init__(self, n):
            self.n = n

        def encode(self, text):
            return np.ones((1, self.n), np.int32)

    saved = pipe.t5_tokenizer, pipe.clip_tokenizer
    pipe.t5_tokenizer, pipe.clip_tokenizer = _Tok(4), _Tok(5)
    try:
        img = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 3), jnp.float32) * 2 - 1
        gen = pipe.generate_latents_from_image(
            img, "a cat", strength=0.5, num_steps=4, seed=3
        )
        cond = next(gen)  # conditioning-first, like generate_latents
        lats = list(gen)
        assert len(lats) == 2  # round(0.5 * 4) steps remain
        assert lats[-1].shape == cond[0].shape
        out = pipe.decode(lats[-1], (4, 4))
        assert out.shape == (1, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()

        # strength=1 → start at t=1 (pure noise), full schedule runs
        gen = pipe.generate_latents_from_image(
            img, "a cat", strength=1.0, num_steps=2, seed=3
        )
        next(gen)
        assert len(list(gen)) == 2

        # tiny strength still takes >= 1 step
        gen = pipe.generate_latents_from_image(
            img, "a cat", strength=0.01, num_steps=4, seed=3
        )
        next(gen)
        assert len(list(gen)) == 1
    finally:
        pipe.t5_tokenizer, pipe.clip_tokenizer = saved


def test_generate_images_fused_matches_unfused(pipe):
    """The one-program serving path must produce the same pixels as the
    three-program path (same keys, same math; ±1 uint8 for fusion-order
    float differences)."""

    class _Tok:
        def __init__(self, n):
            self.n = n

        def encode(self, text):
            return np.ones((1, self.n), np.int32)

    saved = pipe.t5_tokenizer, pipe.clip_tokenizer
    pipe.t5_tokenizer, pipe.clip_tokenizer = _Tok(4), _Tok(5)
    try:
        a = np.asarray(pipe.generate_images(
            "a cat", num_steps=2, latent_size=(4, 4), seed=9, as_uint8=True
        ))
        b = np.asarray(pipe.generate_images_fused(
            "a cat", num_steps=2, latent_size=(4, 4), seed=9
        ))
        assert b.dtype == np.uint8 and b.shape == a.shape
        assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1
    finally:
        pipe.t5_tokenizer, pipe.clip_tokenizer = saved
