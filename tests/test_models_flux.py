import jax
import jax.numpy as jnp
import numpy as np

from flux_generator_tpu.models.flux.autoencoder import (
    decode,
    encode,
    init_autoencoder,
    tiny_ae_config,
)
from flux_generator_tpu.models.flux.model import (
    flux_forward,
    init_flux,
    tiny_flux_config,
)
from flux_generator_tpu.models.flux.sampler import (

    add_noise,
    flux_step,
    flux_timesteps,
)
import pytest

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def _flux_inputs(cfg, b=2, l_img=8, l_txt=4):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    img = jax.random.normal(ks[0], (b, l_img, cfg.in_channels))
    img_ids = jnp.zeros((b, l_img, 3), jnp.int32)
    txt = jax.random.normal(ks[1], (b, l_txt, cfg.context_in_dim))
    txt_ids = jnp.zeros((b, l_txt, 3), jnp.int32)
    t = jnp.full((b,), 0.5)
    y = jax.random.normal(ks[2], (b, cfg.vec_in_dim))
    return img, img_ids, txt, txt_ids, t, y


def test_flux_forward_shape():
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(1), cfg)
    img, img_ids, txt, txt_ids, t, y = _flux_inputs(cfg)
    out = flux_forward(params, cfg, img, img_ids, txt, txt_ids, t, y)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_flux_guidance_embed():
    cfg = tiny_flux_config(guidance_embed=True)
    params = init_flux(jax.random.PRNGKey(1), cfg)
    img, img_ids, txt, txt_ids, t, y = _flux_inputs(cfg)
    g = jnp.full((img.shape[0],), 4.0)
    out = flux_forward(params, cfg, img, img_ids, txt, txt_ids, t, y, guidance=g)
    assert out.shape == img.shape


def test_flux_jit_compiles():
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(1), cfg)
    inputs = _flux_inputs(cfg)
    f = jax.jit(lambda p, *a: flux_forward(p, cfg, *a))
    out = f(params, *inputs)
    assert out.shape == inputs[0].shape


def test_flux_timesteps_schnell_linear():
    ts = flux_timesteps(4, 256, schnell=True)
    np.testing.assert_allclose(ts, [1.0, 0.75, 0.5, 0.25, 0.0], atol=1e-7)


def test_flux_timesteps_dev_shifted():
    ts = flux_timesteps(4, 4096, schnell=False)
    assert ts[0] == 1.0 and abs(ts[-1]) < 1e-9
    # dev shift pushes mass toward t=1
    assert ts[2] > 0.5


def test_flux_euler_step():
    x = jnp.ones((1, 4))
    pred = jnp.full((1, 4), 2.0)
    out = flux_step(pred, x, t=1.0, t_prev=0.75)
    np.testing.assert_allclose(np.asarray(out), 1 + (0.75 - 1) * 2.0)


def test_add_noise_endpoints():
    x = jnp.ones((2, 3))
    noise = jnp.zeros((2, 3))
    np.testing.assert_allclose(
        np.asarray(add_noise(x, jnp.array([0.0, 1.0]), noise)),
        [[1, 1, 1], [0, 0, 0]],
    )


def test_ae_roundtrip_shapes():
    cfg = tiny_ae_config()
    params = init_autoencoder(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3))
    z = encode(params, cfg, x)
    assert z.shape == (1, 8, 8, cfg.z_channels)  # /2 per extra ch_mult level
    y = decode(params, cfg, z)
    assert y.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_capture_stats_consistent_with_plain_forward():
    """capture_stats must not perturb the forward output, and fingerprints
    must be deterministic — the activation-checksum harness contract
    (scripts/checksum_activations.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flux_generator_tpu.models.flux.model import (
        flux_forward,
        init_flux,
        tiny_flux_config,
    )
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    cfg = tiny_flux_config()
    key = jax.random.PRNGKey(0)
    params = init_flux(key, cfg, jnp.float32)
    img = pack_latents(jax.random.normal(key, (1, 8, 8, cfg.in_channels // 4)))
    args = (img, latent_ids(1, 8, 8),
            jax.random.normal(jax.random.fold_in(key, 1), (1, 4, cfg.context_in_dim)),
            jnp.zeros((1, 4, 3), jnp.int32), jnp.array([0.5]),
            jax.random.normal(jax.random.fold_in(key, 2), (1, cfg.vec_in_dim)))
    plain = np.asarray(flux_forward(params, cfg, *args))
    out, stats = flux_forward(params, cfg, *args, capture_stats=True)
    np.testing.assert_array_equal(np.asarray(out), plain)
    assert stats["double"].shape == (cfg.depth, 2, 3)
    assert stats["single"].shape == (cfg.depth_single_blocks, 3)
    out2, stats2 = flux_forward(params, cfg, *args, capture_stats=True)
    np.testing.assert_array_equal(np.asarray(stats["double"]), np.asarray(stats2["double"]))


def test_decode_tiled_matches_when_single_tile():
    """decode_tiled degenerates to the plain decode when the latent fits one
    tile; large latents produce the right geometry with overlap blending."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flux_generator_tpu.models.flux.autoencoder import (
        decode, decode_tiled, init_autoencoder, tiny_ae_config,
    )

    cfg = tiny_ae_config()
    params = init_autoencoder(jax.random.PRNGKey(0), cfg, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 6, cfg.z_channels))
    np.testing.assert_allclose(
        np.asarray(decode_tiled(params, cfg, z, tile=8, overlap=4)),
        np.asarray(decode(params, cfg, z)),
        atol=1e-6,
    )

    big = jax.random.normal(jax.random.PRNGKey(2), (1, 20, 12, cfg.z_channels))
    out = decode_tiled(params, cfg, big, tile=8, overlap=4)
    f = 2 ** (len(cfg.ch_mult) - 1)
    assert out.shape == (1, 20 * f, 12 * f, 3)
    assert np.isfinite(np.asarray(out)).all()
    # interior values stay within the envelope of a plain decode (blending
    # is a convex combination of tile decodes)
    full = np.asarray(decode(params, cfg, big))
    o = np.asarray(out)
    assert abs(o.mean() - full.mean()) < 0.15 * (abs(full.mean()) + full.std())


def test_tiled_decode_nonsquare_one_side_below_tile():
    """Non-square input where one spatial dim is smaller than the tile
    (e.g. a 512x1536 txt2img request → 6x18 tiny-latent analogue): tiling
    must clamp per axis instead of producing negative offsets."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flux_generator_tpu.models.flux.autoencoder import (
        decode, decode_tiled, init_autoencoder, tiny_ae_config,
    )

    cfg = tiny_ae_config()
    params = init_autoencoder(jax.random.PRNGKey(0), cfg, jnp.float32)
    f = 2 ** (len(cfg.ch_mult) - 1)
    # h=6 < tile=8 < w=18 — the shape class that used to crash at trace time
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 18, cfg.z_channels))
    out = decode_tiled(params, cfg, z, tile=8, overlap=4)
    assert out.shape == (1, 6 * f, 18 * f, 3)
    assert np.isfinite(np.asarray(out)).all()
    # tiles see zero-padding at their own borders, so values differ from a
    # plain decode near seams — but must stay within its statistical envelope
    full = np.asarray(decode(params, cfg, z))
    o = np.asarray(out)
    assert abs(o.mean() - full.mean()) < 0.15 * (abs(full.mean()) + full.std())

    # transposed orientation (w < tile < h) must also work
    zt = jax.random.normal(jax.random.PRNGKey(4), (1, 18, 6, cfg.z_channels))
    out_t = decode_tiled(params, cfg, zt, tile=8, overlap=4)
    assert out_t.shape == (1, 18 * f, 6 * f, 3)
    assert np.isfinite(np.asarray(out_t)).all()


def test_tiled_encode_fractional_factor():
    """ops/tiling with factor < 1 (VAE encoder direction): image tiles map to
    latent tiles; geometry and the single-tile degenerate case hold."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flux_generator_tpu.models.flux.autoencoder import (
        encode, init_autoencoder, tiny_ae_config,
    )
    from flux_generator_tpu.ops.tiling import tiled_decode_2d

    cfg = tiny_ae_config()
    params = init_autoencoder(jax.random.PRNGKey(0), cfg, jnp.float32)
    f = 2 ** (len(cfg.ch_mult) - 1)

    small = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(tiled_decode_2d(
            lambda xt: encode(params, cfg, xt), small, tile=8, overlap=4,
            factor=1 / f,
        )),
        np.asarray(encode(params, cfg, small)),
        atol=1e-6,
    )

    big = jax.random.normal(jax.random.PRNGKey(2), (1, 20, 12, 3))
    out = tiled_decode_2d(
        lambda xt: encode(params, cfg, xt), big, tile=8, overlap=4,
        factor=1 / f,
    )
    assert out.shape == (1, 20 // f, 12 // f, cfg.z_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_batched_apply_per_image_matches_batched():
    """ops/tiling.batched_apply: above the pixel limit the per-image lax.map
    path must be bit-identical to the plain batched call (the decoder has no
    cross-batch ops), and below the limit the batched call is used as-is.
    Guards the batch>=2 @1024x1024 decode OOM fix (bench flux-denoise
    --size 1024 --batch 2 hit RESOURCE_EXHAUSTED in _decode_impl)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flux_generator_tpu.ops.tiling import batched_apply

    calls = []

    def fake_decode(z):
        calls.append(z.shape)
        return jnp.tanh(z) * 2.0 + jnp.arange(z.shape[1])[None, :, None, None]

    z = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 4))

    # over the limit: sequential per-image path, same values
    out_seq = batched_apply(fake_decode, z, pixel_limit=8 * 8)
    np.testing.assert_array_equal(np.asarray(out_seq), np.asarray(fake_decode(z)))
    assert (1, 8, 8, 4) in calls  # traced per-image

    # under the limit: one plain batched call
    calls.clear()
    out_b = batched_apply(fake_decode, z, pixel_limit=3 * 8 * 8)
    assert calls == [(3, 8, 8, 4)]
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(fake_decode(z)))


def test_flux_decode_batched_path_matches_single():
    """Pipeline-level guard: a batch-2 decode routed through the per-image
    path equals two single-image decodes stacked (tiny geometry, limit forced
    by monkeypatching is avoided — we call batched_apply semantics via the
    pipeline's decode on shapes above/below never diverging)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flux_generator_tpu.pipelines.flux import FluxPipeline

    pipe = FluxPipeline.random_init(tiny=True, dtype=jnp.float32)
    h = w = 4
    x = jax.random.normal(
        jax.random.PRNGKey(1),
        (2, (h // 2) * (w // 2), pipe.ae_cfg.z_channels * 4), jnp.float32)
    both = np.asarray(pipe.decode(x, (h, w)))
    one0 = np.asarray(pipe.decode(x[:1], (h, w)))
    one1 = np.asarray(pipe.decode(x[1:], (h, w)))
    np.testing.assert_allclose(both[0], one0[0], atol=1e-5)
    np.testing.assert_allclose(both[1], one1[0], atol=1e-5)
