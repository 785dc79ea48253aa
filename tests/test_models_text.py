import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.models.clip.text import (
    clip_text_forward,
    init_clip_text,
    tiny_clip_config,
)
from flux_generator_tpu.models.t5.t5 import (
    init_decode_cache,
    init_t5,
    init_t5_encoder,
    t5_decode,
    t5_encode,
    tiny_t5_config,
)


def test_clip_shapes_and_pooling():
    cfg = tiny_clip_config()
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    # tokens with EOS(=max id) at different positions
    tokens = jnp.array([[5, 63, 0, 0], [7, 8, 63, 0]])
    out = clip_text_forward(params, cfg, tokens)
    assert out["last_hidden_state"].shape == (2, 4, cfg.model_dims)
    assert out["pooled_output"].shape == (2, cfg.model_dims)
    assert out["hidden_states"].shape == (cfg.num_layers, 2, 4, cfg.model_dims)
    # pooled = last_hidden at argmax position
    np.testing.assert_allclose(
        np.asarray(out["pooled_output"][0]),
        np.asarray(out["last_hidden_state"][0, 1]),
        rtol=1e-5,
    )


def test_clip_projection_head():
    cfg = tiny_clip_config(projection_dim=20)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    out = clip_text_forward(params, cfg, jnp.array([[1, 63]]))
    assert out["pooled_output"].shape == (1, 20)


def test_clip_causality():
    """Changing a later token must not affect earlier hidden states."""
    cfg = tiny_clip_config()
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    a = clip_text_forward(params, cfg, jnp.array([[1, 2, 3, 4]]))
    b = clip_text_forward(params, cfg, jnp.array([[1, 2, 3, 9]]))
    np.testing.assert_allclose(
        np.asarray(a["hidden_states"][-1][0, :3]),
        np.asarray(b["hidden_states"][-1][0, :3]),
        atol=1e-5,
    )


def test_t5_encode_shape():
    cfg = tiny_t5_config()
    params = init_t5_encoder(jax.random.PRNGKey(0), cfg)
    out = t5_encode(params, cfg, jnp.ones((2, 6), jnp.int32))
    assert out.shape == (2, 6, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_t5_decode_full_vs_cached():
    """Incremental cached decoding must match full-sequence decoding."""
    cfg = tiny_t5_config()
    params = init_t5(jax.random.PRNGKey(0), cfg)
    src = jnp.array([[3, 4, 5, 6]])
    tgt = jnp.array([[0, 7, 8]])
    memory = t5_encode(params, cfg, src)

    full_logits, _ = t5_decode(params, cfg, tgt, memory)

    cache = init_decode_cache(cfg, 1, 8)
    outs = []
    for i in range(3):
        logits, cache = t5_decode(params, cfg, tgt[:, i : i + 1], memory, cache)
        outs.append(logits)
    step_logits = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), atol=2e-4
    )
