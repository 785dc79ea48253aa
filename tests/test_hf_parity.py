"""Numerical parity against the authoritative HuggingFace implementations
(torch CPU): instantiate tiny HF models with random weights, push their
state_dicts through our sanitize→unflatten→conform pipeline, and compare
outputs. This closes SURVEY §7 hard part 6 (weight-mapping fidelity) without
downloading real checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.io import sanitize
from flux_generator_tpu.io.loaders import conform_params
from flux_generator_tpu.io.params import unflatten

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def _to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_t5_encoder_matches_hf():
    import torch

    from flux_generator_tpu.models.t5.t5 import T5Config, init_t5_encoder, t5_encode

    hf_cfg = transformers.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", tie_word_embeddings=True,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, d_kv=8, d_model=32,
        feed_forward_proj="gated-gelu", tie_word_embeddings=True, d_ff=48,
        relative_attention_max_distance=16,
    )
    flat = sanitize.sanitize_t5(_to_numpy_sd(hf))
    params = unflatten(flat, sanitize.T5_STACKS)
    params = conform_params(
        params, jax.eval_shape(lambda: init_t5_encoder(jax.random.PRNGKey(0), cfg)),
        "t5",
    )
    params = jax.tree.map(jnp.asarray, params)

    tokens = np.array([[3, 7, 12, 25, 1]])
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(tokens)).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_clip_text_matches_hf():
    import torch

    from flux_generator_tpu.models.clip.text import (
        CLIPTextConfig,
        clip_text_forward,
        init_clip_text,
    )

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        bos_token_id=0, eos_token_id=63,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(
        num_layers=2, model_dims=32, num_heads=4, max_length=16, vocab_size=64,
        hidden_act="quick_gelu",
    )
    flat = sanitize.sanitize_clip(_to_numpy_sd(hf))
    params = unflatten(flat, sanitize.CLIP_STACKS)
    params = conform_params(
        params, jax.eval_shape(lambda: init_clip_text(jax.random.PRNGKey(0), cfg)),
        "clip",
    )
    params = jax.tree.map(jnp.asarray, params)

    tokens = np.array([[0, 5, 9, 63]])
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(tokens))
    got = clip_text_forward(params, cfg, jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["pooled_output"]),
        hf_out.pooler_output.numpy(), atol=2e-4,
    )


def test_encodec_matches_hf():
    """EnCodec encode (codes) + decode (waveform) vs HF transformers with the
    same weights — validates weight-norm fusion, conv/convtr transforms +
    time flip, LSTM mapping, padding math, and RVQ."""
    import torch

    from flux_generator_tpu.models.musicgen.encodec import (
        EncodecConfig,
        EncodecModel,
        decoder_spec,
        encoder_spec,
        init_encodec,
    )

    hf_cfg = transformers.EncodecConfig(
        target_bandwidths=[2.0], sampling_rate=800, audio_channels=1,
        num_filters=4, kernel_size=7, last_kernel_size=7, residual_kernel_size=3,
        upsampling_ratios=[4, 2], num_residual_layers=1, dilation_growth_rate=2,
        num_lstm_layers=1, hidden_size=8, codebook_size=1024, codebook_dim=8,
        compress=2, use_causal_conv=False, pad_mode="reflect",
        norm_type="weight_norm", trim_right_ratio=1.0,
        chunk_length_s=None, overlap=None, normalize=False,
        use_conv_shortcut=True,
    )
    torch.manual_seed(0)
    hf = transformers.EncodecModel(hf_cfg).eval()

    cfg = EncodecConfig(
        num_filters=4, upsampling_ratios=(4, 2), num_lstm_layers=1,
        hidden_size=8, codebook_size=1024, codebook_dim=8,
        target_bandwidths=(2.0,), sampling_rate=800, use_conv_shortcut=True,
        use_causal_conv=False, pad_mode="reflect", norm_type="weight_norm",
    )
    e_spec, d_spec = encoder_spec(cfg), decoder_spec(cfg)
    flat = sanitize.sanitize_encodec(_to_numpy_sd(hf), e_spec, d_spec)
    params = unflatten(flat, ())
    params = conform_params(
        params, jax.eval_shape(lambda: init_encodec(jax.random.PRNGKey(0), cfg)),
        "encodec",
    )
    params = jax.tree.map(jnp.asarray, params)
    model = EncodecModel(cfg, params)

    t = cfg.hop_length * 12
    audio = np.random.RandomState(0).randn(1, t).astype(np.float32) * 0.3

    with torch.no_grad():
        hf_enc = hf.encode(torch.tensor(audio)[:, None, :], bandwidth=2.0)
        hf_codes = hf_enc.audio_codes  # (frames, B, nq, T)
        hf_audio = hf.decode(hf_enc.audio_codes, hf_enc.audio_scales).audio_values

    codes, scales = model.encode(jnp.asarray(audio)[..., None], bandwidth=2.0)
    np.testing.assert_array_equal(np.asarray(codes), hf_codes.numpy())
    out = model.decode(codes, scales)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, 0], hf_audio.numpy()[:, 0, : out.shape[1]], atol=2e-4
    )


def test_t5_full_decoder_matches_hf():
    import torch

    from flux_generator_tpu.models.t5.t5 import T5Config, init_t5, t5_decode, t5_encode

    hf_cfg = transformers.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", tie_word_embeddings=True,
        dropout_rate=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, d_kv=8, d_model=32,
        feed_forward_proj="gated-gelu", tie_word_embeddings=True, d_ff=48,
        num_decoder_layers=2, relative_attention_max_distance=16,
    )
    flat = sanitize.sanitize_t5(_to_numpy_sd(hf))
    params = unflatten(flat, sanitize.T5_STACKS)
    params = conform_params(
        params, jax.eval_shape(lambda: init_t5(jax.random.PRNGKey(0), cfg)), "t5"
    )
    params = jax.tree.map(jnp.asarray, params)

    src = np.array([[3, 7, 12, 1]])
    tgt = np.array([[0, 9, 4]])
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(src), decoder_input_ids=torch.tensor(tgt)
        ).logits.numpy()
    memory = t5_encode(params, cfg, jnp.asarray(src))
    got, _ = t5_decode(params, cfg, jnp.asarray(tgt), memory)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)
