"""MusicGen decoder parity vs HF transformers: map HF weights into the
audiocraft state-dict naming our sanitizer consumes (musicgen/musicgen.py:307
loads audiocraft's state_dict.bin), then compare per-step cached decoding
against HF's full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.io import sanitize
from flux_generator_tpu.io.loaders import conform_params
from flux_generator_tpu.io.params import unflatten
from flux_generator_tpu.models.musicgen import model as mg

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def _audiocraft_names(hf_sd):
    """HF Musicgen decoder names → audiocraft transformer names."""
    import numpy as np

    out = {}
    sd = {k: v.detach().numpy() for k, v in hf_sd.items()}
    layer_keys = [k for k in sd if ".layers." in k]
    n_layers = 1 + max(int(k.split(".layers.")[1].split(".")[0]) for k in layer_keys)
    for i in range(n_layers):
        p = f"model.decoder.layers.{i}"
        t = f"transformer.layers.{i}"
        for src, dst in (("self_attn", "self_attn"), ("encoder_attn", "cross_attention")):
            out[f"{t}.{dst}.in_proj_weight"] = np.concatenate(
                [sd[f"{p}.{src}.q_proj.weight"], sd[f"{p}.{src}.k_proj.weight"],
                 sd[f"{p}.{src}.v_proj.weight"]]
            )
            out[f"{t}.{dst}.out_proj.weight"] = sd[f"{p}.{src}.out_proj.weight"]
        for src, dst in (
            ("self_attn_layer_norm", "norm1"),
            ("encoder_attn_layer_norm", "norm_cross"),
            ("final_layer_norm", "norm2"),
        ):
            out[f"{t}.{dst}.weight"] = sd[f"{p}.{src}.weight"]
            out[f"{t}.{dst}.bias"] = sd[f"{p}.{src}.bias"]
        out[f"{t}.linear1.weight"] = sd[f"{p}.fc1.weight"]
        out[f"{t}.linear2.weight"] = sd[f"{p}.fc2.weight"]
    k = 0
    while f"model.decoder.embed_tokens.{k}.weight" in sd:
        out[f"emb.{k}.weight"] = sd[f"model.decoder.embed_tokens.{k}.weight"]
        out[f"linears.{k}.weight"] = sd[f"lm_heads.{k}.weight"]
        k += 1
    out["out_norm.weight"] = sd["model.decoder.layer_norm.weight"]
    out["out_norm.bias"] = sd["model.decoder.layer_norm.bias"]
    return out


def test_musicgen_decoder_matches_hf():
    import torch

    K = 2
    hf_cfg = transformers.MusicgenDecoderConfig(
        vocab_size=20, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        ffn_dim=32, num_codebooks=K, audio_channels=1,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, activation_function="gelu",
        bos_token_id=20, pad_token_id=20,
        scale_embedding=False,
    )
    torch.manual_seed(0)
    hf = transformers.MusicgenForCausalLM(hf_cfg).eval()

    cfg = mg.MusicGenConfig(
        num_codebooks=K, codebook_size=20, bos_token_id=20, hidden_size=16,
        num_attention_heads=2, num_hidden_layers=2, ffn_dim=32, text_d_model=16,
    )
    flat = sanitize.sanitize_musicgen(_audiocraft_names(hf.state_dict()))
    # text_proj isn't part of the HF causal LM — graft a dummy
    flat["text_proj.kernel"] = np.zeros((16, 16), np.float32)
    flat["text_proj.bias"] = np.zeros((16,), np.float32)
    params = unflatten(flat, sanitize.MUSICGEN_STACKS)
    params = conform_params(
        params, jax.eval_shape(lambda: mg.init_musicgen(jax.random.PRNGKey(0), cfg)),
        "musicgen",
    )
    params = jax.tree.map(jnp.asarray, params)

    b, t = 1, 4
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, 20, size=(b, t, K))
    enc = rng.randn(b, 3, 16).astype(np.float32)

    # HF forward: input_ids (B*K, T) ordered codebook-major
    hf_ids = torch.tensor(tokens.transpose(0, 2, 1).reshape(b * K, t))
    with torch.no_grad():
        want = hf(
            input_ids=hf_ids, encoder_hidden_states=torch.tensor(enc)
        ).logits.numpy()  # (B*K, T, vocab)
    want = want.reshape(b, K, t, 20).transpose(0, 2, 3, 1)  # (B, T, V, K)

    # ours: step-by-step cached decoding
    cross_kv = mg.precompute_cross_kv(params, cfg, jnp.asarray(enc))
    kc, vc = mg.init_kv_cache(cfg, b, t, jnp.float32)
    outs = []
    for i in range(t):
        logits, kc, vc = mg.decode_step(
            params, cfg, jnp.asarray(tokens[:, i : i + 1]), cross_kv, kc, vc,
            jnp.asarray(i),
        )
        outs.append(np.asarray(logits)[:, 0])
    got = np.stack(outs, axis=1)  # (B, T, V, K)
    np.testing.assert_allclose(got, want, atol=3e-4)
