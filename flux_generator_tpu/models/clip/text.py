"""Unified CLIP text encoder.

One implementation serves both reference copies (flux/clip.py and
stable_diffusion/stable_diffusion/clip.py, which differ only by an optional
text_projection head for SDXL's second encoder). Causal-mask pre-LN
transformer; pooled output taken at the EOS position via the argmax trick
(flux/clip.py:130,148). Layers are stacked and scanned.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ...ops.linear import dense, init_dense
from ...ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    num_layers: int = 23
    model_dims: int = 1024
    num_heads: int = 16
    max_length: int = 77
    vocab_size: int = 49408
    hidden_act: str = "quick_gelu"  # or "gelu"
    projection_dim: int | None = None  # SDXL encoder-2 text_projection


def tiny_clip_config(**overrides) -> CLIPTextConfig:
    base = dict(num_layers=2, model_dims=32, num_heads=4, max_length=16, vocab_size=64)
    base.update(overrides)
    return CLIPTextConfig(**base)


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


def _init_layer(key, cfg: CLIPTextConfig, dtype):
    d = cfg.model_dims
    ks = jax.random.split(key, 6)
    return {
        "ln1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "q": init_dense(ks[0], d, d, dtype=dtype),
        "k": init_dense(ks[1], d, d, dtype=dtype),
        "v": init_dense(ks[2], d, d, dtype=dtype),
        "o": init_dense(ks[3], d, d, dtype=dtype),
        "fc1": init_dense(ks[4], d, 4 * d, dtype=dtype),
        "fc2": init_dense(ks[5], 4 * d, d, dtype=dtype),
    }


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    d = cfg.model_dims
    p = {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab_size, d), dtype) * 0.02,
        "position_embedding": jax.random.normal(ks[1], (cfg.max_length, d), dtype) * 0.02,
        "layers": jax.vmap(lambda k: _init_layer(k, cfg, dtype))(
            jax.random.split(ks[2], cfg.num_layers)
        ),
        "final_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }
    if cfg.projection_dim:
        p["text_projection"] = init_dense(
            ks[3], d, cfg.projection_dim, bias=False, dtype=dtype
        )
    return p


def _layer(p, x, mask, cfg: CLIPTextConfig, act):
    b, n, d = x.shape
    y = layer_norm(x, p["ln1"])
    q = dense(p["q"], y).reshape(b, n, cfg.num_heads, -1)
    k = dense(p["k"], y).reshape(b, n, cfg.num_heads, -1)
    v = dense(p["v"], y).reshape(b, n, cfg.num_heads, -1)
    attn = dot_product_attention(q, k, v, mask=mask).reshape(b, n, d)
    x = x + dense(p["o"], attn)
    y = layer_norm(x, p["ln2"])
    x = x + dense(p["fc2"], act(dense(p["fc1"], y)))
    return x


def clip_text_forward(params, cfg: CLIPTextConfig, tokens):
    """tokens: (B, N) int32 → dict with last_hidden_state (B, N, D),
    pooled_output (B, D or projection_dim), hidden_states (num_layers, B, N, D)."""
    b, n = tokens.shape
    eos = jnp.argmax(tokens, axis=-1)

    x = params["token_embedding"][tokens] + params["position_embedding"][:n]
    causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
    act = _act(cfg.hidden_act)

    def step(carry, p):
        y = _layer(p, carry, causal, cfg, act)
        return y, y

    x, hidden_states = jax.lax.scan(step, x, params["layers"])

    x = layer_norm(x, params["final_ln"])
    pooled = x[jnp.arange(b), eos]
    if "text_projection" in params:
        pooled = dense(params["text_projection"], pooled)
    return {
        "last_hidden_state": x,
        "pooled_output": pooled,
        "hidden_states": hidden_states,
    }
