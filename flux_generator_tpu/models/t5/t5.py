"""Unified T5 — one implementation for both reference copies.

The reference carries an encoder-only T5 for Flux conditioning (flux/t5.py)
and a full encoder-decoder for MusicGen (musicgen/t5.py). This module provides
both from one code path: relative-position-bias attention with scale=1.0 and
no projection biases, gated feed-forward, RMSNorm pre-norm, tied-embedding LM
head (hidden scaled by d_model^-0.5 when tied).

TPU-first: layers stacked + `lax.scan`; the decoder KV cache is a fixed-size
preallocated buffer updated with `lax.dynamic_update_slice` so incremental
decoding stays on-device inside one jitted step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ...ops.linear import dense, init_dense
from ...ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    d_kv: int = 64
    d_model: int = 4096
    feed_forward_proj: str = "gated-gelu"
    tie_word_embeddings: bool = False
    d_ff: Optional[int] = 10240
    num_decoder_layers: Optional[int] = None
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6

    @classmethod
    def from_dict(cls, config: dict) -> "T5Config":
        return cls(
            vocab_size=config["vocab_size"],
            num_layers=config["num_layers"],
            num_heads=config["num_heads"],
            relative_attention_num_buckets=config["relative_attention_num_buckets"],
            d_kv=config["d_kv"],
            d_model=config["d_model"],
            feed_forward_proj=config["feed_forward_proj"],
            tie_word_embeddings=config.get("tie_word_embeddings", True),
            d_ff=config.get("d_ff", 4 * config["d_model"]),
            num_decoder_layers=config.get("num_decoder_layers", config["num_layers"]),
            relative_attention_max_distance=config.get(
                "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=config.get("layer_norm_epsilon", 1e-6),
        )


def tiny_t5_config(**overrides) -> T5Config:
    base = dict(
        vocab_size=64,
        num_layers=2,
        num_heads=2,
        relative_attention_num_buckets=8,
        d_kv=8,
        d_model=16,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=True,
        d_ff=32,
        num_decoder_layers=2,
        relative_attention_max_distance=16,
    )
    base.update(overrides)
    return T5Config(**base)


# ------------------------------------------------------------ relative bias


def _relative_position_bucket(rpos, bidirectional: bool, num_buckets: int, max_distance: int):
    """T5 log-binned relative positions (flux/t5.py:78-96 semantics)."""
    if bidirectional:
        num_buckets = num_buckets // 2
    max_exact = num_buckets // 2

    abspos = jnp.abs(rpos)
    is_small = abspos < max_exact

    scale = (num_buckets - max_exact) / math.log(max_distance / max_exact)
    buckets_large = (
        jnp.log(jnp.maximum(abspos, 1).astype(jnp.float32) / max_exact) * scale
    ).astype(jnp.int32)
    buckets_large = jnp.minimum(max_exact + buckets_large, num_buckets - 1)

    buckets = jnp.where(is_small, abspos, buckets_large)
    if bidirectional:
        buckets = buckets + (rpos > 0) * num_buckets
    else:
        buckets = buckets * (rpos < 0)
    return buckets


def relative_bias(embeddings, cfg: T5Config, query_length: int, key_length: int,
                  offset: int = 0, bidirectional: bool = True):
    """embeddings: (num_buckets, num_heads) → bias (1, heads, q, k)."""
    ctx = jnp.arange(query_length)[:, None] + offset
    mem = jnp.arange(key_length)[None, :]
    rpos = mem - ctx
    buckets = _relative_position_bucket(
        rpos,
        bidirectional,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    values = embeddings[buckets]  # (q, k, heads)
    return values.transpose(2, 0, 1)[None]


# ------------------------------------------------------------ init


def _init_attn(key, cfg: T5Config, dtype):
    inner = cfg.d_kv * cfg.num_heads
    ks = jax.random.split(key, 4)
    return {
        "q": init_dense(ks[0], cfg.d_model, inner, bias=False, dtype=dtype),
        "k": init_dense(ks[1], cfg.d_model, inner, bias=False, dtype=dtype),
        "v": init_dense(ks[2], cfg.d_model, inner, bias=False, dtype=dtype),
        "o": init_dense(ks[3], inner, cfg.d_model, bias=False, dtype=dtype),
    }


def _init_dense_act(key, cfg: T5Config, dtype):
    ks = jax.random.split(key, 3)
    if cfg.feed_forward_proj.startswith("gated"):
        return {
            "wi_0": init_dense(ks[0], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
            "wi_1": init_dense(ks[1], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
            "wo": init_dense(ks[2], cfg.d_ff, cfg.d_model, bias=False, dtype=dtype),
        }
    return {
        "wi": init_dense(ks[0], cfg.d_model, cfg.d_ff, bias=False, dtype=dtype),
        "wo": init_dense(ks[2], cfg.d_ff, cfg.d_model, bias=False, dtype=dtype),
    }


def _init_enc_layer(key, cfg: T5Config, dtype):
    k1, k2 = jax.random.split(key)
    d = cfg.d_model
    return {
        "ln1": {"scale": jnp.ones((d,), dtype)},
        "attention": _init_attn(k1, cfg, dtype),
        "ln2": {"scale": jnp.ones((d,), dtype)},
        "dense": _init_dense_act(k2, cfg, dtype),
    }


def _init_dec_layer(key, cfg: T5Config, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    d = cfg.d_model
    return {
        "ln1": {"scale": jnp.ones((d,), dtype)},
        "self_attention": _init_attn(k1, cfg, dtype),
        "ln2": {"scale": jnp.ones((d,), dtype)},
        "cross_attention": _init_attn(k2, cfg, dtype),
        "ln3": {"scale": jnp.ones((d,), dtype)},
        "dense": _init_dense_act(k3, cfg, dtype),
    }


def init_t5_encoder(key, cfg: T5Config, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "wte": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model), dtype) * 0.02,
        "encoder": {
            "layers": jax.vmap(lambda k: _init_enc_layer(k, cfg, dtype))(
                jax.random.split(ks[1], cfg.num_layers)
            ),
            "ln": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "rel_bias": jax.random.normal(
                ks[2], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
            )
            * 0.02,
        },
    }


def init_t5(key, cfg: T5Config, dtype=jnp.float32):
    """Full encoder-decoder T5."""
    p = init_t5_encoder(key, cfg, dtype)
    ks = jax.random.split(jax.random.fold_in(key, 1), 3)
    n_dec = cfg.num_decoder_layers or cfg.num_layers
    p["decoder"] = {
        "layers": jax.vmap(lambda k: _init_dec_layer(k, cfg, dtype))(
            jax.random.split(ks[0], n_dec)
        ),
        "ln": {"scale": jnp.ones((cfg.d_model,), dtype)},
        "rel_bias": jax.random.normal(
            ks[1], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
        )
        * 0.02,
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = init_dense(ks[2], cfg.d_model, cfg.vocab_size, bias=False, dtype=dtype)
    return p


# ------------------------------------------------------------ forward


def _attn(p, q_in, kv_in, cfg: T5Config, bias=None, mask=None):
    b, lq, _ = q_in.shape
    lk = kv_in.shape[1]
    h = cfg.num_heads
    q = dense(p["q"], q_in).reshape(b, lq, h, -1)
    k = dense(p["k"], kv_in).reshape(b, lk, h, -1)
    v = dense(p["v"], kv_in).reshape(b, lk, h, -1)
    out = dot_product_attention(q, k, v, bias=bias, mask=mask, scale=1.0)
    return dense(p["o"], out.reshape(b, lq, -1))


def _dense_act(p, x, cfg: T5Config):
    act_name = cfg.feed_forward_proj.removeprefix("gated-")
    act = {"relu": jax.nn.relu, "gelu": lambda v: jax.nn.gelu(v, approximate=True),
           "silu": jax.nn.silu}[act_name]
    if "wi_0" in p:
        x = act(dense(p["wi_0"], x)) * dense(p["wi_1"], x)
    else:
        x = act(dense(p["wi"], x))
    return dense(p["wo"], x)


def t5_encode(params, cfg: T5Config, tokens, capture_stats: bool = False):
    """tokens (B, L) int32 → (B, L, d_model). capture_stats=True returns
    (out, (num_layers, 3) per-layer (mean, abs-mean, std)) — the checksum
    harness for validating real spiece/safetensors loads."""
    enc = params["encoder"]
    x = params["wte"][tokens]
    L = tokens.shape[1]
    bias = relative_bias(enc["rel_bias"], cfg, L, L, bidirectional=True).astype(x.dtype)

    def step(carry, p):
        y = rms_norm(carry, p["ln1"], cfg.layer_norm_epsilon)
        carry = carry + _attn(p["attention"], y, y, cfg, bias=bias)
        y = rms_norm(carry, p["ln2"], cfg.layer_norm_epsilon)
        carry = carry + _dense_act(p["dense"], y, cfg)
        ys = None
        if capture_stats:
            cf = carry.astype(jnp.float32)
            ys = jnp.stack([cf.mean(), jnp.abs(cf).mean(), cf.std()])
        return carry, ys

    x, stats = jax.lax.scan(step, x, enc["layers"])
    out = rms_norm(x, enc["ln"], cfg.layer_norm_epsilon)
    return (out, stats) if capture_stats else out


def init_decode_cache(cfg: T5Config, batch: int, max_len: int, dtype=jnp.float32):
    n_dec = cfg.num_decoder_layers or cfg.num_layers
    inner = cfg.num_heads * cfg.d_kv
    shape = (n_dec, batch, max_len, cfg.num_heads, cfg.d_kv)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "offset": jnp.zeros((), jnp.int32),
    }


def t5_decode(params, cfg: T5Config, tokens, memory, cache=None):
    """Decoder forward. tokens (B, T); memory (B, S, d) from t5_encode.

    With cache: T tokens are appended at cache['offset'] and attention spans
    the full buffer with position masking; returns (logits, new_cache).
    Without cache: full causal self-attention over T."""
    dec = params["decoder"]
    x = params["wte"][tokens]
    b, t = tokens.shape
    h = cfg.num_heads

    if cache is None:
        bias = relative_bias(
            dec["rel_bias"], cfg, t, t, bidirectional=False
        ).astype(x.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]

        def step(carry, p):
            y = rms_norm(carry, p["ln1"], cfg.layer_norm_epsilon)
            carry = carry + _attn(p["self_attention"], y, y, cfg, bias=bias, mask=causal)
            y = rms_norm(carry, p["ln2"], cfg.layer_norm_epsilon)
            carry = carry + _attn(p["cross_attention"], y, memory, cfg)
            y = rms_norm(carry, p["ln3"], cfg.layer_norm_epsilon)
            carry = carry + _dense_act(p["dense"], y, cfg)
            return carry, None

        x, _ = jax.lax.scan(step, x, dec["layers"])
        new_cache = None
    else:
        s_max = cache["k"].shape[2]
        offset = cache["offset"]
        # bias/mask over the full preallocated key length
        ctx = jnp.arange(t)[:, None] + offset
        mem_pos = jnp.arange(s_max)[None, :]
        rpos = mem_pos - ctx
        buckets = _relative_position_bucket(
            rpos, False, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias = dec["rel_bias"][buckets].transpose(2, 0, 1)[None].astype(x.dtype)
        valid = mem_pos <= ctx  # causal + only-written-so-far positions
        mask = valid[None, None]

        def pick(tree, li):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
                tree,
            )

        # fori_loop with whole-cache carry: dynamic_update_slice on a loop
        # carry lowers to an in-place write — a lax.scan over layers with
        # caches as xs/ys would COPY the full cache every decode step (the
        # long-form latency bug fixed in models/musicgen/model.py)
        def step(li, carry):
            x_c, kc_all, vc_all = carry
            p = pick(dec["layers"], li)
            y = rms_norm(x_c, p["ln1"], cfg.layer_norm_epsilon)
            q = dense(p["self_attention"]["q"], y).reshape(b, t, h, -1)
            k_new = dense(p["self_attention"]["k"], y).reshape(b, t, h, -1)
            v_new = dense(p["self_attention"]["v"], y).reshape(b, t, h, -1)
            kc_all = jax.lax.dynamic_update_slice(
                kc_all, k_new[None], (li, 0, offset, 0, 0)
            )
            vc_all = jax.lax.dynamic_update_slice(
                vc_all, v_new[None], (li, 0, offset, 0, 0)
            )
            kc = jax.lax.dynamic_index_in_dim(kc_all, li, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(vc_all, li, 0, keepdims=False)
            attn = dot_product_attention(q, kc, vc, bias=bias, mask=mask, scale=1.0)
            x_c = x_c + dense(p["self_attention"]["o"], attn.reshape(b, t, -1))
            y = rms_norm(x_c, p["ln2"], cfg.layer_norm_epsilon)
            x_c = x_c + _attn(p["cross_attention"], y, memory, cfg)
            y = rms_norm(x_c, p["ln3"], cfg.layer_norm_epsilon)
            x_c = x_c + _dense_act(p["dense"], y, cfg)
            return x_c, kc_all, vc_all

        n_dec = dec["layers"]["ln1"]["scale"].shape[0]
        x, new_k, new_v = jax.lax.fori_loop(
            0, n_dec, step, (x, cache["k"], cache["v"])
        )
        new_cache = {"k": new_k, "v": new_v, "offset": offset + t}

    x = rms_norm(x, dec["ln"], cfg.layer_norm_epsilon)
    if cfg.tie_word_embeddings:
        logits = (x * cfg.d_model**-0.5) @ params["wte"].T.astype(x.dtype)
    else:
        logits = dense(params["lm_head"], x)
    return logits, new_cache
