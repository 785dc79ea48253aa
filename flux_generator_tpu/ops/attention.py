"""Scaled dot-product attention.

Default path is einsum-based with float32 softmax accumulation — XLA fuses
this well on TPU. The Pallas flash-attention kernel (ops/pallas/flash_attention.py)
replaces it on the hot Flux/SD paths; this module is the dispatch point.

Layout: q, k, v are (B, L, H, D) ("BLHD"); output (B, L, H*D) optional flatten
is done by callers.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot_product_attention(q, k, v, mask=None, bias=None, scale=None):
    """q: (B, Lq, H, D), k/v: (B, Lk, H, D). mask: broadcastable to
    (B, H, Lq, Lk), True = attend. bias added to logits (T5 relative bias).
    Returns (B, Lq, H, D)."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jnp.exp(
        logits - jnp.max(logits, axis=-1, keepdims=True)
    )
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)
