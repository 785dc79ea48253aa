"""Rotary position embeddings, Flux convention.

The reference builds (…, d/2, 2, 2) rotation matrices (flux/layers.py:12-21)
and applies them via a compiled a*b+c*d (flux/layers.py:24-33). Equivalent —
and friendlier to XLA fusion — is keeping separate cos/sin tables and rotating
interleaved (even, odd) feature pairs:
    out_even = e*cos - o*sin ;  out_odd = e*sin + o*cos
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(pos, dim: int, theta: float = 10000.0):
    """pos: (..., L) float/int positions → (cos, sin), each (..., L, dim//2)."""
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)
    ang = pos.astype(jnp.float32)[..., None] * omega
    return jnp.cos(ang), jnp.sin(ang)


def multi_axis_rope(ids, axes_dim, theta: float = 10000.0):
    """Flux EmbedND equivalent (flux/layers.py:60-75): ids (B, L, n_axes),
    per-axis tables concatenated along the feature-pair axis.
    Returns (cos, sin), each (B, L, sum(axes_dim)//2)."""
    parts = [
        rope_cos_sin(ids[..., i], axes_dim[i], theta) for i in range(ids.shape[-1])
    ]
    cos = jnp.concatenate([c for c, _ in parts], axis=-1)
    sin = jnp.concatenate([s for _, s in parts], axis=-1)
    return cos, sin


def apply_rope(x, cos, sin):
    """x: (B, L, H, D) — rotate interleaved pairs along D.
    cos/sin: (B, L, D//2), broadcast over heads."""
    shape = x.shape
    x = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    e, o = x[..., 0], x[..., 1]
    c = cos[..., None, :].astype(x.dtype)  # (B, L, 1, D//2)
    s = sin[..., None, :].astype(x.dtype)
    out = jnp.stack([e * c - o * s, e * s + o * c], axis=-1)
    return out.reshape(shape)
