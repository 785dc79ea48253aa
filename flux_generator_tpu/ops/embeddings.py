"""Positional / timestep embeddings."""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(t, dim: int, max_period: int = 10000, time_factor: float = 1000.0):
    """Sinusoidal timestep embedding, [cos | sin] halves.

    Matches flux/layers.py:46-57: freqs = exp(-log(max_period) * i/half),
    angles = time_factor*t ⊗ freqs, output concat(cos, sin)."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) / half * (-math.log(max_period))
    )
    ang = (time_factor * t.astype(jnp.float32))[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    return emb.astype(t.dtype) if jnp.issubdtype(t.dtype, jnp.floating) else emb


def sinusoidal_positions(offset, length: int, dim: int, max_period: float = 10000.0):
    """MusicGen-style absolute sinusoidal positions [sin | cos] interleaved-half,
    starting at `offset` (musicgen/musicgen.py:186-191 equivalent)."""
    pos = offset + jnp.arange(length, dtype=jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_period) / (half - 1))
    )
    ang = pos[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
