"""Explicit PRNG-key discipline.

The reference uses MLX's mutable global PRNG (mx.random.seed at
flux/flux.py:138, dreambooth.py:167-175). JAX requires explicit key
threading; RngStream is a tiny convenience that hands out fresh subkeys
in a deterministic order from one seed, so a request seed maps to a
reproducible stream of draws.
"""

from __future__ import annotations

import jax


class RngStream:
    """Deterministic stream of subkeys from a single seed/key."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def take(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
