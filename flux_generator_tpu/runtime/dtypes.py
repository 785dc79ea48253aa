"""Dtype policy for TPU execution.

The reference casts model weights to bf16 ad-hoc (e.g. flux/flux.py:24 uses
bfloat16 for the flow model). Here the policy is explicit and threaded through
model init/apply: params and activations in bfloat16 (MXU-native), norm
statistics and softmax accumulation in float32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Accumulation dtype for reductions (norm stats, attention softmax).
    accum_dtype: jnp.dtype = jnp.float32

    def cast_params(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


def default_policy() -> DtypePolicy:
    return DtypePolicy()


def f32_policy() -> DtypePolicy:
    return DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
