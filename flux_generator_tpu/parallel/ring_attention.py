"""Ring attention — sequence/context parallelism over the device mesh.

SURVEY §2.6 marks sequence parallelism absent in the reference and optional
for ≥2048² generation; this implements it the TPU way: q/k/v are sharded
along the SEQUENCE axis over a mesh axis, each device computes partial
attention against its local K/V shard with a running softmax, and K/V shards
rotate around the ring with `jax.lax.ppermute` (ICI neighbor exchange) until
every query has seen every key. Communication overlaps the next partial
matmul naturally under XLA's scheduler.

Memory per device: O(L/n · D) for K/V and O(L/n · L/n) for the logits tile —
a 32k-token sequence on 8 devices attends in 4k-token shards.

Composable with the Pallas flash kernel: each local partial uses the einsum
path here (shapes are small once sharded); swapping the inner compute for the
kernel is a drop-in change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _partial_attention(q, k, v, scale, m, l, acc):
    """One ring step: fold k/v block into the running softmax state.
    q: (B, Lq, H, D); k/v: (B, Lk, H, D); m/l: (B, H, Lq, 1);
    acc: (B, Lq, H, D)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    delta = jnp.einsum(
        "bhqk,bkhd->bqhd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    acc = acc * alpha.transpose(0, 2, 1, 3) + delta
    return m_new, l, acc


def ring_attention(q, k, v, mesh, axis: str = "model", scale=None):
    """Full (non-causal) attention with q/k/v sequence-sharded on `axis`.

    q, k, v: (B, L, H, D) with L divisible by mesh.shape[axis]. Returns
    (B, L, H, D) sharded the same way. Apply RoPE BEFORE calling (it is
    position-elementwise, so it shards trivially)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    n = mesh.shape[axis]

    def local(q_loc, k_loc, v_loc):
        b, lq, h, _ = q_loc.shape
        m = jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, lq, 1), jnp.float32)
        acc = jnp.zeros((b, lq, h, d), jnp.float32)
        perm = [(j, (j + 1) % n) for j in range(n)]

        def step(i, carry):
            m, l, acc, k_cur, v_cur = carry
            m, l, acc = _partial_attention(q_loc, k_cur, v_cur, scale, m, l, acc)
            # rotate K/V shards one hop around the ring (skipped after the
            # last fold — lax.cond keeps it shape-stable)
            k_cur, v_cur = jax.lax.cond(
                i < n - 1,
                lambda kv: (
                    jax.lax.ppermute(kv[0], axis, perm),
                    jax.lax.ppermute(kv[1], axis, perm),
                ),
                lambda kv: kv,
                (k_cur, v_cur),
            )
            return m, l, acc, k_cur, v_cur

        m, l, acc, _, _ = jax.lax.fori_loop(0, n, step, (m, l, acc, k_loc, v_loc))
        out = acc / l.transpose(0, 2, 1, 3)
        return out.astype(q_loc.dtype)

    spec = P(None, axis, None, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
