"""Pallas flash attention with fused RoPE — the TPU-native replacement for
the reference's mx.fast.scaled_dot_product_attention + separate RoPE apply
(flux/layers.py:29-43).

Design: grid over (batch·heads, query blocks). Each program holds one query
block plus the FULL per-head K/V in VMEM (Flux sequences are ≤ ~4.4k tokens
at 1024²: K+V ≈ 2.2 MB bf16 — comfortably inside 16 MB VMEM), computes the
(BLK_Q, L) logits tile on the MXU in f32 and softmaxes in one shot — memory
behavior of flash attention (no L×L materialization in HBM) without the
running-max loop.

RoPE is applied inside the kernel to q and k using the interleaved-pair
convention (ops/rope.py): rot(x) = x·cosE + swap±(x)·sinE, where cosE/sinE
are pair-expanded tables and swap±(x)[2i] = -x[2i+1], swap±(x)[2i+1] = x[2i],
realized with two lane-rolls and an even/odd mask (no strided slicing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK_Q = 256


def _expand_pairs(t):
    """(B, L, D/2) cos/sin table → (B, L, D) with each value duplicated to
    its even/odd pair positions."""
    return jnp.repeat(t, 2, axis=-1)


def _rope_in_kernel(x, cos_e, sin_e):
    """x: (N, D) with pair-expanded (N, D) tables."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    is_even = (idx % 2) == 0
    d = x.shape[1]
    left = pltpu.roll(x, d - 1, axis=1)  # x[i+1] at i (cyclic; wrap rows unused)
    right = pltpu.roll(x, 1, axis=1)     # x[i-1] at i
    swapped = jnp.where(is_even, -left, right)
    return x * cos_e + swapped * sin_e


BLK_K = 1024
# one-shot (single logits tile) up to this length: 256×2048 f32 = 2 MB VMEM.
# Beyond it the blocked running-softmax path kicks in.
ONE_SHOT_MAX = 2048


def _attn_kernel(q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref, ksin_ref,
                 o_ref, *, scale: float, l_actual: int, use_rope: bool):
    q = q_ref[0].astype(jnp.float32)
    if use_rope:
        q = _rope_in_kernel(q, qcos_ref[0].astype(jnp.float32),
                            qsin_ref[0].astype(jnp.float32))

    l_total = k_ref.shape[1]
    if l_total <= ONE_SHOT_MAX:
        # one-shot path: whole (BLK_Q, L) logits tile fits VMEM
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        if use_rope:
            k = _rope_in_kernel(k, kcos_ref[0].astype(jnp.float32),
                                ksin_ref[0].astype(jnp.float32))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if l_actual < l_total:  # mask key padding
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(kidx < l_actual, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) / denom
    else:
        # blocked-K running-softmax (flash) path: the (BLK_Q, L) tile would
        # blow VMEM at ≥1024² generation (L ≈ 4k-16k tokens). K/V blocks are
        # read from the refs per iteration (Mosaic lowers dynamic ref slices,
        # not dynamic_slice on values).
        n_kb = l_total // BLK_K

        def body(kb, carry):
            m, l, acc = carry
            ks = k_ref[0, pl.ds(kb * BLK_K, BLK_K), :].astype(jnp.float32)
            vs = v_ref[0, pl.ds(kb * BLK_K, BLK_K), :].astype(jnp.float32)
            if use_rope:
                ks = _rope_in_kernel(
                    ks,
                    kcos_ref[0, pl.ds(kb * BLK_K, BLK_K), :].astype(jnp.float32),
                    ksin_ref[0, pl.ds(kb * BLK_K, BLK_K), :].astype(jnp.float32),
                )
            s = jax.lax.dot_general(
                q, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            kidx = kb * BLK_K + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < l_actual, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        blk_q, d = q.shape
        init = (
            jnp.full((blk_q, 1), -jnp.inf, jnp.float32),
            jnp.zeros((blk_q, 1), jnp.float32),
            jnp.zeros((blk_q, d), jnp.float32),
        )
        m, l, acc = jax.lax.fori_loop(0, n_kb, body, init)
        o = acc / l
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention(q, k, v, cos=None, sin=None, scale=None, interpret=False):
    """q, k, v: (B, L, H, D); cos/sin: optional (B, L, D/2) RoPE tables
    applied to q AND k inside the kernel. Returns (B, L, H, D)."""
    b, l, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    use_rope = cos is not None

    l_pad = _round_up(l, BLK_Q)
    if l_pad > ONE_SHOT_MAX:  # blocked-K path needs whole K blocks
        l_pad = _round_up(l, BLK_K)
    dtype = q.dtype

    def to_heads(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, d)
        if l_pad != l:
            x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        return x

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)

    if use_rope:
        cos_e = _expand_pairs(cos).astype(dtype)
        sin_e = _expand_pairs(sin).astype(dtype)
        if l_pad != l:
            cos_e = jnp.pad(cos_e, ((0, 0), (0, l_pad - l), (0, 0)))
            sin_e = jnp.pad(sin_e, ((0, 0), (0, l_pad - l), (0, 0)))
    else:
        cos_e = jnp.zeros((b, 1, d), dtype)
        sin_e = jnp.zeros((b, 1, d), dtype)

    n_q = l_pad // BLK_Q
    grid = (b * h, n_q)

    blk_tab = BLK_Q if use_rope else 1
    kernel = functools.partial(
        _attn_kernel, scale=scale, l_actual=l, use_rope=use_rope
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLK_Q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            # q-block rope rows (indexed by batch = bh // h)
            pl.BlockSpec((1, blk_tab, d), lambda bh, qi: (bh // h, qi if blk_tab > 1 else 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_tab, d), lambda bh, qi: (bh // h, qi if blk_tab > 1 else 0, 0),
                         memory_space=pltpu.VMEM),
            # full-length rope rows for k
            pl.BlockSpec((1, l_pad if use_rope else 1, d), lambda bh, qi: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad if use_rope else 1, d), lambda bh, qi: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK_Q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d), dtype),
        interpret=interpret,
    )(qh, kh, vh, cos_e, sin_e, cos_e, sin_e)

    out = out[:, :l].reshape(b, h, l, d).transpose(0, 2, 1, 3)
    return out
