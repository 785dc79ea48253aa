"""Pallas int4 matmul — nibble unpack + dequant fused into the MXU feed.

Storage is the repo's packed-int4 format (ops/quant.pack_int4): weights
(K, N) quantized to [-8, 7], biased to 0..15 and packed two-per-byte in
SPLIT layout — packed row r holds original rows r (low nibble) and
r + K/2 (high nibble) — with per-output-channel (N,) or per-input-group
(K/gs, N) scales.

The XLA formulation (ops/linear.dense) runs two matmuls over the input
halves with the unpack expressed as elementwise ops; measured on v5e, the
nibble extraction never fuses as well as the hardware int8→bf16 convert
(T5-XXL encode: ~90 ms int4 compute vs ~24 ms int8, despite half the
bytes). This kernel unpacks INSIDE the matmul loop: each grid step loads
one (BK, BN) packed uint8 block (the only weight HBM traffic — half the
int8 bytes), extracts both nibbles in VMEM, dequantizes, and issues two
MXU dots into an f32 accumulator. Per-output-channel scales fold ONCE
after the K loop; per-group scales fold per block.

Grid (m, n, k), k innermost. VMEM per step: two (BM, BK) x blocks, one
(BK, BN) uint8 block, (BM, BN) f32 scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256
BN = 512
_BK_CANDIDATES = (512, 256, 128)  # packed rows per step (lo + hi each)


def _pick_bk(Kp: int, group_size: int) -> int:
    """Largest candidate K block that tiles the packed rows and covers whole
    scale groups; 0 if none fits."""
    for bk in _BK_CANDIDATES:
        if Kp % bk == 0 and (group_size == 0 or bk % group_size == 0):
            return bk
    return 0


def _kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
            *, n_kb: int, group_size: int):
    """One (m, n, k) step. s_*_ref: group scales for this k block —
    (1, BK/gs, BN) in grouped mode, (1, 1, BN) per-channel (folded after
    the loop). The leading 1 is the k-block axis (Mosaic wants the last two
    block dims full or (8,128)-aligned, so the group axis rides axis -2)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[...].astype(jnp.int32)
    lo = ((p & 15) - 8).astype(jnp.float32)
    hi = ((p >> 4) - 8).astype(jnp.float32)

    per_channel = group_size == 0
    if not per_channel:
        # expand (BK/gs, BN) group scales to (BK, BN) rows and fold now
        lo = lo * jnp.repeat(s_lo_ref[0].astype(jnp.float32), group_size, axis=0)
        hi = hi * jnp.repeat(s_hi_ref[0].astype(jnp.float32), group_size, axis=0)

    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]
    acc_ref[:] += jax.lax.dot_general(
        x_lo, lo.astype(x_lo.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot_general(
        x_hi, hi.astype(x_hi.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == n_kb - 1)
    def _():
        acc = acc_ref[...]
        if per_channel:
            acc = acc * s_lo_ref[0].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)


def _pad_to(x, mult, axis, value=0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def supported(K: int, kernel_scale) -> bool:
    """Whether this kernel handles the given packed layout (K tiles a block
    candidate; in grouped mode the block must cover whole groups)."""
    if K % 2:
        return False
    if kernel_scale.ndim == 2:
        g = kernel_scale.shape[0]
        if g % 2 or K % g:
            return False
        return _pick_bk(K // 2, K // g) > 0
    return _pick_bk(K // 2, 0) > 0


def int4_matmul(x, kernel_q4, kernel_scale, *, interpret: bool = False):
    """x: (..., K) @ packed int4 kernel (K/2, N) → (..., N) in x.dtype.

    kernel_scale: (N,) per-channel or (K/gs, N) per-input-group. M pads to
    the block with zero rows; N pads with 0x88 bytes (nibble value 8 →
    dequantized 0). K must satisfy `supported`."""
    *lead, K = x.shape
    Kp, N = kernel_q4.shape
    assert K == 2 * Kp, (x.shape, kernel_q4.shape)
    assert supported(K, kernel_scale), (K, kernel_scale.shape)

    grouped = kernel_scale.ndim == 2
    if grouped:
        g = kernel_scale.shape[0]
        group_size = K // g
        s_lo, s_hi = kernel_scale[: g // 2], kernel_scale[g // 2 :]
    else:
        # per-channel: a 1-row "group" table, folded once after the K loop
        group_size = 0
        s_lo = s_hi = kernel_scale[None, :]
    bk = _pick_bk(Kp, group_size)

    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    bm = min(BM, max(16, -(-M // 16) * 16))  # small-M (AR decode) friendly
    x2 = _pad_to(x2, bm, 0)
    Mp = x2.shape[0]
    kernel_q4 = _pad_to(kernel_q4, BN, 1, value=0x88)
    s_lo = _pad_to(s_lo, BN, 1)
    s_hi = _pad_to(s_hi, BN, 1)
    Np = kernel_q4.shape[1]

    n_kb = Kp // bk
    grid = (Mp // bm, Np // BN, n_kb)
    sg = 1 if group_size == 0 else bk // group_size
    # scales carried as (n_kb, sg, N): per-k-block tables on the leading axis
    s_lo = jnp.broadcast_to(s_lo.reshape(-1, sg, Np), (n_kb, sg, Np))
    s_hi = jnp.broadcast_to(s_hi.reshape(-1, sg, Np), (n_kb, sg, Np))

    out = pl.pallas_call(
        functools.partial(_kernel, n_kb=n_kb, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),           # x low half
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k + n_kb)),    # x high half
            pl.BlockSpec((bk, BN), lambda i, j, k: (k, j)),           # packed w
            pl.BlockSpec((1, sg, BN), lambda i, j, k: (k, 0, j)),
            pl.BlockSpec((1, sg, BN), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, x2, kernel_q4, s_lo, s_hi)
    return out[:M, :N].reshape(*lead, N)
