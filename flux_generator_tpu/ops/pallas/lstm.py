"""Pallas LSTM recurrence — TPU-native analog of the reference's Metal LSTM
kernel (musicgen/encodec.py:14-59).

Split as the reference does: the input projection x@Wx+b is one big MXU
matmul OUTSIDE the kernel; the kernel runs the sequential recurrence
    gates_t = xw_t + h @ Wh ;  (i, f, g, o) = split(gates)
    c = σ(f)·c + σ(i)·tanh(g) ;  h = σ(o)·tanh(c)
with Wh DMA'd ONCE from HBM into VMEM scratch and resident for the whole
sequence (a lax.scan re-reads the recurrent weights from HBM every step —
~8 MB × T of traffic at EnCodec size).

Layout notes (hard-won on real hardware):
  - one TIMESTEP per grid step (grid is sequential on TPU): Mosaic rejects
    dynamic row loads that aren't sublane-aligned, and (T, 1, D) layouts pad
    the size-1 dim to a full sublane tile (16x VMEM);
  - h/c persist in scratch across grid steps, reset at each batch row;
  - Wh comes in via HBM memory space so the pipeline doesn't double-buffer
    8 MB, and goes bf16 above 4 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # timesteps per grid step (min sublane-aligned block)


def _lstm_kernel(xw_ref, wh_hbm, out_ref, h_ref, c_ref, wh_vmem, dma_sem,
                 *, t_actual: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, ti == 0))
    def _():
        dma = pltpu.make_async_copy(wh_hbm, wh_vmem, dma_sem)
        dma.start()
        dma.wait()

    @pl.when(ti == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    wh = wh_vmem[:]
    d = h_ref.shape[-1]
    # ROLLED loop over the 8 rows of this block (lax.fori_loop): a statically
    # unrolled version keeps 8 matvecs' worth of vregs live at once and the
    # register allocator spills ~128 MB of vmem at EnCodec size (d=1024).
    # Rolled, one iteration's registers are reused. Rows are selected with
    # iota masks on VALUES — Mosaic supports neither dynamic_slice on values
    # nor unaligned dynamic ref rows.
    xw_blk = xw_ref[:].astype(jnp.float32)  # (ROWS, 4d)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)

    def body(r, carry):
        h, c, out_blk = carry
        row = jnp.sum(
            jnp.where(row_ids == r, xw_blk, 0.0), axis=0, keepdims=True
        )  # (1, 4d)
        gates = row + jax.lax.dot_general(
            h.astype(wh.dtype), wh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[:, :d])
        f = jax.nn.sigmoid(gates[:, d : 2 * d])
        g = jnp.tanh(gates[:, 2 * d : 3 * d])
        o = jax.nn.sigmoid(gates[:, 3 * d :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        live = (ti * ROWS + r) < t_actual  # freeze state on padded tail rows
        h2 = jnp.where(live, h_new, h)
        c2 = jnp.where(live, c_new, c)
        out_blk = jnp.where(row_ids == r, h_new.astype(out_blk.dtype), out_blk)
        return h2, c2, out_blk

    h, c, out_blk = jax.lax.fori_loop(
        0, ROWS, body,
        (h_ref[:], c_ref[:], jnp.zeros((ROWS, d), out_ref.dtype)),
    )
    h_ref[:] = h
    c_ref[:] = c
    out_ref[:] = out_blk


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_pallas(p, x, interpret: bool = False):
    """p: {"wx": (D_in, 4D), "wh": (D, 4D), "bias": (4D,)}; x: (B, T, D_in).
    Returns hidden states (B, T, D). Matches encodec.lstm_forward."""
    b, t, _ = x.shape
    d = p["wh"].shape[0]
    wh_dtype = jnp.float32 if 4 * d * 4 * d <= 4 * 1024 * 1024 else jnp.bfloat16
    xw = (x @ p["wx"].astype(x.dtype) + p["bias"].astype(x.dtype)).astype(wh_dtype)

    t_pad = (t + ROWS - 1) // ROWS * ROWS
    if t_pad != t:
        xw = jnp.pad(xw, ((0, 0), (0, t_pad - t), (0, 0)))
    n_t = t_pad // ROWS
    xw2 = xw.reshape(b * t_pad, 4 * d)

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, t_actual=t),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((ROWS, 4 * d), lambda bi, ti: (bi * n_t + ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((ROWS, d), lambda bi, ti: (bi * n_t + ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * t_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d, 4 * d), wh_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # Wh resident + ~16 MB of rolled-loop registers/spill headroom
            # (the unrolled variant spilled 128 MB; rolled needs ~16 MB)
            vmem_limit_bytes=d * 4 * d * (2 if wh_dtype == jnp.bfloat16 else 4)
            + 24 * 1024 * 1024
        ),
        interpret=interpret,
    )(xw2, p["wh"].astype(wh_dtype))
    return out.reshape(b, t_pad, d)[:, :t]
