"""Pallas LSTM recurrence — TPU-native analog of the reference's Metal LSTM
kernel (musicgen/encodec.py:14-59).

Split as the reference does: the input projection x@Wx+b is one big MXU
matmul OUTSIDE the kernel; the kernel runs the sequential recurrence
    gates_t = xw_t + h @ Wh ;  (i, f, g, o) = split(gates)
    c = σ(f)·c + σ(i)·tanh(g) ;  h = σ(o)·tanh(c)
with Wh RESIDENT IN VMEM for the whole sequence (a lax.scan re-reads the
recurrent weights from HBM every step — ~8 MB × T of traffic at EnCodec
size). The TPU grid is sequential, so h/c live in scratch across time blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BLK = 128


def _lstm_kernel(xw_ref, wh_ref, out_ref, h_ref, c_ref, *, t_actual: int):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    wh = wh_ref[:]  # bf16-resident: f32 would be 16 MB at EnCodec size
    d = h_ref.shape[-1]

    def step(t, _):
        # time is the LEADING ref axis — Mosaic supports dynamic indexing
        # only there
        @pl.when(ti * T_BLK + t < t_actual)
        def _():
            h = h_ref[:]
            gates = xw_ref[t].astype(jnp.float32) + jax.lax.dot_general(
                h.astype(wh.dtype), wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            i = jax.nn.sigmoid(gates[:, :d])
            f = jax.nn.sigmoid(gates[:, d : 2 * d])
            g = jnp.tanh(gates[:, 2 * d : 3 * d])
            o = jax.nn.sigmoid(gates[:, 3 * d :])
            c = f * c_ref[:] + i * g
            h_new = o * jnp.tanh(c)
            c_ref[:] = c
            h_ref[:] = h_new
            out_ref[t] = h_new.astype(out_ref.dtype)

        return _

    jax.lax.fori_loop(0, T_BLK, lambda t, carry: (step(t, carry), carry)[1], 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_pallas(p, x, interpret: bool = False):
    """p: {"wx": (D_in, 4D), "wh": (D, 4D), "bias": (4D,)}; x: (B, T, D_in).
    Returns hidden states (B, T, D). Matches encodec.lstm_forward."""
    b, t, _ = x.shape
    d = p["wh"].shape[0]
    # keep resident weights f32 while they fit VMEM comfortably; EnCodec's
    # 1024-dim LSTM (16 MB f32 Wh) must go bf16
    wh_dtype = jnp.float32 if 4 * d * 4 * d <= 4 * 1024 * 1024 else jnp.bfloat16
    xw = (x @ p["wx"].astype(x.dtype) + p["bias"].astype(x.dtype)).astype(wh_dtype)

    t_pad = (t + T_BLK - 1) // T_BLK * T_BLK
    if t_pad != t:
        xw = jnp.pad(xw, ((0, 0), (0, t_pad - t), (0, 0)))
    xw = xw.transpose(1, 0, 2)  # time-major for dynamic leading-axis indexing

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, t_actual=t),
        grid=(t_pad // T_BLK,),
        in_specs=[
            pl.BlockSpec((T_BLK, b, 4 * d), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * d), lambda ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_BLK, b, d), lambda ti: (ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, b, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, d), jnp.float32),
        ],
        interpret=interpret,
    )(xw, p["wh"].astype(wh_dtype))
    return out.transpose(1, 0, 2)[:, :t]
