#!/usr/bin/env python
"""Why did FGT_ATTN_INT8 regress 2048² (31.7 s qk / 17.1 s full vs 14.2 bf16)?

Two hypotheses, each measurable in isolation on the real chip:
  A. Mosaic never hits the int8 MXU path for these tile shapes, so the
     "2x throughput" premise is false → measure a BARE blocked dot kernel
     (1024,128)@(128,1024), bf16 vs int8, amortized over a grid.
  B. The in-kernel per-grid-step requantization (q re-quantized n_kb times,
     K re-quantized n_q times — same redundancy class as the RoPE
     re-rotation fixed in r2) plus the f32 logit rescale dominates →
     measure the bare dot kernel WITH the quant ops inside.

Then time the real streamed flash kernel at the 2048² geometry in all three
modes for the end-to-end picture.

Usage: python scripts/prof_attn_int8.py [--steps 200] [--skip-flash]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)

BM, K, BN = 1024, 128, 1024


def _quant_rows(x):
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-20) / 127.0
    xi = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return xi, s


def _dot_kernel(a_ref, b_ref, o_ref, *, mode):
    a = a_ref[...]
    b = b_ref[...]
    if mode == "bf16":
        o_ref[...] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    elif mode == "int8":  # inputs are already int8
        o_ref[...] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32).astype(
                jnp.bfloat16)
    elif mode == "int8_quant_inside":  # bf16 in, quantize per grid step
        ai, sa = _quant_rows(a.astype(jnp.float32))
        bi, sb = _quant_rows(b.astype(jnp.float32).T)
        s = jax.lax.dot_general(
            ai, bi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        o_ref[...] = (s * sa * sb.reshape(1, -1)).astype(jnp.bfloat16)


def bare_dot(mode, steps, interpret=False):
    """Grid of `steps` blocked (BM,K)@(K,BN) dots, one fused kernel."""
    in_dt = jnp.int8 if mode == "int8" else jnp.bfloat16
    a = jnp.ones((steps * BM, K), in_dt)
    b = jnp.ones((K, steps * BN), in_dt)

    f = pl.pallas_call(
        functools.partial(_dot_kernel, mode=mode),
        grid=(steps,),
        in_specs=[pl.BlockSpec((BM, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, BN), lambda i: (0, i))],
        out_specs=pl.BlockSpec((BM, BN), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * BM, BN), jnp.bfloat16),
        interpret=interpret,
    )
    g = jax.jit(lambda a, b: f(a, b).astype(jnp.float32).sum())
    float(g(a, b))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(a, b))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1000
    tflops = 2 * BM * K * BN * steps / 1e12
    print(f"bare dot {mode:18s} {ms:8.2f} ms  "
          f"({tflops / (ms / 1e3):6.1f} TFLOP/s-eff, {tflops:.2f} TF)",
          flush=True)
    return ms


def flash_modes(steps_unused):
    from flux_generator_tpu.ops.pallas.flash_attention import (
        _flash_attention_jit,
    )
    from flux_generator_tpu.ops.rope import rope_cos_sin

    b, l, h, d = 1, 16640, 24, 128
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                 (b, l, h, d), jnp.bfloat16)
               for i in range(3))
    cos, sin = rope_cos_sin(jnp.arange(l)[None], d)
    for mode in ("", "qk", "full"):
        f = jax.jit(lambda q, k, v, c, s, m=mode: _flash_attention_jit(
            q, k, v, c, s, scale=None, interpret=False, blk_k=1024,
            one_shot_max=6144, blk_q=1024,
            int8_mxu=m).astype(jnp.float32).sum())
        float(f(q, k, v, cos, sin))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(q, k, v, cos, sin))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1000
        tf = 4 * l * l * d * h / 1e12
        print(f"streamed flash 16640tok mode={mode or 'bf16':5s} "
              f"{ms:8.2f} ms ({tf / (ms / 1e3):6.1f} TFLOP/s-eff)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--skip-flash", action="store_true")
    ap.add_argument("--skip-dots", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test of the bare-dot kernels")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        global BM, BN
        BM = BN = 256
        for mode in ("bf16", "int8", "int8_quant_inside"):
            bare_dot(mode, 2, interpret=True)
        return

    if not args.skip_dots:
        for mode in ("bf16", "int8", "int8_quant_inside"):
            bare_dot(mode, args.steps)
    if not args.skip_flash:
        flash_modes(args.steps)


if __name__ == "__main__":
    main()
