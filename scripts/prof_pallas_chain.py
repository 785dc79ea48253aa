#!/usr/bin/env python
"""Pallas weight-streaming prototype for the MusicGen decode-layer chain.

The AR floor study (scripts/prof_ar_floor.py, BENCH_RESULTS "MusicGen AR
floor") shows the 288-matmul dependent chain runs well above the ~1.9 ms
pure weight-bandwidth floor under XLA: each small (M=2) matmul pays per-op
overhead that doesn't amortize at decode shapes. This prototype tests the
fix-candidate before committing to a full fused decode-layer kernel:

  ONE pallas_call walks all 48 layers x 14 uniform (1536,1536) int8 weight
  chunks with the automatic grid pipeline double-buffering the 2.36 MB
  chunk DMAs, while x / ffn-hidden / accumulators persist in VMEM scratch
  across grid steps. Attention is stubbed as identity (the chain's matmul
  traffic and dependency structure are what's being measured); layer norms
  and gelu run in-kernel on the VPU.

Chunk schedule per layer (c = grid_index % 14):
  c0..c2   qkv thirds of the fused (h,3h) kernel: c0 -> q, c1/c2 -> k/v
           (computed and parked, matching real traffic)
  c3       self-attn o-proj on the "attention" output (+residual)
  c4       cross-attn q projection (fresh pre-norm)
  c5       cross-attn o-proj (+residual)
  c6..c9   ffn up (h,4h) as 4 out-column chunks (fresh pre-norm)
  c10..c13 ffn down (4h,h) as 4 in-row chunks, gelu fused per chunk,
           partial sums accumulated (+residual at c13)

Compared against an equivalent pure-jnp chain (numerics) and the XLA
scan-over-layers formulation (time).

Usage: python scripts/prof_pallas_chain.py [--layers N] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H = 1536
CPL = 14  # uniform (H, H) weight chunks per layer
M = 8     # row-padded token block (2 live CFG rows)


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far below
    bf16 resolution). Mosaic lowers neither erf nor erfc, so the kernel needs
    its own; exp() does lower."""
    p_ = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p_ * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(x, exact=False):
    e = jax.lax.erf(x * (2.0 ** -0.5)) if exact else _erf_poly(x * (2.0 ** -0.5))
    return 0.5 * x * (1.0 + e)


def _ln(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


def _kernel(w_ref, s_ref, x_ref, o_ref, xs, lns, ys, ts, hs, accs):
    i = pl.program_id(0)
    c = jax.lax.rem(i, CPL)

    @pl.when(i == 0)
    def _():
        xs[...] = x_ref[...].astype(jnp.float32)

    def wf():
        return w_ref[0].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)

    def dot(a):
        return jax.lax.dot(
            a.astype(jnp.bfloat16), wf(), preferred_element_type=jnp.float32
        )

    @pl.when(c == 0)
    def _():
        lns[...] = _ln(xs[...])
        ys[...] = dot(lns[...])

    @pl.when(jnp.logical_or(c == 1, c == 2))
    def _():
        ts[...] = dot(lns[...])  # k/v projections: traffic parity, parked

    @pl.when(c == 3)
    def _():
        xs[...] = xs[...] + dot(ys[...])  # identity "attention" -> o proj

    @pl.when(c == 4)
    def _():
        lns[...] = _ln(xs[...])
        ys[...] = dot(lns[...])

    @pl.when(c == 5)
    def _():
        xs[...] = xs[...] + dot(ys[...])

    @pl.when(c == 6)
    def _():
        lns[...] = _ln(xs[...])

    for j in range(4):  # ffn up chunks write hidden columns
        @pl.when(c == 6 + j)
        def _(j=j):
            hs[:, j * H : (j + 1) * H] = dot(lns[...])

    @pl.when(c == 10)
    def _():
        accs[...] = jnp.zeros_like(accs)

    for j in range(4):  # ffn down chunks: gelu fused, partial sums
        @pl.when(c == 10 + j)
        def _(j=j):
            g = _gelu(hs[:, j * H : (j + 1) * H])
            accs[...] = accs[...] + dot(g)

    @pl.when(c == 13)
    def _():
        xs[...] = xs[...] + accs[...]
        o_ref[...] = xs[...].astype(o_ref.dtype)


def pallas_chain(w_chunks, s_chunks, x, *, interpret=False):
    """w_chunks (L*CPL, H, H) int8; s_chunks (L*CPL, 1, H) bf16; x (M, H) bf16.

    Scales carry a singleton middle axis so the (1, 1, H) block satisfies
    Mosaic's block==array-dim rule on the last two axes."""
    n = w_chunks.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, H, H), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0)),
            pl.BlockSpec((M, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, H), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, H), jnp.float32),      # xs residual stream
            pltpu.VMEM((M, H), jnp.float32),      # lns pre-norm
            pltpu.VMEM((M, H), jnp.float32),      # ys attn/crossq temp
            pltpu.VMEM((M, H), jnp.float32),      # ts parked k/v
            pltpu.VMEM((M, 4 * H), jnp.float32),  # hs ffn hidden
            pltpu.VMEM((M, H), jnp.float32),      # accs ffn down partials
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w_chunks, s_chunks, x)


def jnp_chain(w_chunks, s_chunks, x):
    """Pure-jnp twin of the kernel math (fori over layers), for numerics and
    as the XLA-formulation timing opponent."""
    wc = w_chunks.reshape(-1, CPL, H, H)
    sc = s_chunks.reshape(-1, CPL, H)  # (L, CPL, H); singleton axis folded

    def layer(li, x):
        w = jax.lax.dynamic_index_in_dim(wc, li, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(sc, li, 0, keepdims=False)

        def mm(a, c):
            k = w[c].astype(jnp.bfloat16) * s[c].astype(jnp.bfloat16)
            return jax.lax.dot(
                a.astype(jnp.bfloat16), k, preferred_element_type=jnp.float32
            )

        lns = _ln(x)
        q = mm(lns, 0)
        kpark = mm(lns, 1) + mm(lns, 2)  # parked k/v: traffic parity
        x = x + mm(q, 3) + 0.0 * kpark[:, :1]
        lns = _ln(x)
        x = x + mm(mm(lns, 4), 5)
        lns = _ln(x)
        h = jnp.concatenate([mm(lns, 6 + j) for j in range(4)], axis=-1)
        g = _gelu(h, exact=True)
        acc = sum(mm(g[:, j * H : (j + 1) * H], 10 + j) for j in range(4))
        return x + acc

    n_layers = w_chunks.shape[0] // CPL
    return jax.lax.fori_loop(0, n_layers, layer, x.astype(jnp.float32)).astype(x.dtype)


def fetch_cost_s():
    g = jax.jit(lambda v: v.astype(jnp.float32).sum())
    z = jnp.ones((8, 8), jnp.bfloat16)
    float(g(z))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(g(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench(f, steps, *args, n=5):
    g = jax.jit(
        lambda w, s, x: jax.lax.fori_loop(0, steps, lambda _, h: f(w, s, h), x)
    )
    float(g(*args).astype(jnp.float32).sum())
    fetch = fetch_cost_s()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(g(*args).astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - fetch) / steps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=48)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    L = args.layers
    rng = np.random.default_rng(0)
    w = jax.device_put(
        rng.integers(-127, 128, size=(L * CPL, H, H), dtype=np.int8)
    )
    s = jax.device_put(
        (rng.random((L * CPL, 1, H), dtype=np.float32) * 0.02 + 0.01)
    ).astype(jnp.bfloat16)
    x = jax.device_put(rng.normal(size=(M, H)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    pk = functools.partial(pallas_chain, interpret=args.interpret)
    ref = jnp_chain(w, s, x)
    out = pk(w, s, x)
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    print(f"numerics: max|pallas - jnp| = {err:.3e} (rel {err / scale:.3e})")

    gb = L * CPL * H * H / 1e9
    print(f"weights {gb:.2f} GB int8 -> floor {gb / 819 * 1000:.2f} ms")
    if not args.interpret:
        ms_x = bench(jnp_chain, args.steps, w, s, x)
        print(f"XLA fori chain   : {ms_x:7.2f} ms/step")
        ms_p = bench(pk, args.steps, w, s, x)
        print(f"Pallas streaming : {ms_p:7.2f} ms/step")


if __name__ == "__main__":
    main()
