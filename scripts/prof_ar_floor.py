#!/usr/bin/env python
"""Isolate the MusicGen AR per-op floor (VERDICT r2 #6 groundwork).

decode_step runs ~288 small matmuls (48 layers × 6, M=2) per token and
measures 4.48 ms/step int8 against a 1.7 ms pure-bandwidth floor
(BENCH_RESULTS). This script separates the candidate costs WITHOUT the
attention/cache machinery, by timing a jitted chain of dependent matmuls
with the real layer shapes (h=1536: 3h qkv, h o, h cross-q, h cross-o,
4h ffn-up, 4h→h ffn-down — 48 distinct layers, so HBM traffic matches):

  fori-gather : fori_loop + dynamic_index_in_dim on stacked weights
                (decode_step's current structure)
  scan-xs     : lax.scan with the stacked weights as xs (XLA slices the
                per-iteration weights itself)
  unrolled    : python-unrolled, statically indexed weights
  bf16        : scan-xs with bf16 weights (no dequant) — isolates dequant

ms per variant ≈ (per-op overhead × 288) + (weight bytes / 819 GB/s).
int8 weight bytes ≈ 1.36 GB → 1.66 ms floor; bf16 ≈ 2.7 GB → 3.3 ms.

Usage: python scripts/prof_ar_floor.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

L, H = 48, 1536
SHAPES = [(H, 3 * H), (H, H), (H, H), (H, H), (H, 4 * H), (4 * H, H)]


def make_weights(quantized: bool, dtype=jnp.bfloat16):
    """Stacked (L, in, out) kernels per matmul position."""
    key = jax.random.PRNGKey(0)
    ws = []
    for i, (d_in, d_out) in enumerate(SHAPES):
        k = jax.random.normal(jax.random.fold_in(key, i), (L, d_in, d_out),
                              jnp.float32) * 0.02
        if quantized:
            scale = jnp.max(jnp.abs(k), axis=-2, keepdims=True) / 127.0
            q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
            ws.append({"q": q, "s": jnp.squeeze(scale, -2).astype(dtype)})
        else:
            ws.append({"w": k.astype(dtype)})
    return ws


def _mm(x, wp, dtype):
    if "q" in wp:
        w = wp["q"].astype(dtype) * wp["s"][..., None, :].astype(dtype)
    else:
        w = wp["w"]
    return x @ w


def chain_fori(ws, x, dtype):
    def body(li, x):
        h = x
        for wp in ws:
            wli = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
                wp,
            )
            y = _mm(h, wli, dtype)
            h = y[..., :H] if y.shape[-1] != H else y  # keep width h
        return x + h

    return jax.lax.fori_loop(0, L, body, x)


def chain_scan(ws, x, dtype):
    def body(x, wli):
        h = x
        for wp in wli:
            y = _mm(h, wp, dtype)
            h = y[..., :H] if y.shape[-1] != H else y
        return x + h, None

    out, _ = jax.lax.scan(body, x, tuple(ws))
    return out


def chain_unrolled(ws, x, dtype):
    for li in range(L):
        h = x
        for wp in ws:
            wli = jax.tree.map(lambda a: a[li], wp)
            y = _mm(h, wli, dtype)
            h = y[..., :H] if y.shape[-1] != H else y
        x = x + h
    return x


def bench(fn, ws, x, dtype, n=20):
    f = jax.jit(lambda ws, x: fn(ws, x, dtype))
    float(f(ws, x).astype(jnp.float32).sum())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(ws, x).astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, H), dtype)
    int8 = make_weights(True)
    bf16 = make_weights(False)

    gb_int8 = sum(np.prod(s) for s in SHAPES) * L / 1e9
    gb_bf16 = gb_int8 * 2
    print(f"int8 weight bytes {gb_int8:.2f} GB (floor {gb_int8/819*1000:.2f} ms); "
          f"bf16 {gb_bf16:.2f} GB (floor {gb_bf16/819*1000:.2f} ms)")
    for name, fn, ws in [
        ("fori-gather int8", chain_fori, int8),
        ("scan-xs     int8", chain_scan, int8),
        ("unrolled    int8", chain_unrolled, int8),
        ("scan-xs     bf16", chain_scan, bf16),
    ]:
        try:
            ms = bench(fn, ws, x, dtype)
            per_op = (ms * 1000) / (L * len(SHAPES))
            print(f"{name}: {ms:7.2f} ms  ({per_op:.1f} us/matmul incl. fetch)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
