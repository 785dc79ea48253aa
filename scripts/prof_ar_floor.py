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

import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

L, H = 48, 1536
SHAPES = [(H, 3 * H), (H, H), (H, H), (H, H), (H, 4 * H), (4 * H, H)]


def make_weights(quantized: bool, dtype=jnp.bfloat16):
    """Stacked (L, in, out) kernels per matmul position.

    Built on host (numpy) and device_put piecewise so only the final
    int8/bf16 tensors occupy HBM — the f32 staging stays on the host.
    """
    rng = np.random.default_rng(0)
    ws = []
    for d_in, d_out in SHAPES:
        k = rng.normal(size=(L, d_in, d_out)).astype(np.float32) * 0.02
        if quantized:
            scale = np.max(np.abs(k), axis=-2, keepdims=True) / 127.0
            q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
            ws.append({
                "q": jax.device_put(q),
                "s": jax.device_put(np.squeeze(scale, -2)).astype(dtype),
            })
        else:
            ws.append({"w": jax.device_put(k).astype(dtype)})
    return ws


def _mm(x, wp, dtype):
    if "q" in wp:
        w = wp["q"].astype(dtype) * wp["s"][..., None, :].astype(dtype)
    else:
        w = wp["w"]
    return x @ w


def _next_in(i):
    """Input width the (i+1)-th matmul expects (wraps to h for the residual)."""
    return SHAPES[(i + 1) % len(SHAPES)][0]


def chain_fori(ws, x, dtype):
    def body(li, x):
        h = x
        for i, wp in enumerate(ws):
            wli = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
                wp,
            )
            y = _mm(h, wli, dtype)
            h = y[..., : _next_in(i)]
        return x + h

    return jax.lax.fori_loop(0, L, body, x)


def chain_scan(ws, x, dtype):
    def body(x, wli):
        h = x
        for i, wp in enumerate(wli):
            y = _mm(h, wp, dtype)
            h = y[..., : _next_in(i)]
        return x + h, None

    out, _ = jax.lax.scan(body, x, tuple(ws))
    return out


def chain_unrolled(ws, x, dtype):
    for li in range(L):
        h = x
        for i, wp in enumerate(ws):
            wli = jax.tree.map(lambda a: a[li], wp)
            y = _mm(h, wli, dtype)
            h = y[..., : _next_in(i)]
        x = x + h
    return x


STEPS = 50  # on-device repeats per timing — ONE tunnel fetch per measurement
            # (a fetch costs ~30 ms here, 7x the thing being measured)

_FETCH_S: list = []


def fetch_cost_s() -> float:
    """Median cost of fetching a scalar through the tunnel (the per-
    measurement overhead every timing below must subtract)."""
    if not _FETCH_S:
        g = jax.jit(lambda v: v.astype(jnp.float32).sum())
        z = jnp.ones((8, 8), jnp.bfloat16)
        float(g(z))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(g(z))
            ts.append(time.perf_counter() - t0)
        _FETCH_S.append(float(np.median(ts)))
    return _FETCH_S[0]


def bench(fn, ws, x, dtype, n=5):
    def many(ws, x):
        # dependent repeats: output feeds input so XLA can't parallelize
        return jax.lax.fori_loop(0, STEPS, lambda _, h: fn(ws, h, dtype), x)

    f = jax.jit(many)
    float(f(ws, x).astype(jnp.float32).sum())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(ws, x).astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return float((np.median(ts) - fetch_cost_s()) / STEPS * 1000)


def main():
    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, H), dtype)

    gb_int8 = sum(np.prod(s) for s in SHAPES) * L / 1e9
    gb_bf16 = gb_int8 * 2
    print(f"int8 weight bytes {gb_int8:.2f} GB (floor {gb_int8/819*1000:.2f} ms); "
          f"bf16 {gb_bf16:.2f} GB (floor {gb_bf16/819*1000:.2f} ms)")
    print(f"tunnel fetch cost {fetch_cost_s()*1000:.1f} ms (subtracted)")
    # Build/free each weight set around its benches so int8 + bf16 never
    # co-reside in HBM (16 GB chip; f32 staging alone would evict them).
    int8 = make_weights(True)
    import os

    variants = [
        ("fori-gather int8", chain_fori),
        ("scan-xs     int8", chain_scan),
    ]
    # unrolled compiles ~288 distinct matmul HLOs — minutes on this 1-core
    # host, and prof_mg_loop already showed unrolling loses; opt-in only.
    if os.environ.get("PROF_UNROLLED"):
        variants.append(("unrolled    int8", chain_unrolled))
    for name, fn in variants:
        try:
            ms = bench(fn, int8, x, dtype)
            per_op = (ms * 1000) / (L * len(SHAPES))
            print(f"{name}: {ms:7.2f} ms  ({per_op:.1f} us/matmul incl. fetch)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
    del int8
    jax.clear_caches()
    bf16 = make_weights(False)
    try:
        ms = bench(chain_scan, bf16, x, dtype)
        per_op = (ms * 1000) / (L * len(SHAPES))
        print(f"scan-xs     bf16: {ms:7.2f} ms  ({per_op:.1f} us/matmul incl. fetch)")
    except Exception as e:  # noqa: BLE001
        print(f"scan-xs     bf16: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
