#!/usr/bin/env python3
"""Measure the W8A8 matmul formulations on the real chip, flux hot shapes.

Candidates:
  bf16       — plain bf16 dot (the 74%-MFU datapath, for reference)
  xla-w8a8   — current ops/linear path: XLA amax + quant + int8 dot + dequant
  pallas     — ops/pallas/w8a8_matmul.w8a8_matmul (fully fused)
  pq+xla     — pallas quantize_rows (one pass) + XLA int8 dot + dequant

Protocol: ITERS scan iterations inside ONE jitted program, each indexing a
different one of R pre-staged activation copies (defeats CSE); the axon
tunnel's ~30 ms scalar-fetch cost is measured separately and subtracted.
Report ms/call and effective TOPS.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

R = 8
ITERS = 128

# flux-12B hot matmuls at 512^2 (1024 img + 256 txt tokens; double blocks see
# the streams separately, single blocks the concat)
SHAPES = [
    ("dbl qkv+mod img", 1024, 3072, 9216),
    ("dbl mlp-in img", 1024, 3072, 12288),
    ("dbl mlp-out img", 1024, 12288, 3072),
    ("sgl linear1", 1280, 3072, 21504),
    ("sgl linear2", 1280, 15360, 3072),
]


_FETCH = None


def fetch_cost():
    global _FETCH
    if _FETCH is None:
        f = jax.jit(lambda v: v.astype(jnp.float32).sum())
        z = jnp.ones((8, 8), jnp.bfloat16)
        float(f(z))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(f(z))
            ts.append(time.perf_counter() - t0)
        _FETCH = float(np.median(ts))
        print(f"[fetch cost {_FETCH*1e3:.1f} ms]", flush=True)
    return _FETCH


def timeit(fn, *args):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - fetch_cost(), 1e-9) / ITERS


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="substring filter on shape name")
    ap.add_argument("--variants", default="bf16,xla-w8a8,pallas,pq+xla")
    args = ap.parse_args()
    variants = args.variants.split(",")

    from flux_generator_tpu.ops.pallas.w8a8_matmul import quantize_rows, w8a8_matmul

    key = jax.random.PRNGKey(0)
    for name, M, K, N in SHAPES:
        if args.only and args.only not in name:
            continue
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        xs = jax.random.normal(kx, (R, M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.bfloat16)
        amax_w = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
        ws = (amax_w / 127.0).astype(jnp.float32)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / ws), -127, 127).astype(jnp.int8)

        def scan_over(f):
            @jax.jit
            def g(xs):
                def body(acc, i):
                    x = jax.lax.dynamic_index_in_dim(
                        xs, jax.lax.rem(i, R), 0, keepdims=False)
                    y = f(x)
                    return acc + jnp.sum(y.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
                return acc
            return g

        def f_bf16(x):
            return x @ w

        def f_xla(x):
            sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
            sx = jnp.maximum(sx, 1e-8)
            x_q = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x_q, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(x.dtype) * sx.astype(x.dtype) * ws.astype(x.dtype)

        def f_pallas(x):
            return w8a8_matmul(x, wq, ws)

        def f_pq(x):
            x_q, sx = quantize_rows(x)
            acc = jax.lax.dot_general(
                x_q, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(x.dtype) * sx.astype(x.dtype) * ws.astype(x.dtype)

        flops = 2 * M * K * N
        print(f"--- {name}: M={M} K={K} N={N} ({flops/1e9:.1f} GFLOP)", flush=True)
        table = {"bf16": f_bf16, "xla-w8a8": f_xla, "pallas": f_pallas,
                 "pq+xla": f_pq}
        for label in variants:
            f = table[label]
            try:
                s = timeit(scan_over(f), xs)
                print(f"  {label:10s} {s*1e3:8.3f} ms  {flops/s/1e12:7.1f} TOPS-eff",
                      flush=True)
            except Exception as e:
                print(f"  {label:10s} FAIL {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
