"""Profile the fused decode-step megakernel (ops/pallas/decode_layer.py) at
full musicgen-medium geometry on real hardware, against the XLA decode_step.

Amortized on-device timing (tunnel fetch excluded, same protocol as
prof_ar_floor.py): run N steps chained through the cache carry, block once.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from flux_generator_tpu.models.musicgen import model as mg
from flux_generator_tpu.ops.pallas.decode_layer import (
    fused_decode_step,
    fused_decode_step2,
    pack_decode_weights,
)
from flux_generator_tpu.ops.quant import quantize_tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--window", default="512", help="comma list ok")
    ap.add_argument("--no-quant", action="store_true")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--mode", choices=["fused", "xla", "both"], default="both")
    ap.add_argument("--impl", default="v1", help="v1|v2, comma list ok")
    ap.add_argument("--stub", default="",
                    help="comma list of phases to stub out (self,cross) — "
                         "timing bisect only, numerics are wrong")
    args = ap.parse_args()

    cfg = mg.MusicGenConfig()
    dtype = jnp.bfloat16
    shape = jax.eval_shape(
        lambda: mg.init_musicgen(jax.random.PRNGKey(0), cfg, dtype)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shape)
    if not args.no_quant:
        params = dict(
            params, layers=quantize_tree(params["layers"], bits=8)
        )
    h, L = cfg.hidden_size, cfg.num_hidden_layers
    B2 = 2
    S = 12

    cond = jnp.zeros((B2, S, h), dtype)
    cross_kv = mg.precompute_cross_kv(params, cfg, cond)
    tok = jnp.zeros((B2, 1, cfg.num_codebooks), jnp.int32)

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

    def time_loop(step_fn, carry, n):
        # ONE jit around the whole chain: per-call dispatch through the axon
        # tunnel costs ~4-5 ms, which an earlier per-step version of this
        # harness mistook for kernel overhead (it dwarfed the signal).
        # block_until_ready does not sync through the tunnel either — the
        # program reduces its carry to one scalar, fetched once, and the
        # measured fetch cost is subtracted.
        def run(c0):
            out = jax.lax.fori_loop(0, n, lambda i, c: step_fn(c, i), c0)
            return sum(
                jnp.sum(a.astype(jnp.float32)) for a in jax.tree.leaves(out)
            )

        g = jax.jit(run)
        float(g(carry))  # compile + warmup
        fetch = fetch_cost_s()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(g(carry))
            ts.append(time.perf_counter() - t0)
        return (float(np.median(ts)) - fetch) / n * 1000

    stub = tuple(s for s in args.stub.split(",") if s)
    packed = None
    if args.mode in ("fused", "both"):
        packed = pack_decode_weights(params["layers"], h, cfg.ffn_dim)
        packed = jax.tree.map(jnp.asarray, packed)
        ckv = tuple(a.reshape(L, B2, S, h) for a in cross_kv)

    windows = [
        -(-int(w) // 8) * 8 for w in str(args.window).split(",")
    ]
    impls = args.impl.split(",")

    for W in windows:
        if args.mode in ("fused", "both"):
            kc = jnp.zeros((L, B2, W, h), dtype)
            vc = jnp.zeros_like(kc)
            for impl in impls:
                kfn = fused_decode_step2 if impl == "v2" else fused_decode_step

                @jax.jit
                def fstep(carry, off, kfn=kfn):
                    x, kc, vc = carry
                    y, kc, vc = kfn(
                        packed, x, ckv[0], ckv[1], off, kc, vc,
                        n_heads=cfg.num_attention_heads, chunk=args.chunk,
                        stub=stub,
                    )
                    return y, kc, vc

                x0 = jnp.zeros((B2, h), dtype)
                ms = time_loop(fstep, (x0, kc, vc), args.steps)
                print(f"fused megakernel[{impl}]: {ms:.3f} ms/step "
                      f"(window={W}, chunk={args.chunk}, stub={stub})",
                      flush=True)

        if args.mode in ("xla", "both"):
            kc, vc = mg.init_kv_cache(cfg, B2, W, dtype)

            @jax.jit
            def xstep(carry, off):
                kc, vc = carry
                logits, kc, vc = mg.decode_step(
                    params, cfg, tok, cross_kv, kc, vc, off
                )
                return kc, vc

            ms = time_loop(xstep, (kc, vc), args.steps)
            print(f"xla decode_step:  {ms:.3f} ms/step (window={W})",
                  flush=True)


if __name__ == "__main__":
    main()
