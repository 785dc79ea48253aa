#!/usr/bin/env python
"""Structural bisect for the fused decode megakernel's 2.1 -> 7.3 ms gap.

The stub experiment (prof_fused_decode.py --stub self,cross) showed the
production kernel WITHOUT any attention math still runs ~7.3 ms/step where
the bare chain prototype (prof_pallas_chain.py) runs 2.09 ms — so the cost
is one of the structural elements added around the chain, not the attention
math. This script rebuilds the prototype chain and adds those elements one
at a time (--extras, comma list, cumulative across the listed names):

  smem   scalar offset input in SMEM
  ln     (L, 8, H) layernorm-param input, block (1,8,H) indexed i//CPL
  cross  two (L, B, 12, H) cross-K/V inputs, block indexed i//CPL
  hbm    two (L, B, W, H) HBM-memory-space cache inputs (not read)
  bufs   double-buffer VMEM scratch (2,B,chunk,H) x2 + DMA semaphores
  outs   per-layer (1,B,H) k/v outputs written at c1/c2
  dma    issue+wait the cache-chunk DMA pair per layer (needs hbm+bufs)

Timing protocol matches the prototype: fori_loop of steps inside ONE jit,
fetch-cost-corrected, so numbers are directly comparable.

Usage: python scripts/prof_chain_bisect.py --extras ln,cross
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
CPL = 14
M = 8
B = 2
S_CROSS = 12


def _ln_norm(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


def make_kernel(extras, chunk, window):
    n_chunks = -(-window // chunk)

    def kernel(*refs):
        refs = list(refs)
        off_ref = refs.pop(0) if "smem" in extras else None
        w_ref = refs.pop(0)
        s_ref = refs.pop(0)
        ln_ref = refs.pop(0) if "ln" in extras else None
        x_ref = refs.pop(0)
        ck_ref = refs.pop(0) if "cross" in extras else None
        cv_ref = refs.pop(0) if "cross" in extras else None
        kc_hbm = refs.pop(0) if "hbm" in extras else None
        vc_hbm = refs.pop(0) if "hbm" in extras else None
        o_ref = refs.pop(0)
        kn_out = refs.pop(0) if "outs" in extras else None
        vn_out = refs.pop(0) if "outs" in extras else None
        xs, lns, ys, ts, hs, accs = refs[:6]
        refs = refs[6:]
        kbuf = refs.pop(0) if "bufs" in extras else None
        vbuf = refs.pop(0) if "bufs" in extras else None
        sems = refs.pop(0) if "bufs" in extras else None

        i = pl.program_id(0)
        li = i // CPL
        c = jax.lax.rem(i, CPL)

        def wf():
            return w_ref[0].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)

        def dot(a):
            return jax.lax.dot(
                a.astype(jnp.bfloat16), wf(),
                preferred_element_type=jnp.float32,
            )

        def read_chunk(j, slot):
            lo = j * chunk
            sz = min(window, lo + chunk) - lo
            pltpu.make_async_copy(
                kc_hbm.at[li, :, pl.ds(lo, sz), :],
                kbuf.at[slot, :, pl.ds(0, sz), :], sems.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                vc_hbm.at[li, :, pl.ds(lo, sz), :],
                vbuf.at[slot, :, pl.ds(0, sz), :], sems.at[slot, 1],
            ).start()

        def wait_chunk(j, slot):
            lo = j * chunk
            sz = min(window, lo + chunk) - lo
            pltpu.make_async_copy(
                kc_hbm.at[li, :, pl.ds(lo, sz), :],
                kbuf.at[slot, :, pl.ds(0, sz), :], sems.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                vc_hbm.at[li, :, pl.ds(lo, sz), :],
                vbuf.at[slot, :, pl.ds(0, sz), :], sems.at[slot, 1],
            ).wait()

        @pl.when(i == 0)
        def _():
            xs[...] = x_ref[...].astype(jnp.float32)

        @pl.when(c == 0)
        def _():
            base = _ln_norm(xs[...])
            if ln_ref is not None:
                base = base * ln_ref[0, 0:1].astype(jnp.float32) + ln_ref[
                    0, 1:2
                ].astype(jnp.float32)
            lns[...] = base
            ys[...] = dot(lns[...])
            if "dma" in extras:
                read_chunk(0, 0)

        @pl.when(c == 1)
        def _():
            t = dot(lns[...])
            ts[...] = t
            if kn_out is not None:
                kn_out[...] = t[0:B, :].astype(kn_out.dtype)[None]

        @pl.when(c == 2)
        def _():
            t = dot(lns[...])
            ts[...] = ts[...] + t
            if vn_out is not None:
                vn_out[...] = t[0:B, :].astype(vn_out.dtype)[None]

        @pl.when(c == 3)
        def _():
            if "dma" in extras:
                for j in range(n_chunks):
                    slot = j % 2
                    wait_chunk(j, slot)
                    if j + 1 < n_chunks:
                        read_chunk(j + 1, slot ^ 1)
                # touch the buffers so the DMAs aren't dead-code-eliminated
                ys[...] = ys[...] + 0.0 * jnp.sum(
                    kbuf[0, 0, 0:1, :].astype(jnp.float32), axis=0
                ) + 0.0 * jnp.sum(vbuf[0, 0, 0:1, :].astype(jnp.float32), axis=0)
            xs[...] = xs[...] + dot(ys[...]) + 0.0 * ts[:, :1]

        @pl.when(c == 4)
        def _():
            lns[...] = _ln_norm(xs[...])
            base = dot(lns[...])
            if ck_ref is not None:
                base = base + 0.0 * jnp.sum(
                    ck_ref[0, :, 0, :].astype(jnp.float32), axis=0
                ) + 0.0 * jnp.sum(cv_ref[0, :, 0, :].astype(jnp.float32), axis=0)
            ys[...] = base

        @pl.when(c == 5)
        def _():
            xs[...] = xs[...] + dot(ys[...])

        @pl.when(c == 6)
        def _():
            lns[...] = _ln_norm(xs[...])

        for j in range(4):
            @pl.when(c == 6 + j)
            def _(j=j):
                hs[:, j * H : (j + 1) * H] = dot(lns[...])

        @pl.when(c == 10)
        def _():
            accs[...] = jnp.zeros_like(accs)

        for j in range(4):
            @pl.when(c == 10 + j)
            def _(j=j):
                g = hs[:, j * H : (j + 1) * H]
                g = 0.5 * g * (1.0 + jnp.tanh(0.7978845608 * (g + 0.044715 * g**3)))
                accs[...] = accs[...] + dot(g)

        @pl.when(c == 13)
        def _():
            xs[...] = xs[...] + accs[...]
            o_ref[...] = xs[...].astype(o_ref.dtype)

    return kernel


def build(extras, n_layers, chunk, window):
    n = n_layers * CPL
    in_specs = []
    args = []
    rng = np.random.default_rng(0)
    if "smem" in extras:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1,), jnp.int32))
    in_specs += [
        pl.BlockSpec((1, H, H), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0)),
    ]
    args += [
        jax.device_put(rng.integers(-127, 128, size=(n, H, H), dtype=np.int8)),
        jax.device_put(
            (rng.random((n, 1, H), dtype=np.float32) * 0.02 + 0.01)
        ).astype(jnp.bfloat16),
    ]
    if "ln" in extras:
        in_specs.append(pl.BlockSpec((1, 8, H), lambda i: (i // CPL, 0, 0)))
        args.append(jnp.ones((n_layers, 8, H), jnp.bfloat16))
    in_specs.append(pl.BlockSpec((M, H), lambda i: (0, 0)))
    x = jax.device_put(rng.normal(size=(M, H)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    if "cross" in extras:
        for _ in range(2):
            in_specs.append(
                pl.BlockSpec((1, B, S_CROSS, H), lambda i: (i // CPL, 0, 0, 0))
            )
        ck = jnp.zeros((n_layers, B, S_CROSS, H), jnp.bfloat16)
        args_cross = [ck, jnp.zeros_like(ck)]
    else:
        args_cross = []
    if "hbm" in extras:
        for _ in range(2):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        kc = jnp.zeros((n_layers, B, window, H), jnp.bfloat16)
        args_hbm = [kc, jnp.zeros_like(kc)]
    else:
        args_hbm = []

    out_specs = [pl.BlockSpec((M, H), lambda i: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((M, H), jnp.bfloat16)]
    if "outs" in extras:
        for _ in range(2):
            out_specs.append(pl.BlockSpec((1, B, H), lambda i: (i // CPL, 0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((n_layers, B, H), jnp.bfloat16)
            )

    scratch = [
        pltpu.VMEM((M, H), jnp.float32),
        pltpu.VMEM((M, H), jnp.float32),
        pltpu.VMEM((M, H), jnp.float32),
        pltpu.VMEM((M, H), jnp.float32),
        pltpu.VMEM((M, 4 * H), jnp.float32),
        pltpu.VMEM((M, H), jnp.float32),
    ]
    if "bufs" in extras:
        scratch += [
            pltpu.VMEM((2, B, chunk, H), jnp.bfloat16),
            pltpu.VMEM((2, B, chunk, H), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]

    call = pl.pallas_call(
        make_kernel(extras, chunk, window),
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    def step(xx):
        pre = args + ([] if "cross" not in extras else args_cross) + args_hbm
        # x sits after w/s(/ln): rebuild arg list with the carried x
        full = []
        it = iter(pre)
        if "smem" in extras:
            full.append(next(it))
        full.append(next(it))
        full.append(next(it))
        if "ln" in extras:
            full.append(next(it))
        full.append(xx)
        full.extend(it)
        out = call(*full)
        return out[0] if isinstance(out, (tuple, list)) else out

    return step, x


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


def run_one(extras, layers, steps, chunk, window):
    step, x = build(extras, layers, chunk, window)
    g = jax.jit(
        lambda xx: jax.lax.fori_loop(0, steps, lambda _, h: step(h), xx)
    )
    float(g(x).astype(jnp.float32).sum())
    fetch = fetch_cost_s()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(x).astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    ms = (float(np.median(ts)) - fetch) / steps * 1000
    print(f"extras={sorted(extras)}: {ms:7.3f} ms/step", flush=True)


# v1 (manual DMA) and v2 (auto-pipelined) both measure ~7.3-7.6 ms/step
# while the bare chain runs 2.09 — so the overhead lives in what they
# SHARE: the smem scalar, the ln block, or the cross K/V blocks. Each
# remote compile costs ~15 min through the tunnel; keep the list tight.
LADDER = [
    "",
    "smem",
    "smem,ln",
    "smem,ln,cross",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extras", default="")
    ap.add_argument("--ladder", action="store_true",
                    help="run the full additive ladder in one process")
    ap.add_argument("--layers", type=int, default=48)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--window", type=int, default=512)
    args = ap.parse_args()
    todo = LADDER if args.ladder else [args.extras]
    for spec in todo:
        extras = frozenset(s for s in spec.split(",") if s)
        if "dma" in extras and not ({"hbm", "bufs"} <= extras):
            raise SystemExit("--extras dma requires hbm,bufs")
        run_one(extras, args.layers, args.steps, args.chunk, args.window)


if __name__ == "__main__":
    main()
