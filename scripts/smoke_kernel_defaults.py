"""Kernel-default regression pins (VERDICT r4 next #8).

A <2-minute (warm-cache) TPU check that the measured routing decisions still
beat their fallbacks, so a later session cannot silently regress a default:

  routing tables (CPU, free):
    R1  flash one-shot threshold = 6144, streamed auto BLK_Q = 1024
    R2  musicgen fused impl: v2 short / v1 past the measured 1500-step
        crossover, v1 for batched n>1 and for f8 KV caches
    R3  int8 attention tiers default OFF (measured loss on v5e both paths)

  timed A/B pins (TPU):
    T1  one-shot attention beats forced-streamed at 4096 tokens
        (flux 1024^2 regime; the ONE_SHOT_MAX=6144 routing)
    T2  streamed BLK_Q=1024 beats BLK_Q=256 at 16640 tokens (2048^2 regime;
        measured 31.2 vs 39.5 ms kernel — scripts/prof_flash_2048.py)
    T3  Pallas LSTM kernel beats the unjitted scan it replaces for
        streaming use (measured 14x standalone; encodec d=1024)

Each timed pin asserts default <= TOL x alternative (TOL absorbs tunnel
noise; a real routing inversion is >25% in every measured case).
Exit code 0 = all pins hold. Run: python scripts/smoke_kernel_defaults.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

TOL = 1.10  # default may be up to 10% slower than the alt before failing

FAILED = []


def pin(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILED.append(name)


def timed(fn, n=5):
    fn()  # compile / warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def routing_pins():
    from flux_generator_tpu.runtime.config import (
        attn_int8,
        flash_blk_q,
        flash_one_shot_max,
        musicgen_fused_impl_for,
        set_musicgen_kv_dtype,
    )

    pin("R1 one-shot threshold", flash_one_shot_max() == 6144,
        f"= {flash_one_shot_max()}")
    pin("R1 streamed BLK_Q auto", flash_blk_q() == 0, f"= {flash_blk_q()}")
    ok = (
        musicgen_fused_impl_for(100) == "v2"
        and musicgen_fused_impl_for(1500) == "v2"
        and musicgen_fused_impl_for(1501) == "v1"
        and musicgen_fused_impl_for(200, n_samples=4) == "v1"
    )
    set_musicgen_kv_dtype("f8")
    ok = ok and musicgen_fused_impl_for(100) == "v1"
    set_musicgen_kv_dtype(None)
    pin("R2 musicgen fused impl table", ok)
    pin("R3 int8 attention tiers off", attn_int8() == "")


def attention_pins():
    from flux_generator_tpu.ops.pallas.flash_attention import flash_attention
    from flux_generator_tpu.runtime.config import set_flash_attention

    B, H, D = 1, 24, 128

    def mk(L):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, L, H, D), jnp.bfloat16)
        return q, q * 0.5, q * 0.25

    # T1: one-shot (default at 4096) vs forced streamed
    q, k, v = mk(4096)

    def run():
        return float(flash_attention(q, k, v).sum())

    t_default = timed(run)
    set_flash_attention(one_shot_max=2048)  # forces the streamed path
    try:
        t_streamed = timed(run)
    finally:
        set_flash_attention()
    pin("T1 one-shot<=streamed @4096", t_default <= TOL * t_streamed,
        f"{t_default*1e3:.1f} vs {t_streamed*1e3:.1f} ms")

    # T2: streamed BLK_Q 1024 (auto) vs 256 at the 2048^2 flux length
    q, k, v = mk(16640)
    t_1024 = timed(run, n=3)
    set_flash_attention(blk_q=256)
    try:
        t_256 = timed(run, n=3)
    finally:
        set_flash_attention()
    pin("T2 BLK_Q 1024<=256 @16640", t_1024 <= TOL * t_256,
        f"{t_1024*1e3:.1f} vs {t_256*1e3:.1f} ms")


def lstm_pin():
    from flux_generator_tpu.models.musicgen.encodec import lstm_forward
    from flux_generator_tpu.ops.pallas.lstm import lstm_pallas

    d, t = 1024, 200
    k = jax.random.PRNGKey(1)
    p = {
        "wx": jax.random.normal(k, (d, 4 * d), jnp.float32) * 0.05,
        "wh": jax.random.normal(k, (d, 4 * d), jnp.float32) * 0.05,
        "bias": jnp.zeros((4 * d,), jnp.float32),
    }
    x = jax.random.normal(k, (1, t, d), jnp.float32)

    t_kernel = timed(lambda: float(lstm_pallas(p, x).sum()), n=3)
    # the fallback the kernel ships to beat: the scan WITHOUT a surrounding
    # jit (streaming / eager use — inside one jitted program they tie)
    with jax.disable_jit():
        t_scan = timed(lambda: float(lstm_forward(p, x).sum()), n=1)
    pin("T3 pallas lstm<=eager scan", t_kernel <= TOL * t_scan,
        f"{t_kernel*1e3:.1f} vs {t_scan*1e3:.1f} ms")


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    routing_pins()
    if jax.default_backend() == "tpu":
        attention_pins()
        lstm_pin()
    else:
        print("SKIP timed pins (no TPU backend)")
    if FAILED:
        print("FAILED pins:", ", ".join(FAILED))
        sys.exit(1)
    print("ALL PINS HOLD")


if __name__ == "__main__":
    main()
