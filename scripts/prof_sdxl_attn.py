#!/usr/bin/env python3
"""SDXL head_dim-64 attention study (NOTES round-5 item 2).

SDXL-Turbo 1024² runs at 20.4% MFU with attention ~32% of the step and
~32% of its FLOPs — uniformly slow at ~37 TF/s. The flash kernel's block
sizes were tuned for flux (head_dim 128); SDXL heads are 64-wide, which
halves the MXU contraction/lane occupancy of every attention matmul.

This measures, on the real chip, each SDXL attention geometry as an
amortized scan chain (N calls, one fetch):

  self  64² level: (B, L=4096, H=10, D=64)   — 10 of 70 layers
  self  32² level: (B, L=1024, H=20, D=64)   — 60 of 70 layers
  cross 32² level: (Lq=1024, Lk=77, H=20)    — XLA-only today

impls: XLA einsum attention (ops.attention.dot_product_attention) vs the
Pallas flash kernel at BLK_Q ∈ {128, 256, 512, 1024} (one-shot path; the
(BLK_Q, L) f32 logits tile stays ≤4 MB for every combination here).

The practical MXU cap at D=64 is ~50% of bf16 peak (contraction of half
a 128-lane tile), i.e. ~98 TF/s — percentages are printed against BOTH.

Ref anchor: the reference's attention is
/root/reference/stable_diffusion/stable_diffusion/unet.py:403-460 (mx.fast
scaled_dot_product_attention); ours is models/sd/unet.py:_self_attention.

Usage: python scripts/prof_sdxl_attn.py [--batch N]
"""

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)

from flux_generator_tpu.ops.attention import dot_product_attention  # noqa: E402
from flux_generator_tpu.ops.pallas.flash_attention import flash_attention  # noqa: E402
from flux_generator_tpu.runtime.config import set_flash_attention  # noqa: E402

PEAK = 197e12


def _med(f, n=5):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(attn, b, l, h, d, lk=None, n=50):
    """Time n dependent attention calls in ONE jitted program (q fed from
    the previous output so nothing is DCE'd; k/v fixed)."""
    lk = lk or l
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, l, h, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, lk, h, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, lk, h, d), jnp.bfloat16)

    @jax.jit
    def f(q, k, v):
        def body(qc, _):
            o = attn(qc, k, v)
            return o.astype(jnp.bfloat16), ()
        o, _ = jax.lax.scan(body, q, None, length=n)
        return o

    t = _med(lambda: float(jnp.sum(f(q, k, v).astype(jnp.float32))))
    return t / n


def main():
    b = 1
    if "--batch" in sys.argv:
        b = int(sys.argv[sys.argv.index("--batch") + 1])
    geoms = [
        ("self 64²  L=4096 H=10", 4096, 10, None),
        ("self 32²  L=1024 H=20", 1024, 20, None),
        ("cross 64² Lk=77  H=10", 4096, 10, 77),
        ("cross 32² Lk=77  H=20", 1024, 20, 77),
    ]
    d = 64
    print(f"== SDXL attention microbench (batch {b}, D=64, bf16) ==")
    print(f"{'geometry':<24} {'impl':<14} {'ms/call':>8} {'TF/s':>7} "
          f"{'%peak':>6} {'%d64cap':>8}")
    for name, l, h, lk in geoms:
        fl = 4 * b * h * l * (lk or l) * d
        rows = [("xla", lambda: chain(dot_product_attention, b, l, h, d, lk))]
        if lk is None:  # flash kernel handles self-attention only here
            for bq in (128, 256, 512, 1024):
                if bq * l * 4 > 12 * 2**20:
                    continue  # (BLK_Q, L) f32 logits tile would OOM VMEM
                def run(bq=bq):
                    set_flash_attention(blk_q=bq)
                    try:
                        return chain(flash_attention, b, l, h, d, lk)
                    finally:
                        set_flash_attention(blk_q=None)
                rows.append((f"flash bq={bq}", run))
        for label, run in rows:
            t = run()
            tf = fl / t / 1e12
            print(f"{name:<24} {label:<14} {t*1e3:8.3f} {tf:7.1f} "
                  f"{100*tf*1e12/PEAK:6.1f} {100*tf*1e12/(PEAK/2):8.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
