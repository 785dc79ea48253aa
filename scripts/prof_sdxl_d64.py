"""SDXL head_dim-64 attention regime study (VERDICT r4 next #4).

The r4 Δ-stub split put SDXL-Turbo 1024² attention math at 21.5 ms (~37
TF/s) vs the FFN's ~112 TF/s, attributed to head_dim 64 halving the MXU
contraction lanes — but on Δ-stub evidence only. This measures the claim
DIRECTLY at the op level and probes the two proposed escapes:

  1. raw-dot ladder: (L, d)·(d, L) and (L, L)·(L, d) at d = 64 vs 128 —
     if the BARE MXU dot at d=64 runs ~half the d=128 rate, the cap is the
     contraction width itself, not the kernel around it;
  2. head-packed THROUGHPUT PROBE: attention with the 10 d=64 heads
     reinterpreted as 5 d=128 heads — numerically WRONG on purpose (the
     two packings mix head subspaces), but its wall time is the upper
     bound any correct packing scheme could reach; if even this shows no
     win, packing is dead;
  3. BLK_Q ladder on the real shape (one-shot path, d=64): per-grid-step
     overhead amortization without changing the math.

Run on the TPU: python scripts/prof_sdxl_d64.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed(fn, n=7):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def tfs(flops, sec):
    return flops / sec / 1e12


def raw_dots():
    """Bare MXU dots at the SDXL 32²-level attention shapes (L=4096 after
    the 1024² image maps to 32² tokens... the transformer runs at 32²=1024
    and 64²=4096 token levels; both measured)."""
    print("== raw-dot ladder (bf16, jitted, chained x16 to swamp dispatch)")
    for L in (1024, 4096):
        for d in (64, 128):
            a = jax.random.normal(jax.random.PRNGKey(0), (L, d), jnp.bfloat16)
            b = jax.random.normal(jax.random.PRNGKey(1), (d, L), jnp.bfloat16)

            @jax.jit
            def qk(a, b):
                # 16 dependent dots: per-call overhead amortizes, DCE-proof
                for _ in range(16):
                    c = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
                    a = c[:, :a.shape[1]].astype(jnp.bfloat16) * 1e-3
                return a

            t = timed(lambda: np.asarray(qk(a, b)).sum()) / 16
            fl = 2 * L * d * L
            print(f"  qk L={L} d={d}: {t*1e3:7.3f} ms/dot  {tfs(fl, t):6.1f} TF/s")
        for d in (64, 128):
            p = jax.random.normal(jax.random.PRNGKey(0), (L, L), jnp.bfloat16)
            v = jax.random.normal(jax.random.PRNGKey(1), (L, d), jnp.bfloat16)

            @jax.jit
            def pv(p, v):
                acc = jnp.zeros((L, v.shape[1]), jnp.float32)
                for i in range(16):
                    acc = acc + jax.lax.dot(
                        p + jnp.float32(i).astype(jnp.bfloat16), v,
                        preferred_element_type=jnp.float32)
                return acc

            t = timed(lambda: np.asarray(pv(p, v)).sum()) / 16
            fl = 2 * L * L * d
            print(f"  pv L={L} d={d}: {t*1e3:7.3f} ms/dot  {tfs(fl, t):6.1f} TF/s")


def attention_probes():
    from flux_generator_tpu.ops.pallas.flash_attention import flash_attention
    from flux_generator_tpu.runtime.config import set_flash_attention

    print("== attention probes (SDXL 1024² 64²-level: B=1 L=4096 H=10 d=64)")
    B, L = 1, 4096
    kq = jax.random.PRNGKey(0)

    def run_shape(H, D, label, blk_q=None):
        q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
        if blk_q:
            set_flash_attention(blk_q=blk_q)
        try:
            t = timed(lambda: float(flash_attention(q, q * 0.5, q * 0.25).sum()))
        finally:
            set_flash_attention()
        fl = 2 * 2 * L * L * H * D  # qk + pv
        print(f"  {label}: {t*1e3:7.2f} ms  {tfs(fl, t):6.1f} TF/s")
        return t

    t64 = run_shape(10, 64, "H=10 d=64 (real, auto blk)")
    run_shape(10, 64, "H=10 d=64 blk_q=512", blk_q=512)
    run_shape(10, 64, "H=10 d=64 blk_q=1024", blk_q=1024)
    # the packed probe: same total work, half the heads, double the depth —
    # numerically WRONG (upper-bound throughput probe only)
    t128 = run_shape(5, 128, "H=5 d=128 (PACKED PROBE)")
    print(f"  packed-probe speedup would be {t64 / t128:0.2f}x "
          f"(>1.15 = worth a correct packing scheme)")


def main():
    print(f"backend: {jax.default_backend()}")
    raw_dots()
    attention_probes()


if __name__ == "__main__":
    main()
