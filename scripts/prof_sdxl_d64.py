"""SDXL head_dim-64 attention regime study (VERDICT r4 next #4).

The r4 Δ-stub split put SDXL-Turbo 1024² attention math at 21.5 ms (~37
TF/s) vs the FFN's ~112 TF/s, attributed to head_dim 64 halving the MXU
contraction lanes — but on Δ-stub evidence only. This measures the claim
DIRECTLY at the op level and probes the two proposed escapes.

Measurement protocol: every number is a MARGINAL time between two chain
depths inside ONE jitted program (t[n2] − t[n1]) / (n2 − n1) — the axon
tunnel's ~30 ms dispatch and fetch costs cancel (the first version of this
script timed single dispatches and printed tunnel noise; BENCH_RESULTS
"conditioning deep-dive" documents the same trap).

Probes:
  1. head-batched dot ladder (the EXACT attention matmul workload:
     lax.dot_general with H batch dims) at d = 64 vs 128 — if the bare
     batched MXU dot at d=64 runs ~half the d=128 rate, the cap is the
     contraction width itself, not the kernel around it;
  2. flash-attention kernel on the real SDXL shape (B=1 L=4096 H=10 d=64)
     vs the head-packed THROUGHPUT PROBE (H=5 d=128 — numerically WRONG on
     purpose; its wall time is the upper bound ANY correct packing scheme
     could reach) and a BLK_Q=512 variant (VMEM caps one-shot blk_q at 512
     for L=4096: the (1024, 4096) f32 logits tile is 16.8M > 16M).

Run on the TPU: python scripts/prof_sdxl_d64.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@functools.partial(jax.jit, static_argnames=("n", "mode"))
def _dot_chain(q, k, n, mode):
    """n dependent head-batched dots — qk: (H,L,d)x(H,d,L)->(H,L,L);
    pv: (H,L,L)x(H,L,d)->(H,L,d). The dependency feeds a slice of the
    output back into the next iteration so XLA cannot collapse the chain."""
    dn = (((2,), (1,)), ((0,), (0,)))
    acc = jnp.zeros((), jnp.float32)
    for _ in range(n):
        if mode == "qk":
            c = jax.lax.dot_general(q, k, dn,
                                    preferred_element_type=jnp.float32)
            acc = acc + c[0, 0, 0]
            q = q + c[:, :, : q.shape[2]].astype(q.dtype) * 1e-6
        else:  # pv: q is (H,L,L) probs, k is (H,L,d) values
            c = jax.lax.dot_general(q, k, dn,
                                    preferred_element_type=jnp.float32)
            acc = acc + c[0, 0, 0]
            k = k + c.astype(k.dtype) * 1e-6
    return acc


def marginal(fn_n, n1, n2, flops_per_iter, label):
    t1 = timed(lambda: fn_n(n1))
    t2 = timed(lambda: fn_n(n2))
    per = max(t2 - t1, 1e-9) / (n2 - n1)
    print(f"  {label}: {per*1e3:7.3f} ms/iter  "
          f"{flops_per_iter / per / 1e12:6.1f} TF/s", flush=True)
    return per


def raw_dots():
    print("== head-batched dot ladder (H=10, marginal over chain depth)",
          flush=True)
    H = 10
    for L in (1024, 4096):
        for d in (64, 128):
            q = jax.random.normal(jax.random.PRNGKey(0), (H, L, d),
                                  jnp.bfloat16)
            k = jax.random.normal(jax.random.PRNGKey(1), (H, d, L),
                                  jnp.bfloat16)
            marginal(
                lambda n: float(_dot_chain(q, k, n, "qk")),
                4, 64, 2 * H * L * d * L, f"qk L={L} d={d}")
        for d in (64, 128):
            p = jax.random.normal(jax.random.PRNGKey(0), (H, L, L),
                                  jnp.bfloat16)
            v = jax.random.normal(jax.random.PRNGKey(1), (H, L, d),
                                  jnp.bfloat16)
            marginal(
                lambda n: float(_dot_chain(p, v, n, "pv")),
                4, 64, 2 * H * L * L * d, f"pv L={L} d={d}")


def attention_probes():
    from flux_generator_tpu.ops.pallas.flash_attention import flash_attention
    from flux_generator_tpu.runtime.config import set_flash_attention

    @functools.partial(jax.jit, static_argnames=("n",))
    def attn_chain(q, n):
        for _ in range(n):
            o = flash_attention(q, q * 0.5, q * 0.25)
            q = q + o * 1e-6
        return q[0, 0, 0, 0]

    print("== attention kernel (B=1 L=4096, marginal over chain depth)",
          flush=True)
    B, L = 1, 4096
    results = {}

    def probe(H, D, label, blk_q=None):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, L, H, D),
                              jnp.bfloat16)
        if blk_q:
            set_flash_attention(blk_q=blk_q)
        try:
            fl = 2 * 2 * L * L * H * D
            results[label] = marginal(
                lambda n: float(attn_chain(q, n)), 4, 36, fl, label)
        finally:
            set_flash_attention()

    probe(10, 64, "H=10 d=64 (real, auto blk_q=256)")
    probe(10, 64, "H=10 d=64 blk_q=512", blk_q=512)
    probe(5, 128, "H=5 d=128 (PACKED PROBE)")
    t64 = results["H=10 d=64 (real, auto blk_q=256)"]
    t128 = results["H=5 d=128 (PACKED PROBE)"]
    print(f"  packed-probe speedup bound: {t64 / t128:0.2f}x "
          f"(>1.15 = a correct packing scheme could pay)", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    raw_dots()
    attention_probes()


if __name__ == "__main__":
    main()
