#!/usr/bin/env python
"""Decompose the 2048² streamed-attention cost (VERDICT r2 weak #1).

The 2048² flux geometry is L = 16640 tokens (16384 img + 256 txt), 24 heads,
d=128. Per attention call the streamed kernel moves n_q passes over K/V:

    DMA  = (L/BLK_Q) · L·d·2·2B · heads   = 13.3 GB at BLK_Q=256 → 16.2 ms
    FLOP = 4·L²·d·heads                   = 3.4 TFLOP            → 17.3 ms

i.e. DMA and MXU are BALANCED at BLK_Q=256 — perfect overlap gives ~17 ms,
any pipeline stall serializes toward 33 ms. Doubling BLK_Q halves the K/V
traffic and should bury it under compute. This script times the kernel
standalone at several (BLK_Q, BLK_K) points, each in a FRESH subprocess
(module constants + jit caches), and prints ms/call vs the two floors.

Usage:  python scripts/prof_flash_2048.py            # sweep
        python scripts/prof_flash_2048.py --one 512 1024   # single point
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, time, sys
import numpy as np, jax, jax.numpy as jnp

blk_q, blk_k = int(sys.argv[1]), int(sys.argv[2])
import importlib
# attribute access via the package resolves to the re-exported FUNCTION
# (ops/pallas/__init__.py); import_module gets the submodule itself
fa = importlib.import_module("flux_generator_tpu.ops.pallas.flash_attention")
fa.BLK_Q = blk_q
one_shot = len(sys.argv) > 3 and sys.argv[3] == "oneshot"
from flux_generator_tpu.runtime.config import set_flash_attention
if one_shot:
    # force the ONE-SHOT path at full 2048-sq length: 16640 tokens pad to
    # a blk_q multiple; q/k pre-rotated in HBM (_PREROTATE_MAX), so VMEM
    # holds K/V (+dbuf) and the (blk_q, L) f32 logits tile
    l_pad_os = ((16640 + blk_q - 1) // blk_q) * blk_q
    set_flash_attention(blk_k=blk_k, one_shot_max=l_pad_os, blk_q=blk_q)
else:
    set_flash_attention(blk_k=blk_k, one_shot_max=1)  # force streamed

from flux_generator_tpu.ops.rope import rope_cos_sin

b, l, h, d = 1, 16640, 24, 128
key = jax.random.PRNGKey(0)
q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, l, h, d), jnp.bfloat16)
           for i in range(3))
cos, sin = rope_cos_sin(jnp.arange(l)[None], d)

out = fa.flash_attention(q, k, v, cos=cos, sin=sin)
float(out.astype(jnp.float32).sum())  # force through the tunnel
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = fa.flash_attention(q, k, v, cos=cos, sin=sin)
    float(out.astype(jnp.float32).sum())
    ts.append(time.perf_counter() - t0)
ms = float(np.median(ts) * 1000)
l_pad = ((l + max(blk_q, 1) - 1)//blk_q)*blk_q
l_pad = ((l_pad + blk_k - 1)//blk_k)*blk_k
n_q = l_pad // blk_q
dma_gb = n_q * l_pad * d * 2 * 2 * h / 1e9
flop_t = 4 * l_pad * l_pad * d * h / 1e12
print(json.dumps({
    "blk_q": blk_q, "blk_k": blk_k, "ms": round(ms, 2),
    "dma_floor_ms": round(dma_gb / 819 * 1000, 1),
    "mxu_floor_ms": round(flop_t / 197 * 1000, 1),
    "tflops_equiv": round(flop_t / (ms / 1000), 1),
}))
"""


def run_one(blk_q: int, blk_k: int, one_shot: bool = False) -> dict:
    argv = [sys.executable, "-c", CHILD, str(blk_q), str(blk_k)]
    if one_shot:
        argv.append("oneshot")
    proc = subprocess.run(
        argv, capture_output=True, text=True, timeout=1800, cwd=ROOT,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"child failed: {proc.stderr[-1500:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", nargs=2, type=int, metavar=("BLK_Q", "BLK_K"))
    ap.add_argument("--oneshot", action="store_true",
                    help="whole-K one-shot kernel at 16640 tokens "
                         "(pre-rotated q/k; BLK_K ignored)")
    args = ap.parse_args()
    if args.one:
        points = [tuple(args.one)]
    elif args.oneshot:
        points = [(256, 1024), (512, 1024)]
    else:
        points = [(256, 1024), (512, 1024), (512, 2048), (1024, 1024),
                  (256, 2048)]
    # note: fetch overhead through the axon tunnel (~25-30 ms) is constant
    # across points — compare deltas, not absolutes
    for bq, bk in points:
        try:
            r = run_one(bq, bk, one_shot=args.oneshot)
        except RuntimeError as e:
            print(f"BLK_Q={bq} BLK_K={bk}: FAILED — {str(e)[:300]}")
            continue
        mode = "one-shot" if args.oneshot else "streamed"
        print(f"{mode} BLK_Q={r['blk_q']:<5} BLK_K={r['blk_k']:<5} "
              f"{r['ms']:8.2f} ms  "
              f"(dma floor {r['dma_floor_ms']} ms, mxu floor {r['mxu_floor_ms']} ms, "
              f"{r['tflops_equiv']} TFLOP/s-equiv)")


if __name__ == "__main__":
    main()
