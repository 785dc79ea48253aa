#!/usr/bin/env python
"""A/B the MusicGen decode layer-loop structures on real hardware.

Runs bench.bench_musicgen (int8, real musicgen-medium geometry, CFG batch 2)
once per FGT_MG_LAYER_LOOP mode in a fresh subprocess (isolated jit caches,
one remote compile at a time — the tunnel has a single CPU core). The modes
are math-identical (tests/test_musicgen.py::test_layer_loop_modes_bit_identical);
this measures which loop form XLA schedules closest to the ~1.7 ms int8
weight-bandwidth floor (BENCH_RESULTS "MusicGen AR floor").

Usage: python scripts/prof_mg_loop.py [--steps 50] [--modes fori scan unroll]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import importlib, json, sys
mode, steps = sys.argv[1], int(sys.argv[2])
from flux_generator_tpu.runtime.config import set_musicgen_layer_loop
set_musicgen_layer_loop(mode)
bench = importlib.import_module("bench")
r = bench.bench_musicgen(max_steps=steps, repeats=5, quantize=True)
print(json.dumps({"mode": mode, "ms_per_step": r["ms_per_step"],
                  "audio_sec_per_sec": r["value"]}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--modes", nargs="+", default=["fori", "scan", "unroll"])
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for mode in args.modes:
        p = subprocess.run(
            [sys.executable, "-c", CHILD, mode, str(args.steps)],
            cwd=root, capture_output=True, text=True, timeout=3600,
        )
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        if p.returncode != 0 or not line.startswith("{"):
            print(f"{mode}: FAILED\n{p.stderr[-800:]}")
            continue
        r = json.loads(line)
        results.append(r)
        print(f"{r['mode']:6s}: {r['ms_per_step']:7.3f} ms/step  "
              f"({r['audio_sec_per_sec']:.2f} audio-sec/sec)")
    if results:
        best = min(results, key=lambda r: r["ms_per_step"])
        print(f"winner: {best['mode']} at {best['ms_per_step']:.3f} ms/step")


if __name__ == "__main__":
    main()
