#!/usr/bin/env python3
"""Tiered test runner (parity: test/run_tests.py — import-check each module
first, then run pytest; VERDICT r3 next #7 adds tiers so the suite is
actually run between rounds).

Tiers:
  quick (default)  — everything not marked slow/multiproc/tpu; measured
                     2:56 for 154 tests on the idle 1-core CPU machine
                     (r4). Run on every change.
  full             — the whole matrix, including the multi-process
                     jax.distributed tests, the golden/twin parity pins,
                     and the weights-day selftest. Run once per round
                     (wall time > 30 min; shard with `pytest tests/ -m
                     slow` style chunking if the machine is contended).
                     tpu-marked tests self-skip here (CPU backend).
  tpu              — real-chip kernel parities (tests/test_tpu_hardware.py)
                     compiled on the actual TPU via the axon tunnel; needs
                     the chip. ~5-10 min, mostly compiles.

Usage: python scripts/run_tests.py [--tier quick|full] [extra pytest args]
"""

from __future__ import annotations

import argparse
import importlib
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", choices=["quick", "full", "tpu"],
                    default="quick")
    args, extra = ap.parse_known_args()

    sys.path.insert(0, str(ROOT))
    failures = []
    pkg = ROOT / "flux_generator_tpu"
    for py in sorted(pkg.rglob("*.py")):
        mod = ".".join(py.relative_to(ROOT).with_suffix("").parts)
        try:
            importlib.import_module(mod)
        except Exception as e:  # noqa: BLE001
            failures.append((mod, e))
    if failures:
        for mod, e in failures:
            print(f"[import FAIL] {mod}: {e}")
        return 1
    print("[ok] all modules import")

    cmd = [sys.executable, "-m", "pytest", str(ROOT / "tests"), "-q"]
    env = None
    if args.tier == "quick":
        cmd += ["-m", "not slow and not multiproc and not tpu"]
    elif args.tier == "tpu":
        # real-chip kernel parities (tests/test_tpu_hardware.py): keep the
        # axon backend (conftest skips its CPU forcing under FGT_TEST_TPU)
        # and select ONLY tpu-marked tests — the rest assume the CPU mesh.
        import os

        env = dict(os.environ, FGT_TEST_TPU="1")
        cmd += ["-m", "tpu"]
    cmd += extra
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
