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
                     (wall time > 30 min). Runs as TWO pytest processes:
                     the matrix minus test_quant_quality, then that module
                     alone — its dev-depth sampler compiles have twice
                     segfaulted XLA:CPU when run late in a ~250-compile
                     process (jaxlib-internal; fresh process is clean).
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

    pytest = [sys.executable, "-m", "pytest", "-q"]
    if args.tier == "quick":
        cmd = pytest + [str(ROOT / "tests"),
                        "-m", "not slow and not multiproc and not tpu"]
        return subprocess.call(cmd + extra)
    if args.tier == "tpu":
        # real-chip kernel parities (tests/test_tpu_hardware.py): keep the
        # axon backend (conftest skips its CPU forcing under FGT_TEST_TPU)
        # and select ONLY tpu-marked tests — the rest assume the CPU mesh.
        import os

        env = dict(os.environ, FGT_TEST_TPU="1")
        cmd = pytest + [str(ROOT / "tests"), "-m", "tpu"]
        return subprocess.call(cmd + extra, env=env)
    # full tier: split into process-isolated chunks. A single pytest process
    # running the whole matrix has segfaulted twice (r5) inside XLA:CPU's
    # backend_compile after ~250 accumulated compiles, both times in
    # test_quant_quality's dev-depth sampler loops (the suite's biggest CPU
    # compiles); the module passes in a fresh process. Giving the heavy
    # module its own interpreter keeps the matrix green and loses nothing.
    quant = ROOT / "tests" / "test_quant_quality.py"
    rc = subprocess.call(
        pytest + [str(ROOT / "tests"), "-m", "not tpu",
                  f"--ignore={quant}"] + extra)
    rc2 = subprocess.call(pytest + [str(quant)] + extra)
    return rc or rc2


if __name__ == "__main__":
    sys.exit(main())
