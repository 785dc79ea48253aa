#!/usr/bin/env python3
"""Test runner (parity: test/run_tests.py — import-check each module first,
then run pytest)."""

from __future__ import annotations

import importlib
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).parent.parent


def main() -> int:
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
    print(f"[ok] all modules import")
    return subprocess.call(
        [sys.executable, "-m", "pytest", str(ROOT / "tests"), "-q"]
    )


if __name__ == "__main__":
    sys.exit(main())
