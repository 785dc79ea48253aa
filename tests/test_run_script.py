"""Launcher script checks (parity: test/test_run_script.sh in the reference,
which greps run_flux.sh's help/unknown-option/env handling)."""

import subprocess
from pathlib import Path

SCRIPT = Path(__file__).resolve().parents[1] / "run_flux.sh"


def _run(*args):
    return subprocess.run(
        ["bash", str(SCRIPT), *args], capture_output=True, text=True, timeout=60
    )


def test_help_exits_zero_and_documents_flags():
    r = _run("--help")
    assert r.returncode == 0
    out = r.stdout + r.stderr
    assert "--help" in out
    assert "usage" in out.lower() or "Usage" in out


def test_unknown_option_exits_nonzero():
    r = _run("--definitely-not-a-flag")
    assert r.returncode == 1
    assert "Unknown option" in (r.stdout + r.stderr)


def test_script_is_bash_clean():
    r = subprocess.run(
        ["bash", "-n", str(SCRIPT)], capture_output=True, text=True, timeout=60
    )
    assert r.returncode == 0, r.stderr
