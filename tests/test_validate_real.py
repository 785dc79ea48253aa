"""validate_real.py machinery: fingerprint diffing and the recorder's input
lockstep (the parts that must be airtight BEFORE real weights arrive)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _load(name):
    spec = importlib.util.spec_from_file_location(name, ROOT / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_compare_fingerprints_identity_and_divergence():
    vr = _load("validate_real")
    fps = {
        "family": "flux", "input": "np.default_rng(0), 8x8 latent, 16 txt tokens",
        "double_blocks_img_txt": [[[0.1, 0.5, 1.0], [0.2, 0.4, 0.9]]],
        "single_blocks": [[0.3, 0.6, 1.1]],
        "final": [0.0, 0.2, 0.5],
    }
    assert vr.compare_fingerprints(fps, fps) is None

    # within bf16 tolerance → still None
    import copy

    near = copy.deepcopy(fps)
    near["single_blocks"][0][2] *= 1.03
    assert vr.compare_fingerprints(fps, near) is None

    # a mapping bug diverges hard → named location of FIRST divergence
    far = copy.deepcopy(fps)
    far["double_blocks_img_txt"][0][1][0] = 5.0
    div = vr.compare_fingerprints(fps, far)
    assert div is not None and "double_blocks_img_txt" in div

    # input manifest mismatch is an immediate error
    other = dict(fps, input="different")
    assert "input mismatch" in vr.compare_fingerprints(fps, other)


def test_recorder_inputs_locked_to_harness():
    """record_reference_fingerprints --selfcheck equivalence, in-process."""
    rr = _load("record_reference_fingerprints")
    rr.selfcheck()


@pytest.mark.slow
def test_flux_fingerprints_shape_contract():
    """validate_real.flux_fingerprints emits the same JSON schema as
    checksum_activations / the reference recorder."""
    import jax
    import jax.numpy as jnp

    from flux_generator_tpu.pipelines.flux import FluxPipeline

    vr = _load("validate_real")
    pipe = FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)
    fps = vr.flux_fingerprints(pipe)
    d = np.asarray(fps["double_blocks_img_txt"])
    s = np.asarray(fps["single_blocks"])
    assert d.shape == (pipe.flow_cfg.depth, 2, 3)
    assert s.shape == (pipe.flow_cfg.depth_single_blocks, 3)
    assert len(fps["final"]) == 3
    # deterministic: same pipeline → identical fingerprints
    fps2 = vr.flux_fingerprints(pipe)
    assert fps == fps2
    assert vr.compare_fingerprints(fps, fps2) is None


@pytest.mark.slow
def test_validate_real_selftest_end_to_end():
    """Run the ENTIRE weights-day kit once per round (VERDICT r3 next #10):
    `validate_real.py --selftest` builds synthetic full-format checkpoint
    caches, loads them through the real io.loaders path, and checks every
    gate it would check on real weights. Keeps the rehearsal from rotting
    between rounds."""
    import pathlib
    import subprocess
    import sys

    script = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "validate_real.py"
    proc = subprocess.run(
        [sys.executable, str(script), "--selftest"],
        capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "checks passed" in proc.stdout, proc.stdout[-3000:]
    assert "FAIL" not in proc.stdout, proc.stdout[-3000:]
