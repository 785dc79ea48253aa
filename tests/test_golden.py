"""Golden-output regression tests: current tiny-model outputs must match the
recorded fixtures (tests/make_golden.py) — catches silent numerical drift
across refactors. The reference has no numerical tests at all (SURVEY §4)."""

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"

pytestmark = [
    pytest.mark.skipif(
        not GOLDEN.exists(), reason="golden fixtures not generated"
    ),
    # full-matrix tier: each fixture compiles a full tiny pipeline (~80 s
    # total on the 1-core CPU test machine)
    pytest.mark.slow,
]


def test_flux_golden():
    from tests.make_golden import flux_fixture

    want = np.load(GOLDEN / "flux_tiny.npz")
    got = flux_fixture()
    np.testing.assert_allclose(got["latent"], want["latent"], atol=1e-4)
    np.testing.assert_allclose(got["image"], want["image"], atol=1e-4)


def test_sd_golden():
    from tests.make_golden import sd_fixture

    want = np.load(GOLDEN / "sd_tiny.npz")
    got = sd_fixture()
    np.testing.assert_allclose(got["latent"], want["latent"], atol=1e-4)


def test_musicgen_golden():
    from tests.make_golden import musicgen_fixture

    want = np.load(GOLDEN / "musicgen_tiny.npz")
    got = musicgen_fixture()
    np.testing.assert_array_equal(got["codes"], want["codes"])
