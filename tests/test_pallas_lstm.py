import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.models.musicgen.encodec import lstm_forward
from flux_generator_tpu.ops.pallas.lstm import lstm_pallas


def _params(key, d):
    ks = jax.random.split(key, 3)
    return {
        "wx": jax.random.normal(ks[0], (d, 4 * d)) * 0.3,
        "wh": jax.random.normal(ks[1], (d, 4 * d)) * 0.3,
        "bias": jax.random.normal(ks[2], (4 * d,)) * 0.1,
    }


@pytest.mark.parametrize("t", [16, 128, 200])
def test_pallas_lstm_matches_scan(t):
    d = 8
    p = _params(jax.random.PRNGKey(0), d)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, d))
    ref = lstm_forward(p, x)
    out = lstm_pallas(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
