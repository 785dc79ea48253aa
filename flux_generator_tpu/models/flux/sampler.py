"""Rectified-flow (flow-matching) sampler as pure functions.

Behavior parity with flux/sampler.py:9-57 (linear 1→0 schedule, dev-model
resolution-dependent sigmoid time shift, Euler step x + (t_prev - t)·pred,
linear-interpolation noising). The reference caches schedules with lru_cache
on a method (holding self); here schedules are computed with numpy at trace
time and baked into the jitted sampler as constants.
"""

from __future__ import annotations

import math

import jax
import numpy as np


def time_shift(image_seq_len: float, t, base_shift: float = 0.5, max_shift: float = 1.15):
    """Dev-model sigmoid schedule shift, parameterized on sequence length
    256→4096 (flux/sampler.py:15-20)."""
    x1, x2 = 256.0, 4096.0
    mu = (image_seq_len - x1) * (max_shift - base_shift) / (x2 - x1) + base_shift
    exp_mu = math.exp(mu)
    return exp_mu / (exp_mu + (1.0 / t - 1.0))


def flux_timesteps(
    num_steps: int,
    image_seq_len: int,
    schnell: bool = True,
    start: float = 1.0,
    stop: float = 0.0,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> np.ndarray:
    t = np.linspace(start, stop, num_steps + 1)
    if not schnell:
        with np.errstate(divide="ignore"):
            t = time_shift(image_seq_len, t, base_shift, max_shift)
        t = np.nan_to_num(t, nan=0.0)  # t=0 endpoint
    return t


def flux_step(pred, x_t, t: float, t_prev: float):
    """Euler step of the probability-flow ODE (flux/sampler.py:56-57)."""
    return x_t + (t_prev - t) * pred


def sample_prior(key, shape, dtype):
    return jax.random.normal(key, shape, dtype)


def add_noise(x, t, noise):
    """Linear interpolation x·(1-t) + t·noise (flux/sampler.py:47-54)."""
    t = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    return x * (1 - t) + t * noise


def random_timesteps(key, batch: int, image_seq_len: int, schnell: bool = True):
    """Training timesteps: schnell draws from {1/4..4/4}; dev draws uniform
    then applies the resolution shift (flux/sampler.py:33-42)."""
    if schnell:
        t = jax.random.randint(key, (batch,), 1, 5).astype(np.float32) / 4
    else:
        t = jax.random.uniform(key, (batch,))
        x1, x2 = 256.0, 4096.0
        mu = (image_seq_len - x1) * (1.15 - 0.5) / (x2 - x1) + 0.5
        exp_mu = math.exp(mu)
        t = exp_mu / (exp_mu + (1.0 / t - 1.0))
    return t
