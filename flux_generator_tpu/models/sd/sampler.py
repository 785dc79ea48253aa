"""DDPM-family Euler samplers (parity: stable_diffusion/.../sampler.py).

Pure functions over a precomputed sigma table. The reference keeps x_t in
"scaled space" ((sigma²+1)^-1/2 · x); steps here reproduce that exactly, so
loaded SD checkpoints denoise identically. Ancestral variant threads a JAX
PRNG key instead of mutating global random state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiffusionConfig


def make_sigmas(cfg: DiffusionConfig) -> np.ndarray:
    """sigma table, index 0 = 0 (clean), index N = max noise."""
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_steps)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_steps)
            ** 2
        )
    else:
        raise NotImplementedError(cfg.beta_schedule)
    alphas_cumprod = np.cumprod(1 - betas)
    return np.concatenate(
        [np.zeros(1), np.sqrt((1 - alphas_cumprod) / alphas_cumprod)]
    ).astype(np.float32)


def interp_sigma(sigmas, t):
    """Linear interpolation of the sigma table at continuous time t."""
    sigmas = jnp.asarray(sigmas)
    t = jnp.asarray(t, jnp.float32)
    lo = jnp.clip(t.astype(jnp.int32), 0, len(sigmas) - 1)
    hi = jnp.minimum(lo + 1, len(sigmas) - 1)
    frac = t - lo
    return sigmas[lo] * (1 - frac) + frac * sigmas[hi]


def max_time(sigmas) -> int:
    return len(sigmas) - 1


def timesteps(sigmas, num_steps: int, start_time=None) -> np.ndarray:
    start = float(start_time if start_time is not None else len(sigmas) - 1)
    assert 0 < start <= len(sigmas) - 1
    return np.linspace(start, 0, num_steps + 1).astype(np.float32)


def sample_prior(key, sigmas, shape, dtype):
    noise = jax.random.normal(key, shape)
    s_max = sigmas[-1]
    return (noise * s_max / np.sqrt(s_max**2 + 1)).astype(dtype)


def add_noise(key, sigmas, x, t):
    noise = jax.random.normal(key, x.shape, x.dtype)
    s = interp_sigma(sigmas, t).astype(x.dtype)
    return (x + noise * s) * jax.lax.rsqrt(s * s + 1)


def euler_step(sigmas, eps_pred, x_t, t, t_prev):
    sigma = interp_sigma(sigmas, t).astype(eps_pred.dtype)
    sigma_prev = interp_sigma(sigmas, t_prev).astype(eps_pred.dtype)
    dt = sigma_prev - sigma
    x = jnp.sqrt(sigma**2 + 1) * x_t + eps_pred * dt
    return x * jax.lax.rsqrt(sigma_prev**2 + 1)


def euler_ancestral_step(key, sigmas, eps_pred, x_t, t, t_prev):
    sigma = interp_sigma(sigmas, t).astype(eps_pred.dtype)
    sigma_prev = interp_sigma(sigmas, t_prev).astype(eps_pred.dtype)
    sigma2, sigma_prev2 = sigma**2, sigma_prev**2
    sigma_up = jnp.sqrt(sigma_prev2 * (sigma2 - sigma_prev2) / sigma2)
    sigma_down = jnp.sqrt(sigma_prev2 - sigma_up**2)
    dt = sigma_down - sigma
    x = jnp.sqrt(sigma2 + 1) * x_t + eps_pred * dt
    x = x + jax.random.normal(key, x.shape, x.dtype) * sigma_up
    return x * jax.lax.rsqrt(sigma_prev2 + 1)
