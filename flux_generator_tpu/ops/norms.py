"""Normalization ops. Statistics accumulate in float32 regardless of the
activation dtype (TPU bf16 policy), then cast back."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, p=None, eps: float = 1e-5):
    """LayerNorm over the last axis. p may hold optional 'scale'/'bias'."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y.astype(x.dtype)
    if p is not None:
        if "scale" in p:
            y = y * p["scale"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
    return y


def rms_norm(x, p=None, eps: float = 1e-6, upcast_output: bool = False):
    """RMSNorm over the last axis (T5/QKNorm style: no mean subtraction)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(ms + eps))
    if not upcast_output:
        y = y.astype(x.dtype)
    if p is not None and "scale" in p:
        y = y * p["scale"].astype(y.dtype)
    return y.astype(x.dtype)


def group_norm(x, p=None, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over channel-last activations (B, ..., C).

    Statistics via E[x²] − E[x]² so BOTH reductions read the input in ONE
    fused pass (jnp.var re-derives the mean — a second full pass; measured
    35% of an SD UNet step at 256², scripts/prof_sd_unet.py). The one-pass
    formula cancels catastrophically when |mean| ≫ std, so the input is
    first centered on a per-group shift (the group's first element — a
    constant w.r.t. the reduction, so var is analytically unchanged and the
    subtract fuses into the same read): cancellation is then relative to
    the group's internal spread, not its absolute magnitude."""
    orig_shape = x.shape
    c = orig_shape[-1]
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    xf = x.astype(jnp.float32).reshape(orig_shape[0], -1, groups, c // groups)
    # cheap mean proxy; stop_gradient keeps the backward graph identical to
    # the unshifted form (var/mean grads are shift-invariant)
    shift = jax.lax.stop_gradient(xf[:, :1, :, :1])
    xs = xf - shift
    mean_s = xs.mean(axis=(1, 3), keepdims=True)
    m2_s = (xs * xs).mean(axis=(1, 3), keepdims=True)
    var = jnp.maximum(m2_s - mean_s * mean_s, 0.0)
    # normalize in the shifted frame: (xf − mean) ≡ (xs − mean_s) exactly,
    # and the small-number form never reconstructs the large mean in f32
    y = (xs - mean_s) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y.reshape(orig_shape).astype(x.dtype)
    if p is not None:
        if "scale" in p:
            y = y * p["scale"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
    return y
