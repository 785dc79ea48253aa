"""Functional dense / conv primitives over plain-dict params.

Conventions (TPU-native, not the reference's):
  - dense kernels are stored (in_features, out_features) so the hot matmul is
    a plain `x @ w` that XLA tiles straight onto the MXU. HF/torch checkpoints
    store (out, in); the io.sanitize mappers transpose at load time.
  - convs are NHWC with HWIO kernels (XLA's native TPU layout). The reference
    performs the same NCHW->NHWC conversion at load (flux/autoencoder.py:336-345).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_dense(key, in_features: int, out_features: int, bias: bool = True, dtype=jnp.float32):
    kkey, bkey = jax.random.split(key)
    scale = 1.0 / (in_features**0.5)
    p = {
        "kernel": jax.random.uniform(
            kkey, (in_features, out_features), dtype, minval=-scale, maxval=scale
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(
            bkey, (out_features,), dtype, minval=-scale, maxval=scale
        )
    return p


def materialize_kernel(p, dtype):
    """Return the (in, out) kernel in `dtype`, dequantizing if needed — for
    call sites that slice kernels directly instead of going through dense()."""
    if "kernel_q4" in p:
        from .quant import unpack_int4

        p = {**p, "kernel_q": unpack_int4(p["kernel_q4"])}
        p.pop("kernel_q4")
    if "kernel_q" in p:
        q = p["kernel_q"]
        scale = p["kernel_scale"]
        if scale.ndim == q.ndim:  # grouped (…, g, out)
            g = scale.shape[-2]
            gs = q.shape[-2] // g
            return (
                q.reshape(*q.shape[:-2], g, gs, q.shape[-1]).astype(dtype)
                * scale[..., :, None, :].astype(dtype)
            ).reshape(q.shape)
        return q.astype(dtype) * scale.astype(dtype)[..., None, :]
    return p["kernel"].astype(dtype)


_W8A8_STATE: dict = {"enabled": None}


def set_w8a8(enabled) -> None:
    """Explicitly resolve the W8A8 int8-activation matmul path. Call BEFORE
    building/compiling pipelines — the flag is baked into traced programs, so
    flipping it later (or changing FGT_W8A8 in a live server) has no effect
    on already-compiled executables (ADVICE r1). None = re-read the env var
    on next use."""
    _W8A8_STATE["enabled"] = enabled


def w8a8_enabled() -> bool:
    if _W8A8_STATE["enabled"] is None:
        import os

        _W8A8_STATE["enabled"] = os.environ.get("FGT_W8A8", "0") == "1"
    return _W8A8_STATE["enabled"]


_w8a8_enabled = w8a8_enabled  # back-compat alias


def _dequant(q, scale, dtype):
    """int weights + per-channel (…, out) or per-input-group (…, g, out)
    scales → dtype kernel."""
    if scale.ndim == q.ndim:  # grouped
        g = scale.shape[-2]
        gs = q.shape[-2] // g
        return (
            q.reshape(*q.shape[:-2], g, gs, q.shape[-1]).astype(dtype)
            * scale[..., :, None, :].astype(dtype)
        ).reshape(q.shape)
    return q.astype(dtype) * scale.astype(dtype)[..., None, :]


def dense(p, x):
    if "kernel_q4" in p:
        q4 = p["kernel_q4"]
        scale = p["kernel_scale"]
        if q4.ndim == 2:
            # Pallas path: nibble unpack + dequant INSIDE the matmul kernel
            # (ops/pallas/int4_matmul.py) — beats the XLA elementwise-unpack
            # formulation on TPU (the int4 extraction never fuses as well as
            # the hardware int8 convert).
            from ..runtime.config import use_pallas_int4

            if use_pallas_int4():
                from .pallas.int4_matmul import int4_matmul, supported

                if supported(x.shape[-1], scale):
                    y = int4_matmul(x, q4, scale)
                    if "lora_a" in p:
                        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
                    if "bias" in p:
                        y = y + p["bias"].astype(x.dtype)
                    return y
        # XLA fallback — nibble-packed int4, SPLIT layout (ops/quant.pack_int4):
        # run two matmuls over the input halves. The nibble extraction +
        # dequant fuse into each matmul's operand read; an interleave-unpack
        # would force XLA to materialize the full bf16 kernel (9x slower in
        # the HBM-bound AR loop).
        half = q4.shape[-2]
        lo = (q4 & 0xF).astype(jnp.int8) - 8
        hi = (q4 >> 4).astype(jnp.int8) - 8
        if scale.ndim == q4.ndim:  # grouped: first g/2 groups = low half
            g2 = scale.shape[-2] // 2
            s_lo, s_hi = scale[..., :g2, :], scale[..., g2:, :]
        else:
            s_lo = s_hi = scale
        y = (
            x[..., :half] @ _dequant(lo, s_lo, x.dtype)
            + x[..., half:] @ _dequant(hi, s_hi, x.dtype)
        )
        if "lora_a" in p:
            y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    if "kernel_q" in p:
        grouped = p["kernel_scale"].ndim == p["kernel_q"].ndim  # (…, g, out)
        if grouped:
            # per-group dequant: (…, g, G, out) * (…, g, 1, out)
            q = p["kernel_q"]
            g = p["kernel_scale"].shape[-2]
            gs = q.shape[-2] // g
            w = (
                q.reshape(*q.shape[:-2], g, gs, q.shape[-1]).astype(x.dtype)
                * p["kernel_scale"][..., :, None, :].astype(x.dtype)
            ).reshape(q.shape)
            y = x @ w
        elif _w8a8_enabled() and p["kernel_q"].dtype == jnp.int8:
            # full int8 MXU path (~1.6x bf16 on v5e): per-token activation
            # scales x per-out-channel weight scales. Three formulations of
            # the activation quant (FGT_W8A8_IMPL, measured by
            # scripts/prof_w8a8.py):
            #   xla    — amax + round + dot as discrete XLA ops. DEFAULT:
            #            in the full denoise program XLA overlaps the quant
            #            passes with MXU work, so the Pallas variants win
            #            only standalone; xla is proven at every geometry.
            #   pq     — one-pass Pallas row-quantizer feeding the XLA int8
            #            dot (standalone winner; at >=4k-token geometries
            #            XLA VMEM-places its int8 output inside the loop
            #            and compile OOMs)
            #   pallas — fully fused matmul (quant + int8 dots + dequant in
            #            one pallas_call; loses in-program)
            y = None
            m_rows = x.size // x.shape[-1]
            if p["kernel_q"].ndim == 2 and m_rows >= 16:
                from ..runtime.config import w8a8_impl

                impl = w8a8_impl()
                if impl == "pallas":
                    from .pallas.w8a8_matmul import supported, w8a8_matmul

                    if supported(x.shape[-1], p["kernel_scale"]):
                        y = w8a8_matmul(x, p["kernel_q"], p["kernel_scale"])
                elif impl == "pq":
                    from .pallas.w8a8_matmul import quantize_rows

                    x_q, sx = quantize_rows(x)
                    acc = jax.lax.dot_general(
                        x_q, p["kernel_q"],
                        (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    y = (acc.astype(x.dtype) * sx.astype(x.dtype)
                         * p["kernel_scale"].astype(x.dtype))
            if y is None:
                sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
                sx = jnp.maximum(sx, 1e-8)
                x_q = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    x_q, p["kernel_q"],
                    (((x.ndim - 1,), (p["kernel_q"].ndim - 2,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(x.dtype) * sx.astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
        else:
            # weight-only int8/int4: dequantize into the compute dtype
            w = p["kernel_q"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)[..., None, :]
            y = x @ w
    else:
        y = x @ p["kernel"].astype(x.dtype)
    if "lora_a" in p:
        # LoRA low-rank update (flux/lora.py semantics, scale=1):
        # y += (x @ A) @ B. Kept separate so XLA fuses the small matmuls.
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def init_conv2d(key, in_ch: int, out_ch: int, kernel_size, bias: bool = True, dtype=jnp.float32):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kkey, bkey = jax.random.split(key)
    fan_in = in_ch * kernel_size[0] * kernel_size[1]
    scale = 1.0 / (fan_in**0.5)
    p = {
        "kernel": jax.random.uniform(
            kkey, (*kernel_size, in_ch, out_ch), dtype, minval=-scale, maxval=scale
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(bkey, (out_ch,), dtype, minval=-scale, maxval=scale)
    return p


def conv2d(p, x, stride=1, padding=0):
    """x: (B, H, W, C); kernel: (kh, kw, in, out)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv1d(p, x, stride=1, padding=0, groups=1):
    """x: (B, T, C); kernel: (k, in/groups, out)."""
    if isinstance(padding, int):
        padding = ((padding, padding),)
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = (padding,)
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose1d(p, x, stride=1):
    """Transposed 1-D conv (EnCodec upsampling). x: (B, T, C); kernel (k, out, in)
    stored as (k, in, out) with lhs-dilation trick."""
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(1,),
        padding=[(p["kernel"].shape[0] - 1, p["kernel"].shape[0] - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y
