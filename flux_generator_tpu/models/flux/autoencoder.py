"""Flux VAE (16-latent-channel conv autoencoder) — functional JAX/NHWC.

Parity with flux/autoencoder.py: ResnetBlocks (GroupNorm32 + SiLU + 3x3 conv,
linear nin_shortcut on channel change), single-head mid AttnBlock, asymmetric
(0,1) pad stride-2 downsample, nearest 2x upsample, DiagonalGaussian
reparameterization, scale/shift factors applied in encode/decode
(flux/autoencoder.py:347-354). Convs are NHWC/HWIO — XLA's native TPU layout.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ...ops.linear import conv2d, dense, init_conv2d, init_dense
from ...ops.norms import group_norm


@dataclasses.dataclass(frozen=True)
class AutoEncoderConfig:
    resolution: int = 256
    in_channels: int = 3
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159


def tiny_ae_config(**overrides) -> AutoEncoderConfig:
    base = dict(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
    base.update(overrides)
    return AutoEncoderConfig(**base)


# ---------------------------------------------------------------- init


def _init_gn(ch, dtype):
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_gn(cin, dtype),
        "conv1": init_conv2d(ks[0], cin, cout, 3, dtype=dtype),
        "norm2": _init_gn(cout, dtype),
        "conv2": init_conv2d(ks[1], cout, cout, 3, dtype=dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = init_dense(ks[2], cin, cout, dtype=dtype)
    return p


def _init_attn(key, ch, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_gn(ch, dtype),
        "q": init_dense(ks[0], ch, ch, dtype=dtype),
        "k": init_dense(ks[1], ch, ch, dtype=dtype),
        "v": init_dense(ks[2], ch, ch, dtype=dtype),
        "proj_out": init_dense(ks[3], ch, ch, dtype=dtype),
    }


def init_encoder(key, cfg: AutoEncoderConfig, dtype=jnp.float32):
    nres = len(cfg.ch_mult)
    keys = iter(jax.random.split(key, 4 + nres * (cfg.num_res_blocks + 1) + 3))
    p = {"conv_in": init_conv2d(next(keys), cfg.in_channels, cfg.ch, 3, dtype=dtype)}
    in_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    block_in = cfg.ch
    for i in range(nres):
        block_in = cfg.ch * in_mult[i]
        block_out = cfg.ch * cfg.ch_mult[i]
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_init_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        lvl = {"block": blocks}
        if i != nres - 1:
            lvl["downsample"] = init_conv2d(next(keys), block_in, block_in, 3, dtype=dtype)
        down.append(lvl)
    p["down"] = down
    p["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
        "attn_1": _init_attn(next(keys), block_in, dtype),
        "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
    }
    p["norm_out"] = _init_gn(block_in, dtype)
    p["conv_out"] = init_conv2d(next(keys), block_in, 2 * cfg.z_channels, 3, dtype=dtype)
    return p


def init_decoder(key, cfg: AutoEncoderConfig, dtype=jnp.float32):
    nres = len(cfg.ch_mult)
    keys = iter(jax.random.split(key, 4 + nres * (cfg.num_res_blocks + 2) + 3))
    block_in = cfg.ch * cfg.ch_mult[nres - 1]
    p = {"conv_in": init_conv2d(next(keys), cfg.z_channels, block_in, 3, dtype=dtype)}
    p["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
        "attn_1": _init_attn(next(keys), block_in, dtype),
        "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
    }
    up = [None] * nres
    for i in reversed(range(nres)):
        block_out = cfg.ch * cfg.ch_mult[i]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_init_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        lvl = {"block": blocks}
        if i != 0:
            lvl["upsample"] = init_conv2d(next(keys), block_in, block_in, 3, dtype=dtype)
        up[i] = lvl
    p["up"] = up
    p["norm_out"] = _init_gn(block_in, dtype)
    p["conv_out"] = init_conv2d(next(keys), block_in, cfg.out_ch, 3, dtype=dtype)
    return p


def init_autoencoder(key, cfg: AutoEncoderConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"encoder": init_encoder(k1, cfg, dtype), "decoder": init_decoder(k2, cfg, dtype)}


# ---------------------------------------------------------------- forward


def _resnet(p, x):
    h = jax.nn.silu(group_norm(x, p["norm1"], 32 if x.shape[-1] >= 32 else x.shape[-1], eps=1e-6))
    h = conv2d(p["conv1"], h, padding=1)
    h = jax.nn.silu(group_norm(h, p["norm2"], 32 if h.shape[-1] >= 32 else h.shape[-1], eps=1e-6))
    h = conv2d(p["conv2"], h, padding=1)
    if "nin_shortcut" in p:
        x = dense(p["nin_shortcut"], x)
    return x + h


def _attn_block(p, x):
    b, hh, ww, c = x.shape
    y = x.reshape(b, hh * ww, c)
    y = group_norm(y, p["norm"], 32 if c >= 32 else c, eps=1e-6)
    q = dense(p["q"], y)[:, :, None, :]
    k = dense(p["k"], y)[:, :, None, :]
    v = dense(p["v"], y)[:, :, None, :]
    y = dot_product_attention(q, k, v).reshape(b, hh * ww, c)
    y = dense(p["proj_out"], y)
    return x + y.reshape(b, hh, ww, c)


def encoder_forward(p, cfg: AutoEncoderConfig, x):
    h = conv2d(p["conv_in"], x, padding=1)
    for i, lvl in enumerate(p["down"]):
        for blk in lvl["block"]:
            h = _resnet(blk, h)
        if "downsample" in lvl:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(lvl["downsample"], h, stride=2, padding=0)
    h = _resnet(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet(p["mid"]["block_2"], h)
    h = jax.nn.silu(group_norm(h, p["norm_out"], 32 if h.shape[-1] >= 32 else h.shape[-1], eps=1e-6))
    return conv2d(p["conv_out"], h, padding=1)


def decoder_forward(p, cfg: AutoEncoderConfig, z):
    h = conv2d(p["conv_in"], z, padding=1)
    h = _resnet(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet(p["mid"]["block_2"], h)
    for i in reversed(range(len(p["up"]))):
        lvl = p["up"][i]
        for blk in lvl["block"]:
            h = _resnet(blk, h)
        if "upsample" in lvl:
            b, hh, ww, c = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv2d(lvl["upsample"], h, padding=1)
    h = jax.nn.silu(group_norm(h, p["norm_out"], 32 if h.shape[-1] >= 32 else h.shape[-1], eps=1e-6))
    return conv2d(p["conv_out"], h, padding=1)


def encode(params, cfg: AutoEncoderConfig, x, key=None):
    """Image (B,H,W,3) → latent (B,H/8,W/8,z). Deterministic (mean) unless a
    PRNG key is given for the reparameterized sample."""
    moments = encoder_forward(params["encoder"], cfg, x)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    z = mean
    if key is not None:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
    return cfg.scale_factor * (z - cfg.shift_factor)


def decode(params, cfg: AutoEncoderConfig, z):
    z = z / cfg.scale_factor + cfg.shift_factor
    return decoder_forward(params["decoder"], cfg, z)


def decode_tiled(params, cfg: AutoEncoderConfig, z, tile: int = 96,
                 overlap: int = 16):
    """Decode a large latent in overlapping tiles with linear cross-fade.

    The full-image decode holds (B, 8H, 8W, ch) conv activations — at 2048²
    that is >1 GB per tensor and the program OOMs next to the 12 GB int8
    flow. ops/tiling.tiled_decode_2d bounds the footprint to one tile."""
    from ...ops.tiling import tiled_decode_2d

    return tiled_decode_2d(
        lambda zt: decode(params, cfg, zt), z, tile, overlap,
        factor=2 ** (len(cfg.ch_mult) - 1),
    )
