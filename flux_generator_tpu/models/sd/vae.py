"""SD VAE (4-latent-channel) — functional JAX/NHWC.

Parity with stable_diffusion/stable_diffusion/vae.py: EncoderDecoderBlock2D
resnet stacks, single-head mid attention, quant/post_quant 1x1-as-linear
projections, scaling factor folded into encode/decode exactly as the
reference does (vae.py:249-274).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ...ops.linear import conv2d, dense, init_conv2d, init_dense
from ...ops.norms import group_norm
from .config import AutoencoderConfig
from .unet import _init_gn, _init_resnet, _resnet, _upsample_nearest


def _init_attn(key, dims, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": _init_gn(dims, dtype),
        "q": init_dense(ks[0], dims, dims, dtype=dtype),
        "k": init_dense(ks[1], dims, dims, dtype=dtype),
        "v": init_dense(ks[2], dims, dims, dtype=dtype),
        "o": init_dense(ks[3], dims, dims, dtype=dtype),
    }


def _attn(p, x, groups):
    b, h, w, c = x.shape
    y = group_norm(x, p["group_norm"], groups)
    y = y.reshape(b, h * w, c)
    q = dense(p["q"], y)[:, :, None, :]
    k = dense(p["k"], y)[:, :, None, :]
    v = dense(p["v"], y)[:, :, None, :]
    y = dot_product_attention(q, k, v).reshape(b, h * w, c)
    return x + dense(p["o"], y).reshape(b, h, w, c)


def _init_block(key, cin, cout, num_layers, down, up, dtype):
    ks = jax.random.split(key, num_layers + 1)
    p = {
        "resnets": [
            _init_resnet(ks[i], cin if i == 0 else cout, cout, None, dtype)
            for i in range(num_layers)
        ]
    }
    if down:
        p["downsample"] = init_conv2d(ks[-1], cout, cout, 3, dtype=dtype)
    if up:
        p["upsample"] = init_conv2d(ks[-1], cout, cout, 3, dtype=dtype)
    return p


def _block(p, x, groups):
    for res in p["resnets"]:
        x = _resnet(res, x, None, groups)
    if "downsample" in p:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = conv2d(p["downsample"], x, stride=2, padding=0)
    if "upsample" in p:
        x = conv2d(p["upsample"], _upsample_nearest(x), padding=1)
    return x


def init_sd_vae(key, cfg: AutoencoderConfig, dtype=jnp.float32):
    boc = list(cfg.block_out_channels)
    n = len(boc)
    ks = iter(jax.random.split(key, 2 * n + 12))
    g = cfg.norm_num_groups

    # encoder
    enc = {"conv_in": init_conv2d(next(ks), cfg.in_channels, boc[0], 3, dtype=dtype)}
    chans = [boc[0]] + boc
    enc["down_blocks"] = [
        _init_block(next(ks), ic, oc, cfg.layers_per_block, i < n - 1, False, dtype)
        for i, (ic, oc) in enumerate(zip(chans, chans[1:]))
    ]
    enc["mid_blocks"] = [
        _init_resnet(next(ks), boc[-1], boc[-1], None, dtype),
        _init_attn(next(ks), boc[-1], dtype),
        _init_resnet(next(ks), boc[-1], boc[-1], None, dtype),
    ]
    enc["conv_norm_out"] = _init_gn(boc[-1], dtype)
    enc["conv_out"] = init_conv2d(next(ks), boc[-1], cfg.latent_channels_out, 3, dtype=dtype)

    # decoder (layers_per_block + 1, reference vae.py:345)
    dec = {"conv_in": init_conv2d(next(ks), cfg.latent_channels_in, boc[-1], 3, dtype=dtype)}
    dec["mid_blocks"] = [
        _init_resnet(next(ks), boc[-1], boc[-1], None, dtype),
        _init_attn(next(ks), boc[-1], dtype),
        _init_resnet(next(ks), boc[-1], boc[-1], None, dtype),
    ]
    rev = list(reversed(boc))
    chans = [rev[0]] + rev
    dec["up_blocks"] = [
        _init_block(next(ks), ic, oc, cfg.layers_per_block + 1, False, i < n - 1, dtype)
        for i, (ic, oc) in enumerate(zip(chans, chans[1:]))
    ]
    dec["conv_norm_out"] = _init_gn(boc[0], dtype)
    dec["conv_out"] = init_conv2d(next(ks), boc[0], cfg.out_channels, 3, dtype=dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_proj": init_dense(next(ks), cfg.latent_channels_out, cfg.latent_channels_out, dtype=dtype),
        "post_quant_proj": init_dense(next(ks), cfg.latent_channels_in, cfg.latent_channels_in, dtype=dtype),
    }


def sd_vae_encode(params, cfg: AutoencoderConfig, x):
    """Image (B,H,W,3) → (mean, logvar), scaling folded in (vae.py:258-267)."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x, padding=1)
    for blk in enc["down_blocks"]:
        h = _block(blk, h, g)
    h = _resnet(enc["mid_blocks"][0], h, None, g)
    h = _attn(enc["mid_blocks"][1], h, g)
    h = _resnet(enc["mid_blocks"][2], h, None, g)
    h = jax.nn.silu(group_norm(h, enc["conv_norm_out"], g))
    h = conv2d(enc["conv_out"], h, padding=1)
    h = dense(params["quant_proj"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    mean = mean * cfg.scaling_factor
    logvar = logvar + 2 * math.log(cfg.scaling_factor)
    return mean, logvar


def sd_vae_decode(params, cfg: AutoencoderConfig, z):
    g = cfg.norm_num_groups
    z = z / cfg.scaling_factor
    dec = params["decoder"]
    h = conv2d(dec["conv_in"], dense(params["post_quant_proj"], z), padding=1)
    h = _resnet(dec["mid_blocks"][0], h, None, g)
    h = _attn(dec["mid_blocks"][1], h, g)
    h = _resnet(dec["mid_blocks"][2], h, None, g)
    for blk in dec["up_blocks"]:
        h = _block(blk, h, g)
    h = jax.nn.silu(group_norm(h, dec["conv_norm_out"], g))
    return conv2d(dec["conv_out"], h, padding=1)
