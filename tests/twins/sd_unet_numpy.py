"""Independent float64 numpy derivation of the SD/SDXL UNet forward,
ported line-by-line from the reference's own MLX code
(/root/reference/stable_diffusion/stable_diffusion/unet.py:403-460 and the
blocks above it) — NOT from our JAX implementation. Together with the
torch twin (tests/test_hf_parity_sd.py) this triangulates the UNet math
from two unrelated sources (VERDICT r2 #7).

Consumes OUR param tree (models/sd/unet.py init_unet) so the same weights
drive both forwards; every equation here is transcribed from the MLX
reference, with these reference-semantics notes:

- timesteps / add_time_proj: mlx nn.SinusoidalPositionalEncoding with
  max_freq=1, min_freq=exp(-ln 1e4 + 2 ln 1e4 / D), scale=1, cos_first
  (unet.py:283-309) — implemented below via that exact parametrization
  (it algebraically reduces to sigmas_i = 10000^(-2i/D), cos|sin halves).
- GroupNorm: mlx pytorch_compatible=True (contiguous channel groups,
  stats over spatial x C/g), default eps=1e-5 everywhere in the reference
  (unet.py:98,139,145,391). Our Transformer2D norm uses the diffusers
  native eps=1e-6 (models/sd/unet.py:214-219) — `t2d_gn_eps` exposes the
  reference value as the default so the test can both match ours (1e-6)
  and bound the documented divergence.
- Attention: mlx nn.MultiHeadAttention — q/k/v projections bias-free,
  out-proj with bias (unet.py:46-54), queries scaled by 1/sqrt(head_dim).
- FFN: GEGLU, exact (erf) gelu — y = linear1(y) * gelu(linear2(y)) then
  linear3 (unet.py:73-78).
- Resnet shortcut is a Linear over channels (unet.py:150-151,168).
- Upsample: nearest x2 then 3x3 conv (unet.py:12-17,263-265); downsample
  stride-2 3x3 conv (unet.py:226-229).
- Skip wiring: down blocks seed residuals=[conv_in(x)] then extend with
  every per-layer output incl. the downsample output; up blocks pop()
  from the tail before each resnet (unet.py:244-267,428-453).
"""

from __future__ import annotations

import math

import numpy as np

_erf = np.vectorize(math.erf)


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def _np(tree):
    """Leaf-wise convert a (possibly jax) param tree to float64 numpy."""
    if isinstance(tree, dict):
        return {k: _np(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_np(v) for v in tree]
    return np.asarray(tree, dtype=np.float64)


def _dense(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv2d(p, x, stride=1, padding=0):
    kh, kw, _, cout = p["kernel"].shape
    if padding:
        x = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    b, hh, ww, _ = x.shape
    oh = (hh - kh) // stride + 1
    ow = (ww - kw) // stride + 1
    y = np.zeros((b, oh, ow, cout))
    for i in range(kh):
        for j in range(kw):
            win = x[:, i : i + oh * stride : stride, j : j + ow * stride : stride]
            y = y + np.einsum("bhwc,cd->bhwd", win, p["kernel"][i, j])
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(p, x, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - m) / np.sqrt(v + eps) * p["scale"] + p["bias"]


def _group_norm(p, x, groups, eps=1e-5):
    b, h, w, c = x.shape
    g = x.reshape(b, h * w, groups, c // groups).transpose(0, 2, 1, 3)
    g = g.reshape(b, groups, -1)
    m = g.mean(-1, keepdims=True)
    v = g.var(-1, keepdims=True)
    g = (g - m) / np.sqrt(v + eps)
    g = g.reshape(b, groups, h * w, c // groups).transpose(0, 2, 1, 3)
    return g.reshape(b, h, w, c) * p["scale"] + p["bias"]


def sinusoidal_encoding(t, dims):
    """mlx nn.SinusoidalPositionalEncoding at the reference's settings
    (unet.py:283-292): cos_first, scale=1, full_turns=False."""
    half = dims // 2
    log_min = -math.log(10000.0) + 2.0 * math.log(10000.0) / dims
    one_zero = 1.0 - np.arange(half) / (half - 1)
    sigmas = np.exp(one_zero * (0.0 - log_min) + log_min)  # log(max_freq)=0
    y = np.asarray(t, np.float64)[..., None] * sigmas
    return np.concatenate([np.cos(y), np.sin(y)], axis=-1)


def _attention(p, x, memory, num_heads):
    b, l, d = x.shape
    s = memory.shape[1]
    hd = d // num_heads
    q = _dense(p["q"], x).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    k = _dense(p["k"], memory).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    v = _dense(p["v"], memory).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    scores = (q / math.sqrt(hd)) @ k.transpose(0, 1, 3, 2)
    scores = scores - scores.max(-1, keepdims=True)
    w = np.exp(scores)
    w = w / w.sum(-1, keepdims=True)
    out = (w @ v).transpose(0, 2, 1, 3).reshape(b, l, d)
    return _dense(p["o"], out)


def _transformer_block(p, x, memory, num_heads):
    y = _layer_norm(p["norm1"], x)
    x = x + _attention(p["attn1"], y, y, num_heads)
    y = _layer_norm(p["norm2"], x)
    x = x + _attention(p["attn2"], y, memory, num_heads)
    y = _layer_norm(p["norm3"], x)
    y = _dense(p["linear1"], y) * _gelu(_dense(p["linear2"], y))
    return x + _dense(p["linear3"], y)


def _transformer2d(p, x, memory, num_heads, groups, gn_eps):
    b, h, w, c = x.shape
    y = _group_norm(p["norm"], x, groups, eps=gn_eps).reshape(b, h * w, c)
    y = _dense(p["proj_in"], y)
    n_blocks = p["blocks"]["norm1"]["scale"].shape[0]
    for j in range(n_blocks):
        y = _transformer_block(_nested_index(p["blocks"], j), y, memory, num_heads)
    y = _dense(p["proj_out"], y)
    return x + y.reshape(b, h, w, c)


def _nested_index(tree, j):
    """Index the leading (stacked) axis of every leaf — the blocks are
    vmap-stacked in our param tree (models/sd/unet.py:71-73)."""
    if isinstance(tree, dict):
        return {k: _nested_index(v, j) for k, v in tree.items()}
    return tree[j]


def _resnet(p, x, temb, groups):
    y = _silu(_group_norm(p["norm1"], x, groups))
    y = _conv2d(p["conv1"], y, padding=1)
    if temb is not None and "time_emb_proj" in p:
        y = y + _dense(p["time_emb_proj"], _silu(temb))[:, None, None, :]
    y = _silu(_group_norm(p["norm2"], y, groups))
    y = _conv2d(p["conv2"], y, padding=1)
    if "conv_shortcut" in p:
        x = _dense(p["conv_shortcut"], x)
    return x + y


def _unet_block(p, cfg, i, x, memory, temb, residuals, gn_eps):
    outputs = []
    for j, res in enumerate(p["resnets"]):
        if residuals is not None:
            x = np.concatenate([x, residuals.pop()], axis=-1)
        x = _resnet(res, x, temb, cfg.norm_num_groups)
        if "attentions" in p:
            x = _transformer2d(
                p["attentions"][j], x, memory, cfg.num_attention_heads[i],
                cfg.norm_num_groups, gn_eps,
            )
        outputs.append(x)
    if "downsample" in p:
        x = _conv2d(p["downsample"], x, stride=2, padding=1)
        outputs.append(x)
    if "upsample" in p:
        up = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
        x = _conv2d(p["upsample"], up, padding=1)
        outputs.append(x)
    return x, outputs


def unet_forward_numpy(params, cfg, x, timestep, encoder_x, text_time=None,
                       t2d_gn_eps=1e-5):
    """Reference unet.py:403-460 in float64 numpy over our param tree.
    t2d_gn_eps: GroupNorm eps inside Transformer2D — the reference uses the
    mlx default 1e-5; our JAX forward uses the diffusers-native 1e-6."""
    params = _np(params)
    x = np.asarray(x, np.float64)
    encoder_x = np.asarray(encoder_x, np.float64)

    temb = sinusoidal_encoding(np.asarray(timestep, np.float64),
                               cfg.block_out_channels[0])
    te = params["time_embedding"]
    temb = _dense(te["linear_2"], _silu(_dense(te["linear_1"], temb)))

    if text_time is not None:
        text_emb, time_ids = text_time
        add = sinusoidal_encoding(
            np.asarray(time_ids, np.float64).reshape(-1),
            cfg.addition_time_embed_dim,
        ).reshape(np.asarray(time_ids).shape[0], -1)
        add = np.concatenate([np.asarray(text_emb, np.float64), add], axis=-1)
        ae = params["add_embedding"]
        temb = temb + _dense(ae["linear_2"], _silu(_dense(ae["linear_1"], add)))

    x = _conv2d(params["conv_in"], x, padding=(cfg.conv_in_kernel - 1) // 2)

    residuals = [x]
    for i, blk in enumerate(params["down_blocks"]):
        x, outs = _unet_block(blk, cfg, i, x, encoder_x, temb, None, t2d_gn_eps)
        residuals.extend(outs)

    x = _resnet(params["mid_blocks"][0], x, temb, cfg.norm_num_groups)
    x = _transformer2d(
        params["mid_blocks"][1], x, encoder_x, cfg.num_attention_heads[-1],
        cfg.norm_num_groups, t2d_gn_eps,
    )
    x = _resnet(params["mid_blocks"][2], x, temb, cfg.norm_num_groups)

    n = len(cfg.block_out_channels)
    for idx, blk in enumerate(params["up_blocks"]):
        i = n - 1 - idx
        x, _ = _unet_block(blk, cfg, i, x, encoder_x, temb, residuals, t2d_gn_eps)

    x = _silu(_group_norm(params["conv_norm_out"], x, cfg.norm_num_groups))
    return _conv2d(params["conv_out"], x, padding=(cfg.conv_out_kernel - 1) // 2)
