"""Conditional 2-D UNet (SD 2.1 / SDXL) — functional JAX/NHWC.

Parity with stable_diffusion/stable_diffusion/unet.py: sinusoidal timesteps
(cos-first), optional SDXL `text_time` added embedding, cross-attention
transformer blocks with GEGLU feed-forward, ResnetBlock2D with time-embedding
injection, down/up blocks with skip concat. Block structure is static config,
so plain Python loops trace fine; the level count is 4 (SD) — compile cost is
dominated by the transformer bodies which XLA shares across identical shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ...ops.embeddings import timestep_embedding
from ...ops.linear import conv2d, dense, init_conv2d, init_dense
from ...ops.norms import group_norm, layer_norm
from .config import UNetConfig


def _upsample_nearest(x, scale: int = 2):
    return jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)


# ------------------------------------------------------------ init


def _init_ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _init_gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_attn(key, dims, memory_dims, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": init_dense(ks[0], dims, dims, bias=False, dtype=dtype),
        "k": init_dense(ks[1], memory_dims, dims, bias=False, dtype=dtype),
        "v": init_dense(ks[2], memory_dims, dims, bias=False, dtype=dtype),
        "o": init_dense(ks[3], dims, dims, dtype=dtype),
    }


def _init_transformer_block(key, dims, num_heads, memory_dims, dtype):
    ks = jax.random.split(key, 5)
    return {
        "norm1": _init_ln(dims, dtype),
        "attn1": _init_attn(ks[0], dims, dims, dtype),
        "norm2": _init_ln(dims, dtype),
        "attn2": _init_attn(ks[1], dims, memory_dims, dtype),
        "norm3": _init_ln(dims, dtype),
        # GEGLU: linear1 = value path, linear2 = gate path (reference
        # unet.py:74-78: y_a * gelu(y_b))
        "linear1": init_dense(ks[2], dims, 4 * dims, dtype=dtype),
        "linear2": init_dense(ks[3], dims, 4 * dims, dtype=dtype),
        "linear3": init_dense(ks[4], 4 * dims, dims, dtype=dtype),
    }


def _init_transformer2d(key, in_ch, model_dims, encoder_dims, num_heads, num_layers, groups, dtype):
    ks = jax.random.split(key, 3)
    return {
        "norm": _init_gn(in_ch, dtype),
        "proj_in": init_dense(ks[0], in_ch, model_dims, dtype=dtype),
        # identical blocks stacked for lax.scan — SDXL has 10 per site at the
        # deepest level; scanning keeps the HLO one block deep
        "blocks": jax.vmap(
            lambda k: _init_transformer_block(k, model_dims, num_heads, encoder_dims, dtype)
        )(jax.random.split(ks[1], num_layers)),
        "proj_out": init_dense(ks[2], model_dims, in_ch, dtype=dtype),
    }


def _init_resnet(key, cin, cout, temb, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _init_gn(cin, dtype),
        "conv1": init_conv2d(ks[0], cin, cout, 3, dtype=dtype),
        "norm2": _init_gn(cout, dtype),
        "conv2": init_conv2d(ks[1], cout, cout, 3, dtype=dtype),
    }
    if temb is not None:
        p["time_emb_proj"] = init_dense(ks[2], temb, cout, dtype=dtype)
    if cin != cout:
        p["conv_shortcut"] = init_dense(ks[3], cin, cout, dtype=dtype)
    return p


def _init_unet_block(key, cfg: UNetConfig, i, in_ch, out_ch, prev_out, down, up, cross, dtype):
    n_layers = cfg.layers_per_block[i] + (1 if prev_out is not None else 0)
    if prev_out is None:
        in_list = [in_ch] + [out_ch] * (n_layers - 1)
    else:
        in_list = [prev_out] + [out_ch] * (n_layers - 1)
        res_list = [out_ch] * (n_layers - 1) + [in_ch]
        in_list = [a + b for a, b in zip(in_list, res_list)]
    ks = jax.random.split(key, 2 * n_layers + 2)
    p = {
        "resnets": [
            _init_resnet(ks[j], ic, out_ch, cfg.temb_dim, dtype)
            for j, ic in enumerate(in_list)
        ]
    }
    if cross:
        p["attentions"] = [
            _init_transformer2d(
                ks[n_layers + j], out_ch, out_ch, cfg.cross_attention_dim[i],
                cfg.num_attention_heads[i], cfg.transformer_layers_per_block[i],
                cfg.norm_num_groups, dtype,
            )
            for j in range(n_layers)
        ]
    if down:
        p["downsample"] = init_conv2d(ks[-2], out_ch, out_ch, 3, dtype=dtype)
    if up:
        p["upsample"] = init_conv2d(ks[-1], out_ch, out_ch, 3, dtype=dtype)
    return p


def init_unet(key, cfg: UNetConfig, dtype=jnp.float32):
    n = len(cfg.block_out_channels)
    ks = jax.random.split(key, 2 * n + 12)
    ki = iter(ks)
    c0 = cfg.block_out_channels[0]
    p = {
        "conv_in": init_conv2d(next(ki), cfg.in_channels, c0, cfg.conv_in_kernel, dtype=dtype),
        "time_embedding": {
            "linear_1": init_dense(next(ki), c0, cfg.temb_dim, dtype=dtype),
            "linear_2": init_dense(next(ki), cfg.temb_dim, cfg.temb_dim, dtype=dtype),
        },
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embedding"] = {
            "linear_1": init_dense(
                next(ki), cfg.projection_class_embeddings_input_dim, cfg.temb_dim, dtype=dtype
            ),
            "linear_2": init_dense(next(ki), cfg.temb_dim, cfg.temb_dim, dtype=dtype),
        }

    chans = [c0] + list(cfg.block_out_channels)
    p["down_blocks"] = [
        _init_unet_block(
            next(ki), cfg, i, ic, oc, None,
            down=(i < n - 1), up=False,
            cross="CrossAttn" in cfg.down_block_types[i], dtype=dtype,
        )
        for i, (ic, oc) in enumerate(zip(chans, chans[1:]))
    ]
    cl = cfg.block_out_channels[-1]
    p["mid_blocks"] = [
        _init_resnet(next(ki), cl, cl, cfg.temb_dim, dtype),
        _init_transformer2d(
            next(ki), cl, cl, cfg.cross_attention_dim[-1],
            cfg.num_attention_heads[-1], cfg.transformer_layers_per_block[-1],
            cfg.norm_num_groups, dtype,
        ),
        _init_resnet(next(ki), cl, cl, cfg.temb_dim, dtype),
    ]
    chans = [c0] + list(cfg.block_out_channels) + [cl]
    p["up_blocks"] = [
        _init_unet_block(
            next(ki), cfg, i, ic, oc, po,
            down=False, up=(i > 0),
            cross="CrossAttn" in cfg.up_block_types[i], dtype=dtype,
        )
        for i, (ic, oc, po) in reversed(
            list(enumerate(zip(chans, chans[1:], chans[2:])))
        )
    ]
    p["conv_norm_out"] = _init_gn(c0, dtype)
    p["conv_out"] = init_conv2d(next(ki), c0, cfg.out_channels, cfg.conv_out_kernel, dtype=dtype)
    return p


# ------------------------------------------------------------ forward


def _self_attention(q, k, v):
    """Self-attention dispatch: Pallas flash kernel on TPU for the big
    spatial sequences (64x64 latents = 4096 tokens), XLA otherwise."""
    from ...runtime.config import use_pallas_attention

    if use_pallas_attention() and q.shape[1] >= 256 and q.shape[-1] % 64 == 0:
        from ...ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)
    return dot_product_attention(q, k, v)


def _transformer_block(p, x, memory, num_heads):
    b, l, d = x.shape
    y = layer_norm(x, p["norm1"])
    q = dense(p["attn1"]["q"], y).reshape(b, l, num_heads, -1)
    k = dense(p["attn1"]["k"], y).reshape(b, l, num_heads, -1)
    v = dense(p["attn1"]["v"], y).reshape(b, l, num_heads, -1)
    x = x + dense(p["attn1"]["o"], _self_attention(q, k, v).reshape(b, l, d))

    y = layer_norm(x, p["norm2"])
    s = memory.shape[1]
    q = dense(p["attn2"]["q"], y).reshape(b, l, num_heads, -1)
    k = dense(p["attn2"]["k"], memory).reshape(b, s, num_heads, -1)
    v = dense(p["attn2"]["v"], memory).reshape(b, s, num_heads, -1)
    x = x + dense(p["attn2"]["o"], dot_product_attention(q, k, v).reshape(b, l, d))

    y = layer_norm(x, p["norm3"])
    y = dense(p["linear1"], y) * jax.nn.gelu(dense(p["linear2"], y), approximate=False)
    return x + dense(p["linear3"], y)


# FLOP-counting lowerings set this True (bench._xla_flops): XLA's
# cost_analysis counts a lax.scan body ONCE regardless of trip count, so the
# stacked transformer layers (10 per site at SDXL's deepest level) would be
# 10x under-counted. unroll=n leaves a single while trip whose body holds all
# n layers — counted exactly once, i.e. correctly. Never set for real runs
# (the rolled scan compiles faster and times identically).
_FLOP_COUNT_UNROLL = False


def _transformer2d(p, x, memory, num_heads, groups):
    b, h, w, c = x.shape
    # diffusers Transformer2DModel hardcodes GN eps=1e-6 (the resnets use
    # 1e-5); the MLX reference ports both at 1e-5 — we match the weights'
    # native convention
    y = group_norm(x, p["norm"], groups, eps=1e-6).reshape(b, h * w, c)
    y = dense(p["proj_in"], y)

    def step(carry, blk):
        return _transformer_block(blk, carry, memory, num_heads), None

    n_blocks = jax.tree.leaves(p["blocks"])[0].shape[0]
    y, _ = jax.lax.scan(step, y, p["blocks"],
                        unroll=n_blocks if _FLOP_COUNT_UNROLL else 1)
    y = dense(p["proj_out"], y)
    return x + y.reshape(b, h, w, c)


def _resnet(p, x, temb, groups):
    y = jax.nn.silu(group_norm(x, p["norm1"], groups))
    y = conv2d(p["conv1"], y, padding=1)
    if temb is not None and "time_emb_proj" in p:
        y = y + dense(p["time_emb_proj"], jax.nn.silu(temb))[:, None, None, :]
    y = jax.nn.silu(group_norm(y, p["norm2"], groups))
    y = conv2d(p["conv2"], y, padding=1)
    if "conv_shortcut" in p:
        x = dense(p["conv_shortcut"], x)
    return x + y


def _unet_block(p, cfg, i, x, memory, temb, residuals=None):
    outputs = []
    for j, res in enumerate(p["resnets"]):
        if residuals is not None:
            x = jnp.concatenate([x, residuals.pop()], axis=-1)
        x = _resnet(res, x, temb, cfg.norm_num_groups)
        if "attentions" in p:
            x = _transformer2d(
                p["attentions"][j], x, memory, cfg.num_attention_heads[i],
                cfg.norm_num_groups,
            )
        outputs.append(x)
    if "downsample" in p:
        x = conv2d(p["downsample"], x, stride=2, padding=1)
        outputs.append(x)
    if "upsample" in p:
        x = conv2d(p["upsample"], _upsample_nearest(x), padding=1)
        outputs.append(x)
    return x, outputs


def compute_temb(params, cfg: UNetConfig, timestep, text_time, dtype):
    """Time embedding incl. the SDXL text_time added embedding
    (reference unet.py:283-313, diffusers add_embedding semantics)."""
    temb = timestep_embedding(
        timestep.astype(jnp.float32), cfg.block_out_channels[0], time_factor=1.0
    ).astype(dtype)
    te = params["time_embedding"]
    temb = dense(te["linear_2"], jax.nn.silu(dense(te["linear_1"], temb)))

    if text_time is not None:
        text_emb, time_ids = text_time
        add = timestep_embedding(
            time_ids.astype(jnp.float32).reshape(-1), cfg.addition_time_embed_dim,
            time_factor=1.0,
        ).reshape(time_ids.shape[0], -1).astype(dtype)
        add = jnp.concatenate([text_emb, add], axis=-1)
        ae = params["add_embedding"]
        temb = temb + dense(ae["linear_2"], jax.nn.silu(dense(ae["linear_1"], add)))
    return temb


def unet_forward(params, cfg: UNetConfig, x, timestep, encoder_x, text_time=None):
    """x: (B, H, W, in_ch) latents; timestep: (B,); encoder_x: (B, S, ctx_dim);
    text_time: optional (pooled_text (B, P), time_ids (B, 6)) for SDXL."""
    temb = compute_temb(params, cfg, timestep, text_time, x.dtype)

    x = conv2d(params["conv_in"], x, padding=(cfg.conv_in_kernel - 1) // 2)

    residuals = [x]
    for i, blk in enumerate(params["down_blocks"]):
        x, outs = _unet_block(blk, cfg, i, x, encoder_x, temb)
        residuals.extend(outs)

    x = _resnet(params["mid_blocks"][0], x, temb, cfg.norm_num_groups)
    x = _transformer2d(
        params["mid_blocks"][1], x, encoder_x, cfg.num_attention_heads[-1],
        cfg.norm_num_groups,
    )
    x = _resnet(params["mid_blocks"][2], x, temb, cfg.norm_num_groups)

    n = len(cfg.block_out_channels)
    for idx, blk in enumerate(params["up_blocks"]):
        i = n - 1 - idx  # up_blocks stored deepest-first
        x, _ = _unet_block(blk, cfg, i, x, encoder_x, temb, residuals=residuals)

    x = jax.nn.silu(group_norm(x, params["conv_norm_out"], cfg.norm_num_groups))
    return conv2d(params["conv_out"], x, padding=(cfg.conv_out_kernel - 1) // 2)
