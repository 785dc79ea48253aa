"""Numerical parity for the SD/SDXL UNet blocks against hand-written torch
twins of the diffusers modules the MLX reference mirrors
(stable_diffusion/stable_diffusion/unet.py:35-267):

  - BasicTransformerBlock (self-attn + cross-attn + GEGLU feed-forward, where
    diffusers ff.net.0.proj chunks into [value | gate] — the split the
    reference encodes at model_io.py:78-82)
  - Transformer2DModel wrapper (GN eps=1e-6 + linear proj in/out + residual)
  - ResnetBlock2D with time-embedding injection and 1x1 conv shortcut
  - SDXL text_time added embedding (Timesteps(256, cos-first, shift 0) per
    time_id, concat after pooled text)

The twins take OUR param pytrees (transposing (in,out) kernels to torch
(out,in), NHWC→NCHW for convs) — closing VERDICT r1 missing #3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flux_generator_tpu.models.sd.config import UNetConfig, tiny_unet_config  # noqa: E402
from flux_generator_tpu.models.sd.unet import (  # noqa: E402

    _init_resnet,
    _init_transformer2d,
    _resnet,
    _transformer2d,
    compute_temb,
    init_unet,
)

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def _linear(p, x):
    y = x @ _t(p["kernel"]).to(x.dtype)
    if "bias" in p:
        y = y + _t(p["bias"]).to(x.dtype)
    return y


def _conv2d_nchw(p, x, stride=1, padding=0):
    """x: (B, C, H, W); our kernel is HWIO → torch OIHW."""
    w = _t(p["kernel"]).permute(3, 2, 0, 1)
    b = _t(p["bias"]) if "bias" in p else None
    return torch.nn.functional.conv2d(x, w, b, stride=stride, padding=padding)


def _group_norm(x, p, groups, eps):
    return torch.nn.functional.group_norm(
        x, groups, _t(p["scale"]).to(x.dtype), _t(p["bias"]).to(x.dtype), eps=eps
    )


def _layer_norm(x, p, eps=1e-5):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), _t(p["scale"]).to(x.dtype), _t(p["bias"]).to(x.dtype), eps
    )


def _attention(p, x, memory, num_heads):
    """diffusers Attention: heads-split SDPA, scale 1/sqrt(d_head)."""
    b, l, d = x.shape
    s = memory.shape[1]
    q = _linear(p["q"], x).reshape(b, l, num_heads, -1).transpose(1, 2)
    k = _linear(p["k"], memory).reshape(b, s, num_heads, -1).transpose(1, 2)
    v = _linear(p["v"], memory).reshape(b, s, num_heads, -1).transpose(1, 2)
    out = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    return _linear(p["o"], out.transpose(1, 2).reshape(b, l, d))


def _basic_transformer_block(p, x, memory, num_heads):
    x = x + _attention(p["attn1"], _layer_norm(x, p["norm1"]), _layer_norm(x, p["norm1"]), num_heads)
    x = x + _attention(p["attn2"], _layer_norm(x, p["norm2"]), memory, num_heads)
    # GEGLU as diffusers writes it: ONE proj to 2*inner, chunk(2) into
    # [value | gate], value * gelu(gate). Build proj from our split weights.
    y = _layer_norm(x, p["norm3"])
    proj = torch.cat(
        [_linear(p["linear1"], y), _linear(p["linear2"], y)], dim=-1
    )
    value, gate = proj.chunk(2, dim=-1)
    y = value * torch.nn.functional.gelu(gate)
    return x + _linear(p["linear3"], y)


def _torch_transformer2d(p, x_nchw, memory, num_heads, groups):
    b, c, h, w = x_nchw.shape
    y = _group_norm(x_nchw, p["norm"], groups, eps=1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
    y = _linear(p["proj_in"], y)
    n = int(np.asarray(jax.tree.leaves(p["blocks"])[0]).shape[0])
    for i in range(n):
        blk = jax.tree.map(lambda a: np.asarray(a)[i], p["blocks"])
        y = _basic_transformer_block(blk, y, memory, num_heads)
    y = _linear(p["proj_out"], y)
    return x_nchw + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


def _torch_resnet(p, x_nchw, temb, groups):
    y = torch.nn.functional.silu(_group_norm(x_nchw, p["norm1"], groups, eps=1e-5))
    y = _conv2d_nchw(p["conv1"], y, padding=1)
    if temb is not None and "time_emb_proj" in p:
        y = y + _linear(p["time_emb_proj"], torch.nn.functional.silu(temb))[:, :, None, None]
    y = torch.nn.functional.silu(_group_norm(y, p["norm2"], groups, eps=1e-5))
    y = _conv2d_nchw(p["conv2"], y, padding=1)
    if "conv_shortcut" in p:
        x_nchw = _linear(p["conv_shortcut"], x_nchw.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
    return x_nchw + y


def _timesteps(t, dim):
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    freqs = torch.exp(
        -torch.log(torch.tensor(10000.0, dtype=torch.float64))
        * torch.arange(half, dtype=torch.float64) / half
    )
    ang = t.double()[:, None] * freqs[None]
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


def test_transformer2d_matches_torch_twin():
    """GEGLU split + attention + GN(1e-6) + residual, 2 stacked blocks."""
    d, heads, groups, ctx = 32, 4, 8, 24
    key = jax.random.PRNGKey(0)
    p = _init_transformer2d(key, d, d, ctx, heads, 2, groups, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, d), jnp.float32)
    mem = jax.random.normal(jax.random.PRNGKey(2), (2, 7, ctx), jnp.float32)

    got = np.asarray(_transformer2d(p, x, mem, heads, groups))
    with torch.no_grad():
        want = _torch_transformer2d(
            p, _t(x).permute(0, 3, 1, 2), _t(mem), heads, groups
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_resnet_block_matches_torch_twin():
    """ResnetBlock2D with temb injection and channel-change shortcut."""
    cin, cout, temb_dim, groups = 16, 32, 24, 8
    p = _init_resnet(jax.random.PRNGKey(0), cin, cout, temb_dim, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, cin), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, temb_dim), jnp.float32)

    got = np.asarray(_resnet(p, x, temb, groups))
    with torch.no_grad():
        want = _torch_resnet(
            p, _t(x).permute(0, 3, 1, 2), _t(temb), groups
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_sdxl_text_time_embedding_matches_torch_twin():
    """SDXL added embedding: Timesteps(add_dim) per time_id flattened, concat
    AFTER pooled text, then linear→silu→linear added to temb
    (reference sd/__init__.py:249-252, unet.py:298-313)."""
    cfg = tiny_unet_config(
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=12 + 6 * 8,  # pooled 12 + 6 ids
    )
    params = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
    t = jnp.array([3.0, 999.0], jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(1), (2, 12), jnp.float32)
    time_ids = jnp.array([[512, 512, 0, 0, 512, 512],
                          [128, 128, 16, 16, 96, 96]], jnp.float32)

    got = np.asarray(compute_temb(params, cfg, t, (pooled, time_ids), jnp.float32))

    with torch.no_grad():
        temb = _timesteps(_t(t), cfg.block_out_channels[0])
        te = params["time_embedding"]
        temb = _linear(te["linear_2"], torch.nn.functional.silu(_linear(te["linear_1"], temb)))
        add = _timesteps(_t(time_ids).reshape(-1), cfg.addition_time_embed_dim)
        add = add.reshape(2, -1)
        add = torch.cat([_t(pooled), add], dim=-1)
        ae = params["add_embedding"]
        temb = temb + _linear(ae["linear_2"], torch.nn.functional.silu(_linear(ae["linear_1"], add)))
        want = temb.numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_unet_time_embedding_matches_torch_twin():
    """Plain SD temb path (no text_time): Timesteps → linear→silu→linear."""
    cfg = tiny_unet_config()
    params = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
    t = jnp.array([0.0, 500.0, 999.0], jnp.float32)
    got = np.asarray(compute_temb(params, cfg, t, None, jnp.float32))
    with torch.no_grad():
        temb = _timesteps(_t(t), cfg.block_out_channels[0])
        te = params["time_embedding"]
        want = _linear(
            te["linear_2"], torch.nn.functional.silu(_linear(te["linear_1"], temb))
        ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
