"""Weight-mapping fidelity tests (SURVEY §7 hard part 6): build synthetic
HF/BFL-style checkpoints for tiny configs, run them through sanitize +
unflatten + conform, and check the forward pass runs and specific weights
landed where (and transposed how) they should."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.io import sanitize
from flux_generator_tpu.io.loaders import conform_params
from flux_generator_tpu.io.params import unflatten
from flux_generator_tpu.models.clip.text import (
    clip_text_forward,
    init_clip_text,
    tiny_clip_config,
)
from flux_generator_tpu.models.flux.model import (
    flux_forward,
    init_flux,
    tiny_flux_config,
)
from flux_generator_tpu.models.t5.t5 import init_t5_encoder, t5_encode, tiny_t5_config


rng = np.random.RandomState(0)


def _w(*shape):
    return rng.randn(*shape).astype(np.float32) * 0.02


# ------------------------------------------------------------ flux flow


def _bfl_flux_ckpt(cfg):
    h, mlp = cfg.hidden_size, cfg.mlp_hidden
    hd = cfg.head_dim
    w = {}
    w["img_in.weight"] = _w(h, cfg.in_channels)
    w["img_in.bias"] = _w(h)
    w["txt_in.weight"] = _w(h, cfg.context_in_dim)
    w["txt_in.bias"] = _w(h)
    for name, din in (("time_in", 256), ("vector_in", cfg.vec_in_dim)):
        w[f"{name}.in_layer.weight"] = _w(h, din)
        w[f"{name}.in_layer.bias"] = _w(h)
        w[f"{name}.out_layer.weight"] = _w(h, h)
        w[f"{name}.out_layer.bias"] = _w(h)
    for i in range(cfg.depth):
        p = f"double_blocks.{i}"
        for s in ("img", "txt"):
            w[f"{p}.{s}_mod.lin.weight"] = _w(6 * h, h)
            w[f"{p}.{s}_mod.lin.bias"] = _w(6 * h)
            w[f"{p}.{s}_attn.qkv.weight"] = _w(3 * h, h)
            w[f"{p}.{s}_attn.qkv.bias"] = _w(3 * h)
            w[f"{p}.{s}_attn.norm.query_norm.scale"] = _w(hd)
            w[f"{p}.{s}_attn.norm.key_norm.scale"] = _w(hd)
            w[f"{p}.{s}_attn.proj.weight"] = _w(h, h)
            w[f"{p}.{s}_attn.proj.bias"] = _w(h)
            w[f"{p}.{s}_mlp.0.weight"] = _w(mlp, h)
            w[f"{p}.{s}_mlp.0.bias"] = _w(mlp)
            w[f"{p}.{s}_mlp.2.weight"] = _w(h, mlp)
            w[f"{p}.{s}_mlp.2.bias"] = _w(h)
    for i in range(cfg.depth_single_blocks):
        p = f"single_blocks.{i}"
        w[f"{p}.linear1.weight"] = _w(3 * h + mlp, h)
        w[f"{p}.linear1.bias"] = _w(3 * h + mlp)
        w[f"{p}.linear2.weight"] = _w(h, h + mlp)
        w[f"{p}.linear2.bias"] = _w(h)
        w[f"{p}.norm.query_norm.scale"] = _w(hd)
        w[f"{p}.norm.key_norm.scale"] = _w(hd)
        w[f"{p}.modulation.lin.weight"] = _w(3 * h, h)
        w[f"{p}.modulation.lin.bias"] = _w(3 * h)
    w["final_layer.linear.weight"] = _w(cfg.in_channels, h)
    w["final_layer.linear.bias"] = _w(cfg.in_channels)
    w["final_layer.adaLN_modulation.1.weight"] = _w(2 * h, h)
    w["final_layer.adaLN_modulation.1.bias"] = _w(2 * h)
    return w


def test_flux_flow_mapping_and_forward():
    cfg = tiny_flux_config()
    ckpt = _bfl_flux_ckpt(cfg)
    flat = sanitize.sanitize_flux(ckpt)
    params = unflatten(flat, sanitize.FLUX_STACKS)
    tmpl = jax.eval_shape(lambda: init_flux(jax.random.PRNGKey(0), cfg))
    params = conform_params(params, tmpl, "flux")
    params = jax.tree.map(jnp.asarray, params)
    # spot-check transposition + stacking
    np.testing.assert_allclose(
        np.asarray(params["img_in"]["kernel"]), ckpt["img_in.weight"].T
    )
    np.testing.assert_allclose(
        np.asarray(params["double_blocks"]["img_attn"]["qkv"]["kernel"][1]),
        ckpt["double_blocks.1.img_attn.qkv.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["single_blocks"]["q_norm"]["scale"][0]),
        ckpt["single_blocks.0.norm.query_norm.scale"],
    )
    out = flux_forward(
        params, cfg,
        jnp.ones((1, 4, cfg.in_channels)), jnp.zeros((1, 4, 3), jnp.int32),
        jnp.ones((1, 2, cfg.context_in_dim)), jnp.zeros((1, 2, 3), jnp.int32),
        jnp.full((1,), 0.5), jnp.ones((1, cfg.vec_in_dim)),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_flux_prefix_strip_and_extra_key_drop():
    cfg = tiny_flux_config()
    ckpt = {f"model.diffusion_model.{k}": v for k, v in _bfl_flux_ckpt(cfg).items()}
    # schnell checkpoints can carry unused branches
    ckpt["model.diffusion_model.guidance_in.in_layer.weight"] = _w(64, 256)
    flat = sanitize.sanitize_flux(ckpt)
    params = unflatten(flat, sanitize.FLUX_STACKS)
    tmpl = jax.eval_shape(lambda: init_flux(jax.random.PRNGKey(0), cfg))
    params = conform_params(params, tmpl, "flux")
    assert "guidance_in" not in params


# ------------------------------------------------------------ CLIP


def _hf_clip_ckpt(cfg):
    d = cfg.model_dims
    w = {
        "text_model.embeddings.token_embedding.weight": _w(cfg.vocab_size, d),
        "text_model.embeddings.position_embedding.weight": _w(cfg.max_length, d),
        "text_model.final_layer_norm.weight": _w(d),
        "text_model.final_layer_norm.bias": _w(d),
        "text_model.embeddings.position_ids": np.arange(cfg.max_length)[None],
    }
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for proj, tgt in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("out_proj", "o")):
            w[f"{p}.self_attn.{proj}.weight"] = _w(d, d)
            w[f"{p}.self_attn.{proj}.bias"] = _w(d)
        w[f"{p}.layer_norm1.weight"] = _w(d)
        w[f"{p}.layer_norm1.bias"] = _w(d)
        w[f"{p}.layer_norm2.weight"] = _w(d)
        w[f"{p}.layer_norm2.bias"] = _w(d)
        w[f"{p}.mlp.fc1.weight"] = _w(4 * d, d)
        w[f"{p}.mlp.fc1.bias"] = _w(4 * d)
        w[f"{p}.mlp.fc2.weight"] = _w(d, 4 * d)
        w[f"{p}.mlp.fc2.bias"] = _w(d)
    return w


def test_clip_mapping_and_forward():
    cfg = tiny_clip_config()
    ckpt = _hf_clip_ckpt(cfg)
    params = unflatten(sanitize.sanitize_clip(ckpt), sanitize.CLIP_STACKS)
    tmpl = jax.eval_shape(lambda: init_clip_text(jax.random.PRNGKey(0), cfg))
    params = conform_params(params, tmpl, "clip")
    params = jax.tree.map(jnp.asarray, params)
    out = clip_text_forward(params, cfg, jnp.array([[1, 5, 63, 0]]))
    assert out["pooled_output"].shape == (1, cfg.model_dims)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["fc1"]["kernel"][1]),
        ckpt["text_model.encoder.layers.1.mlp.fc1.weight"].T,
    )


# ------------------------------------------------------------ T5


def _hf_t5_encoder_ckpt(cfg):
    d, dff, inner = cfg.d_model, cfg.d_ff, cfg.d_kv * cfg.num_heads
    w = {"shared.weight": _w(cfg.vocab_size, d),
         "encoder.final_layer_norm.weight": _w(d),
         "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
             _w(cfg.relative_attention_num_buckets, cfg.num_heads)}
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        for x in "qkv":
            w[f"{p}.layer.0.SelfAttention.{x}.weight"] = _w(inner, d)
        w[f"{p}.layer.0.SelfAttention.o.weight"] = _w(d, inner)
        w[f"{p}.layer.0.layer_norm.weight"] = _w(d)
        w[f"{p}.layer.1.DenseReluDense.wi_0.weight"] = _w(dff, d)
        w[f"{p}.layer.1.DenseReluDense.wi_1.weight"] = _w(dff, d)
        w[f"{p}.layer.1.DenseReluDense.wo.weight"] = _w(d, dff)
        w[f"{p}.layer.1.layer_norm.weight"] = _w(d)
    return w


def test_t5_encoder_mapping_and_forward():
    cfg = tiny_t5_config()
    ckpt = _hf_t5_encoder_ckpt(cfg)
    params = unflatten(sanitize.sanitize_t5(ckpt), sanitize.T5_STACKS)
    tmpl = jax.eval_shape(lambda: init_t5_encoder(jax.random.PRNGKey(0), cfg))
    params = conform_params(params, tmpl, "t5")
    params = jax.tree.map(jnp.asarray, params)
    out = t5_encode(params, cfg, jnp.array([[3, 4, 5, 1]]))
    assert out.shape == (1, 4, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------ SD UNet GEGLU


def test_sd_unet_geglu_split():
    d = 8
    packed = _w(2 * 4 * d, d)  # ff.net.0.proj packs [value | gate]
    ckpt = {
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight": packed,
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.bias": _w(2 * 4 * d),
    }
    flat = sanitize.sanitize_sd_unet(ckpt)
    k1 = "down_blocks.0.attentions.0.blocks.0.linear1.kernel"
    k2 = "down_blocks.0.attentions.0.blocks.0.linear2.kernel"
    np.testing.assert_allclose(flat[k1], packed[: 4 * d].T)
    np.testing.assert_allclose(flat[k2], packed[4 * d :].T)


def test_sd_unet_1x1_and_conv_transforms():
    conv = _w(16, 8, 3, 3)
    proj = _w(16, 8, 1, 1)
    ckpt = {
        "down_blocks.0.resnets.0.conv1.weight": conv,
        "down_blocks.0.attentions.0.proj_in.weight": proj,
    }
    flat = sanitize.sanitize_sd_unet(ckpt)
    assert flat["down_blocks.0.resnets.0.conv1.kernel"].shape == (3, 3, 8, 16)
    np.testing.assert_allclose(
        flat["down_blocks.0.resnets.0.conv1.kernel"],
        conv.transpose(2, 3, 1, 0),
    )
    assert flat["down_blocks.0.attentions.0.proj_in.kernel"].shape == (8, 16)


# ------------------------------------------------------------ MusicGen qkv split


def test_musicgen_in_proj_fused():
    h = 12
    w_in = _w(3 * h, h)
    ckpt = {
        "transformer.layers.0.self_attn.in_proj_weight": w_in,
        "transformer.layers.0.self_attn.out_proj.weight": _w(h, h),
        "emb.0.weight": _w(17, h),
        "emb.1.weight": _w(17, h),
        "linears.0.weight": _w(16, h),
        "linears.1.weight": _w(16, h),
    }
    flat = sanitize.sanitize_musicgen(ckpt)
    # fused in_proj (3h, h) → qkv kernel (h, 3h): q rows land in cols [:h]
    np.testing.assert_allclose(flat["layers.0.self_attn.qkv.kernel"], w_in.T)
    np.testing.assert_allclose(
        flat["layers.0.self_attn.qkv.kernel"][:, :h], w_in[:h].T
    )
    assert "layers.0.self_attn.o.kernel" in flat
    assert flat["emb"].shape == (2, 17, h)
    assert flat["linears"].shape == (2, h, 16)


def test_quantize_tree_to_device_matches_quantize_tree():
    """Streaming quantize-before-transfer must produce bitwise the same
    buffers as the in-memory quantize_tree (loaders use it so the full-
    precision tree never has to fit on the accelerator)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flux_generator_tpu.ops.linear import init_dense
    from flux_generator_tpu.ops.quant import quantize_tree, quantize_tree_to_device

    tree = {
        "big": init_dense(jax.random.PRNGKey(0), 512, 64, dtype=jnp.float32),
        "small": init_dense(jax.random.PRNGKey(1), 7, 5, dtype=jnp.float32),
        "norm": {"scale": jnp.ones((512,), jnp.float32)},
    }
    host = jax.tree.map(lambda x: np.asarray(x), tree)
    ref = quantize_tree(tree)
    out = quantize_tree_to_device(host, dtype=jnp.bfloat16)
    assert out["big"]["kernel_q"].dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(out["big"]["kernel_q"]), np.asarray(ref["big"]["kernel_q"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["big"]["kernel_scale"]), np.asarray(ref["big"]["kernel_scale"])
    )
    # non-eligible dense keeps a full kernel, cast to the compute dtype
    assert out["small"]["kernel"].dtype == jnp.bfloat16
    assert out["norm"]["scale"].dtype == jnp.bfloat16
    # quantized bias follows the compute dtype too
    assert out["big"]["bias"].dtype == jnp.bfloat16
