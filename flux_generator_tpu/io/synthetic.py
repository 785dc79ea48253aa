"""Synthetic full-format checkpoint caches — the load-path dress rehearsal.

Real weights can't land in this environment, but the load machinery can still
be exercised with zero shortcuts: these builders write random checkpoints in
the *exact* on-disk formats the loaders consume — safetensors files, sharded
``model.safetensors.index.json``, HF ``config.json``s, torch
``state_dict.bin`` (MusicGen), BPE ``vocab.json``/``merges.txt`` and
SentencePiece ``.model`` files — laid out like the HF repos the reference
downloads (flux/utils.py:98-210, stable_diffusion/.../model_io.py:185-330,
musicgen/musicgen.py:333-358). ``scripts/validate_real.py --selftest`` runs
``io.loaders`` against these caches end to end; pointing the same script at
a directory of real checkpoints runs the identical path at full size.

Where a true independent implementation exists in the image (transformers
T5/CLIP/EnCodec/MusicGen), state dicts come from the real HF modules — the
key names are theirs, not ours. Flux flow/AE and SD UNet/VAE keys follow the
published BFL/diffusers layouts (the same contracts io/sanitize.py encodes).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def _rng(seed=0):
    return np.random.RandomState(seed)


def save_safetensors(path, tensors: dict):
    from safetensors.numpy import save_file

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, str(path))


def save_sharded_safetensors(directory, tensors: dict, n_shards: int = 2,
                             prefix: str = "model"):
    """Multi-file checkpoint + index.json, the exact layout T5-XXL ships in
    (flux/utils.py:176-188 reads it via the index's weight_map)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    keys = sorted(tensors)
    shards = [keys[i::n_shards] for i in range(n_shards)]
    weight_map = {}
    for i, shard_keys in enumerate(shards):
        fname = f"{prefix}-{i + 1:05d}-of-{n_shards:05d}.safetensors"
        save_safetensors(directory / fname, {k: tensors[k] for k in shard_keys})
        for k in shard_keys:
            weight_map[k] = fname
    total = int(sum(np.asarray(v).nbytes for v in tensors.values()))
    with open(directory / f"{prefix}.safetensors.index.json", "w") as f:
        json.dump({"metadata": {"total_size": total}, "weight_map": weight_map}, f)


# ------------------------------------------------------------ flux (BFL keys)


def bfl_flux_state(cfg, rng=None) -> dict:
    """BFL flux1-*.safetensors key layout (flux/model.py:85-97 contract)."""
    rng = rng or _rng(1)
    w = lambda *s: rng.randn(*s).astype(np.float32) * 0.02  # noqa: E731
    h, mlp, hd = cfg.hidden_size, cfg.mlp_hidden, cfg.head_dim
    out = {}
    out["img_in.weight"] = w(h, cfg.in_channels)
    out["img_in.bias"] = w(h)
    out["txt_in.weight"] = w(h, cfg.context_in_dim)
    out["txt_in.bias"] = w(h)
    mlps = [("time_in", 256), ("vector_in", cfg.vec_in_dim)]
    if cfg.guidance_embed:
        mlps.append(("guidance_in", 256))
    for name, din in mlps:
        out[f"{name}.in_layer.weight"] = w(h, din)
        out[f"{name}.in_layer.bias"] = w(h)
        out[f"{name}.out_layer.weight"] = w(h, h)
        out[f"{name}.out_layer.bias"] = w(h)
    for i in range(cfg.depth):
        p = f"double_blocks.{i}"
        for s in ("img", "txt"):
            out[f"{p}.{s}_mod.lin.weight"] = w(6 * h, h)
            out[f"{p}.{s}_mod.lin.bias"] = w(6 * h)
            out[f"{p}.{s}_attn.qkv.weight"] = w(3 * h, h)
            out[f"{p}.{s}_attn.qkv.bias"] = w(3 * h)
            out[f"{p}.{s}_attn.norm.query_norm.scale"] = w(hd)
            out[f"{p}.{s}_attn.norm.key_norm.scale"] = w(hd)
            out[f"{p}.{s}_attn.proj.weight"] = w(h, h)
            out[f"{p}.{s}_attn.proj.bias"] = w(h)
            out[f"{p}.{s}_mlp.0.weight"] = w(mlp, h)
            out[f"{p}.{s}_mlp.0.bias"] = w(mlp)
            out[f"{p}.{s}_mlp.2.weight"] = w(h, mlp)
            out[f"{p}.{s}_mlp.2.bias"] = w(h)
    for i in range(cfg.depth_single_blocks):
        p = f"single_blocks.{i}"
        out[f"{p}.linear1.weight"] = w(3 * h + mlp, h)
        out[f"{p}.linear1.bias"] = w(3 * h + mlp)
        out[f"{p}.linear2.weight"] = w(h, h + mlp)
        out[f"{p}.linear2.bias"] = w(h)
        out[f"{p}.norm.query_norm.scale"] = w(hd)
        out[f"{p}.norm.key_norm.scale"] = w(hd)
        out[f"{p}.modulation.lin.weight"] = w(3 * h, h)
        out[f"{p}.modulation.lin.bias"] = w(3 * h)
    out["final_layer.linear.weight"] = w(cfg.in_channels, h)
    out["final_layer.linear.bias"] = w(cfg.in_channels)
    out["final_layer.adaLN_modulation.1.weight"] = w(2 * h, h)
    out["final_layer.adaLN_modulation.1.bias"] = w(2 * h)
    return out


def bfl_flux_ae_state(cfg, rng=None) -> dict:
    """BFL ae.safetensors key layout (flux/autoencoder.py:336-345 contract):
    torchvision names, OIHW convs, 1×1-conv attention projections."""
    rng = rng or _rng(2)
    w = lambda *s: rng.randn(*s).astype(np.float32) * 0.02  # noqa: E731
    out = {}

    def gn(prefix, c):
        out[f"{prefix}.weight"] = w(c)
        out[f"{prefix}.bias"] = w(c)

    def conv(prefix, cin, cout, k=3):
        out[f"{prefix}.weight"] = w(cout, cin, k, k)
        out[f"{prefix}.bias"] = w(cout)

    def resnet(prefix, cin, cout):
        gn(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout)
        gn(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.nin_shortcut", cin, cout, 1)

    def attn(prefix, c):
        gn(f"{prefix}.norm", c)
        for name in ("q", "k", "v", "proj_out"):
            conv(f"{prefix}.{name}", c, c, 1)

    n = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)
    conv("encoder.conv_in", cfg.in_channels, cfg.ch)
    block_in = cfg.ch
    for i in range(n):
        block_in = cfg.ch * in_mult[i]
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks):
            resnet(f"encoder.down.{i}.block.{j}", block_in, block_out)
            block_in = block_out
        if i != n - 1:
            conv(f"encoder.down.{i}.downsample.conv", block_in, block_in)
    resnet("encoder.mid.block_1", block_in, block_in)
    attn("encoder.mid.attn_1", block_in)
    resnet("encoder.mid.block_2", block_in, block_in)
    gn("encoder.norm_out", block_in)
    conv("encoder.conv_out", block_in, 2 * cfg.z_channels)

    block_in = cfg.ch * cfg.ch_mult[-1]
    conv("decoder.conv_in", cfg.z_channels, block_in)
    resnet("decoder.mid.block_1", block_in, block_in)
    attn("decoder.mid.attn_1", block_in)
    resnet("decoder.mid.block_2", block_in, block_in)
    for i in reversed(range(n)):
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            resnet(f"decoder.up.{i}.block.{j}", block_in, block_out)
            block_in = block_out
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", block_in, block_in)
    gn("decoder.norm_out", block_in)
    conv("decoder.conv_out", block_in, cfg.out_ch)
    return out


# --------------------------------------------------- HF-module state dicts


def hf_clip_state(num_layers, hidden, heads, max_pos, vocab, act="quick_gelu",
                  projection_dim=None, seed=0) -> tuple:
    """Real transformers CLIPTextModel[WithProjection] state dict + the HF
    config dict the SD loader parses."""
    import torch
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=4 * hidden,
        num_hidden_layers=num_layers, num_attention_heads=heads,
        max_position_embeddings=max_pos, hidden_act=act,
        bos_token_id=0, eos_token_id=vocab - 1,
        projection_dim=projection_dim or hidden,
    )
    torch.manual_seed(seed)
    cls = (transformers.CLIPTextModelWithProjection if projection_dim
           else transformers.CLIPTextModel)
    model = cls(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, json.loads(hf_cfg.to_json_string())


def hf_t5_encoder_state(cfg, seed=0) -> tuple:
    """Real transformers T5EncoderModel state dict + HF config dict, from our
    T5Config hparams."""
    import torch
    import transformers

    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj=cfg.feed_forward_proj,
        tie_word_embeddings=cfg.tie_word_embeddings, dropout_rate=0.0,
    )
    torch.manual_seed(seed)
    model = transformers.T5EncoderModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, json.loads(hf_cfg.to_json_string())


def hf_encodec_state(cfg, seed=0) -> tuple:
    """Real transformers EncodecModel state dict + HF config dict."""
    import torch
    import transformers

    hf_cfg = transformers.EncodecConfig(
        target_bandwidths=list(cfg.target_bandwidths),
        sampling_rate=cfg.sampling_rate, audio_channels=1,
        num_filters=cfg.num_filters, kernel_size=7, last_kernel_size=7,
        residual_kernel_size=3,
        upsampling_ratios=list(cfg.upsampling_ratios),
        num_residual_layers=1, dilation_growth_rate=2,
        num_lstm_layers=cfg.num_lstm_layers, hidden_size=cfg.hidden_size,
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
        compress=2, use_causal_conv=cfg.use_causal_conv,
        pad_mode=cfg.pad_mode, norm_type=cfg.norm_type, trim_right_ratio=1.0,
        chunk_length_s=None, overlap=None, normalize=False,
        use_conv_shortcut=cfg.use_conv_shortcut,
    )
    torch.manual_seed(seed)
    model = transformers.EncodecModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, json.loads(hf_cfg.to_json_string())


def audiocraft_musicgen_state(cfg, seed=0) -> dict:
    """MusicGen decoder in the audiocraft state_dict.bin["best_state"] naming
    (musicgen/musicgen.py:307-330 contract): fused in_proj qkv, emb/linears
    lists, condition_provider text projection."""
    rng = _rng(seed)
    w = lambda *s: rng.randn(*s).astype(np.float32) * 0.02  # noqa: E731
    h = cfg.hidden_size
    out = {}
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.layers.{i}"
        for attn in ("self_attn", "cross_attention"):
            out[f"{p}.{attn}.in_proj_weight"] = w(3 * h, h)
            out[f"{p}.{attn}.out_proj.weight"] = w(h, h)
        for ln in ("norm1", "norm_cross", "norm2"):
            out[f"{p}.{ln}.weight"] = w(h)
            out[f"{p}.{ln}.bias"] = w(h)
        out[f"{p}.linear1.weight"] = w(cfg.ffn_dim, h)
        out[f"{p}.linear2.weight"] = w(h, cfg.ffn_dim)
    for k in range(cfg.num_codebooks):
        out[f"emb.{k}.weight"] = w(cfg.codebook_size + 1, h)
        out[f"linears.{k}.weight"] = w(cfg.codebook_size, h)
    out["out_norm.weight"] = w(h)
    out["out_norm.bias"] = w(h)
    out["condition_provider.conditioners.description.output_proj.weight"] = (
        w(h, cfg.text_d_model)
    )
    out["condition_provider.conditioners.description.output_proj.bias"] = w(h)
    return out


# ------------------------------------------------- SD UNet/VAE (diffusers)


def hf_sd_unet_state(cfg, rng=None) -> dict:
    """diffusers UNet2DConditionModel key layout for our UNetConfig
    (model_io.py:49-164 contract): OIHW convs, 1×1-conv transformer
    projections (SD2.1 style), packed GEGLU ff.net.0.proj, fused time/add
    embeddings."""
    rng = rng or _rng(3)
    w = lambda *s: rng.randn(*s).astype(np.float32) * 0.02  # noqa: E731
    out = {}

    def gn(prefix, c):
        out[f"{prefix}.weight"] = w(c)
        out[f"{prefix}.bias"] = w(c)

    def lin(prefix, din, dout, bias=True):
        out[f"{prefix}.weight"] = w(dout, din)
        if bias:
            out[f"{prefix}.bias"] = w(dout)

    def conv(prefix, cin, cout, k=3):
        out[f"{prefix}.weight"] = w(cout, cin, k, k)
        out[f"{prefix}.bias"] = w(cout)

    temb = cfg.temb_dim

    def resnet(prefix, cin, cout):
        gn(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout)
        lin(f"{prefix}.time_emb_proj", temb, cout)
        gn(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut", cin, cout, 1)

    def transformer2d(prefix, c, level):
        d, xd = c, cfg.cross_attention_dim[level]
        gn(f"{prefix}.norm", c)
        conv(f"{prefix}.proj_in", c, d, 1)
        for k in range(cfg.transformer_layers_per_block[level]):
            b = f"{prefix}.transformer_blocks.{k}"
            gn(f"{b}.norm1", d)
            for qkv, mem in (("attn1", d), ("attn2", xd)):
                lin(f"{b}.{qkv}.to_q", d, d, bias=False)
                lin(f"{b}.{qkv}.to_k", mem, d, bias=False)
                lin(f"{b}.{qkv}.to_v", mem, d, bias=False)
                lin(f"{b}.{qkv}.to_out.0", d, d)
            gn(f"{b}.norm2", d)
            gn(f"{b}.norm3", d)
            lin(f"{b}.ff.net.0.proj", d, 8 * d)  # packed value|gate GEGLU
            lin(f"{b}.ff.net.2", 4 * d, d)
        conv(f"{prefix}.proj_out", d, c, 1)

    n = len(cfg.block_out_channels)
    c0 = cfg.block_out_channels[0]
    conv("conv_in", cfg.in_channels, c0, cfg.conv_in_kernel)
    lin("time_embedding.linear_1", c0, temb)
    lin("time_embedding.linear_2", temb, temb)
    if cfg.addition_embed_type == "text_time":
        lin("add_embedding.linear_1",
            cfg.projection_class_embeddings_input_dim, temb)
        lin("add_embedding.linear_2", temb, temb)

    chans = [c0] + list(cfg.block_out_channels)
    for i, (ic, oc) in enumerate(zip(chans, chans[1:])):
        p = f"down_blocks.{i}"
        cross = "CrossAttn" in cfg.down_block_types[i]
        cur = ic
        for j in range(cfg.layers_per_block[i]):
            resnet(f"{p}.resnets.{j}", cur, oc)
            cur = oc
            if cross:
                transformer2d(f"{p}.attentions.{j}", oc, i)
        if i < n - 1:
            conv(f"{p}.downsamplers.0.conv", oc, oc)

    cl = cfg.block_out_channels[-1]
    resnet("mid_block.resnets.0", cl, cl)
    transformer2d("mid_block.attentions.0", cl, n - 1)
    resnet("mid_block.resnets.1", cl, cl)

    chans = [c0] + list(cfg.block_out_channels) + [cl]
    triples = list(enumerate(zip(chans, chans[1:], chans[2:])))
    for idx, (i, (ic, oc, po)) in enumerate(reversed(triples)):
        p = f"up_blocks.{idx}"  # HF indexes deepest-first, like our tree
        cross = "CrossAttn" in cfg.up_block_types[i]
        n_layers = cfg.layers_per_block[i] + 1
        ins = [po] + [oc] * (n_layers - 1)
        skips = [oc] * (n_layers - 1) + [ic]
        for j, (a, b) in enumerate(zip(ins, skips)):
            resnet(f"{p}.resnets.{j}", a + b, oc)
            if cross:
                transformer2d(f"{p}.attentions.{j}", oc, i)
        if i > 0:
            conv(f"{p}.upsamplers.0.conv", oc, oc)

    gn("conv_norm_out", c0)
    conv("conv_out", c0, cfg.out_channels, cfg.conv_out_kernel)
    return out


def hf_sd_vae_state(cfg, rng=None) -> dict:
    """diffusers AutoencoderKL key layout for our AutoencoderConfig."""
    rng = rng or _rng(4)
    w = lambda *s: rng.randn(*s).astype(np.float32) * 0.02  # noqa: E731
    out = {}

    def gn(prefix, c):
        out[f"{prefix}.weight"] = w(c)
        out[f"{prefix}.bias"] = w(c)

    def lin(prefix, din, dout):
        out[f"{prefix}.weight"] = w(dout, din)
        out[f"{prefix}.bias"] = w(dout)

    def conv(prefix, cin, cout, k=3):
        out[f"{prefix}.weight"] = w(cout, cin, k, k)
        out[f"{prefix}.bias"] = w(cout)

    def resnet(prefix, cin, cout):
        gn(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout)
        gn(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut", cin, cout, 1)

    def attn(prefix, c):
        gn(f"{prefix}.group_norm", c)
        lin(f"{prefix}.to_q", c, c)
        lin(f"{prefix}.to_k", c, c)
        lin(f"{prefix}.to_v", c, c)
        lin(f"{prefix}.to_out.0", c, c)

    boc = list(cfg.block_out_channels)
    n = len(boc)
    conv("encoder.conv_in", cfg.in_channels, boc[0])
    chans = [boc[0]] + boc
    for i, (ic, oc) in enumerate(zip(chans, chans[1:])):
        p = f"encoder.down_blocks.{i}"
        cur = ic
        for j in range(cfg.layers_per_block):
            resnet(f"{p}.resnets.{j}", cur, oc)
            cur = oc
        if i < n - 1:
            conv(f"{p}.downsamplers.0.conv", oc, oc)
    resnet("encoder.mid_block.resnets.0", boc[-1], boc[-1])
    attn("encoder.mid_block.attentions.0", boc[-1])
    resnet("encoder.mid_block.resnets.1", boc[-1], boc[-1])
    gn("encoder.conv_norm_out", boc[-1])
    conv("encoder.conv_out", boc[-1], cfg.latent_channels_out)

    conv("decoder.conv_in", cfg.latent_channels_in, boc[-1])
    resnet("decoder.mid_block.resnets.0", boc[-1], boc[-1])
    attn("decoder.mid_block.attentions.0", boc[-1])
    resnet("decoder.mid_block.resnets.1", boc[-1], boc[-1])
    rev = list(reversed(boc))
    chans = [rev[0]] + rev
    for i, (ic, oc) in enumerate(zip(chans, chans[1:])):
        p = f"decoder.up_blocks.{i}"  # index 0 = deepest, matching our tree
        cur = ic
        for j in range(cfg.layers_per_block + 1):
            resnet(f"{p}.resnets.{j}", cur, oc)
            cur = oc
        if i < n - 1:
            conv(f"{p}.upsamplers.0.conv", oc, oc)
    gn("decoder.conv_norm_out", boc[0])
    conv("decoder.conv_out", boc[0], cfg.out_channels)

    out["quant_conv.weight"] = w(cfg.latent_channels_out, cfg.latent_channels_out, 1, 1)
    out["quant_conv.bias"] = w(cfg.latent_channels_out)
    out["post_quant_conv.weight"] = w(cfg.latent_channels_in, cfg.latent_channels_in, 1, 1)
    out["post_quant_conv.bias"] = w(cfg.latent_channels_in)
    return out


# ------------------------------------------------------------ cache layouts


_SPM_VOCAB = [
    ("▁", -2.0), ("▁the", -1.2), ("▁a", -1.1),
    ("▁photo", -1.8), ("▁of", -1.2), ("▁cat", -1.5),
    ("▁on", -1.3), ("▁mat", -1.7),
    ("t", -4.0), ("h", -4.1), ("e", -3.9), ("c", -4.2), ("a", -3.8),
    ("s", -4.0), ("o", -3.9), ("n", -4.0), ("m", -4.3), ("p", -4.2),
    ("f", -4.2), ("i", -3.9), ("u", -4.1), ("b", -4.4), ("l", -4.0),
    ("r", -4.0), ("d", -4.1), ("g", -4.3), ("w", -4.4), ("y", -4.2),
    ("k", -4.5), ("v", -4.5), ("x", -4.8), ("j", -4.8), ("q", -4.9),
    ("z", -4.9), ("▁t", -4.5), ("▁c", -4.6), ("▁s", -4.5),
    ("▁b", -4.7), ("▁d", -4.7), ("▁f", -4.6),
    ("▁m", -4.7), ("▁p", -4.7), ("▁w", -4.8),
    ("▁l", -4.8), ("▁g", -4.8), ("▁h", -4.8),
    ("▁n", -4.8), ("▁r", -4.8), ("▁o", -4.8),
    ("▁e", -4.8), ("▁i", -4.8), ("▁u", -4.9),
    ("▁v", -4.9), ("▁k", -4.9), ("▁y", -4.9),
    ("▁j", -5.0), ("▁x", -5.0), ("▁q", -5.0),
    ("▁z", -5.0), ("▁1", -4.6), ("▁2", -4.6),
    ("1", -4.9), ("2", -4.9), ("3", -4.9), ("4", -4.9),
]

_CLIP_CORPUS = [
    "a photo of a cat sitting on the mat",
    "the quick brown fox jumps over the lazy dog",
    "an oil painting of the sea and the sky",
    "it's a detailed photograph of the mountains",
] * 4


def _write_tokenizer_dirs(clip_dir, spm_path):
    from ..tokenizers.assets import write_clip_assets, write_spiece_model

    vocab, _ = write_clip_assets(clip_dir, _CLIP_CORPUS, num_merges=128)
    write_spiece_model(spm_path, _SPM_VOCAB, byte_fallback=True)
    return len(vocab)


def tiny_flux_configs(clip_vocab_size: int = 642, quantizable: bool = False):
    """Coherent tiny configs for the flux cache: CLIP pooled width feeds
    vec_in, T5 d_model feeds context_in, AE z_channels×4 = flow in_channels.
    clip_vocab_size must match the tokenizer assets written next to the
    checkpoint (make_flux_cache wires them together). quantizable=True lifts
    the flow hidden size to 512 so the int8 eligibility predicate
    (kernel in-dim % 512 == 0, txt2image.py:28-29) fires during the
    quantized-load rehearsal."""
    from ..models.clip.text import tiny_clip_config
    from ..models.flux.autoencoder import tiny_ae_config
    from ..models.flux.model import tiny_flux_config
    from ..models.t5.t5 import tiny_t5_config

    if quantizable:
        flow_cfg = tiny_flux_config(hidden_size=512, num_heads=4,
                                    axes_dim=(32, 48, 48))
    else:
        flow_cfg = tiny_flux_config()  # in 16, vec 24, ctx 32
    ae_cfg = tiny_ae_config()      # z 4 → packed 16
    clip_cfg = tiny_clip_config(model_dims=24, num_heads=4,
                                vocab_size=clip_vocab_size)
    t5_cfg = tiny_t5_config(d_model=32, d_kv=8, num_heads=4, d_ff=48,
                            vocab_size=512)
    return flow_cfg, ae_cfg, clip_cfg, t5_cfg


def make_flux_cache(root, quantizable: bool = False) -> tuple:
    """Full flux-schnell local_dir layout at tiny scale. Returns the configs
    to pass to load_flux_pipeline(configs=...)."""
    root = Path(root)
    clip_vocab = _write_tokenizer_dirs(root / "tokenizer",
                                       root / "tokenizer_2" / "spiece.model")
    flow_cfg, ae_cfg, clip_cfg, t5_cfg = tiny_flux_configs(clip_vocab,
                                                           quantizable)

    save_safetensors(root / "flux1-schnell.safetensors", bfl_flux_state(flow_cfg))
    save_safetensors(root / "ae.safetensors", bfl_flux_ae_state(ae_cfg))

    clip_sd, _ = hf_clip_state(
        clip_cfg.num_layers, clip_cfg.model_dims, clip_cfg.num_heads,
        clip_cfg.max_length, clip_cfg.vocab_size, act=clip_cfg.hidden_act,
    )
    save_safetensors(root / "text_encoder" / "model.safetensors", clip_sd)

    t5_sd, _ = hf_t5_encoder_state(t5_cfg)
    save_sharded_safetensors(root / "text_encoder_2", t5_sd, n_shards=2)
    return flow_cfg, ae_cfg, clip_cfg, t5_cfg


def make_sd_cache(root, xl: bool = False):
    """Full diffusers repo layout at tiny scale for load_sd_pipeline —
    configs come from the on-disk config.json files, exactly as with real
    checkpoints."""
    from ..models.sd.config import tiny_sd_ae_config, tiny_unet_config

    root = Path(root)
    unet_cfg = tiny_unet_config(
        addition_embed_type="text_time" if xl else None,
        addition_time_embed_dim=8 if xl else None,
        projection_class_embeddings_input_dim=(24 + 6 * 8) if xl else None,
        cross_attention_dim=(40, 40) if xl else (16, 16),
    )
    ae_cfg = tiny_sd_ae_config()

    (root / "unet").mkdir(parents=True, exist_ok=True)
    n = len(unet_cfg.block_out_channels)
    with open(root / "unet" / "config.json", "w") as f:
        json.dump({
            "in_channels": unet_cfg.in_channels,
            "out_channels": unet_cfg.out_channels,
            "block_out_channels": list(unet_cfg.block_out_channels),
            "layers_per_block": unet_cfg.layers_per_block[0],
            "transformer_layers_per_block": list(unet_cfg.transformer_layers_per_block),
            "attention_head_dim": list(unet_cfg.num_attention_heads),
            "cross_attention_dim": list(unet_cfg.cross_attention_dim),
            "norm_num_groups": unet_cfg.norm_num_groups,
            "down_block_types": list(unet_cfg.down_block_types),
            # HF lists up blocks deepest-first; loader reverses back
            "up_block_types": list(unet_cfg.up_block_types[::-1]),
            "addition_embed_type": unet_cfg.addition_embed_type,
            "addition_time_embed_dim": unet_cfg.addition_time_embed_dim,
            "projection_class_embeddings_input_dim":
                unet_cfg.projection_class_embeddings_input_dim,
        }, f)
    save_safetensors(root / "unet" / "diffusion_pytorch_model.safetensors",
                     hf_sd_unet_state(unet_cfg))

    (root / "vae").mkdir(parents=True, exist_ok=True)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({
            "in_channels": ae_cfg.in_channels,
            "out_channels": ae_cfg.out_channels,
            "latent_channels": ae_cfg.latent_channels_in,
            "block_out_channels": list(ae_cfg.block_out_channels),
            "layers_per_block": ae_cfg.layers_per_block,
            "norm_num_groups": ae_cfg.norm_num_groups,
            "scaling_factor": ae_cfg.scaling_factor,
        }, f)
    save_safetensors(root / "vae" / "diffusion_pytorch_model.safetensors",
                     hf_sd_vae_state(ae_cfg))

    from ..tokenizers.assets import write_clip_assets

    clip_vocab = len(write_clip_assets(root / "tokenizer", _CLIP_CORPUS,
                                       num_merges=128)[0])

    def text_encoder(sub, hidden, heads, projection):
        sd, cfg_json = hf_clip_state(
            2, hidden, heads, 16, clip_vocab,
            projection_dim=hidden if projection else None,
        )
        (root / sub).mkdir(parents=True, exist_ok=True)
        with open(root / sub / "config.json", "w") as f:
            json.dump(cfg_json, f)
        save_safetensors(root / sub / "model.safetensors", sd)

    # SDXL conditioning dims: concat of penultimate hidden states must equal
    # cross_attention_dim, pooled (projection of enc2) feeds text_time
    text_encoder("text_encoder", 16, 4, projection=False)
    if xl:
        from ..tokenizers.assets import write_clip_assets

        text_encoder("text_encoder_2", 24, 4, projection=True)
        write_clip_assets(root / "tokenizer_2", _CLIP_CORPUS, num_merges=128)

    (root / "scheduler").mkdir(parents=True, exist_ok=True)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({
            "beta_schedule": "scaled_linear", "beta_start": 0.00085,
            "beta_end": 0.012, "num_train_timesteps": 1000,
        }, f)
    return unet_cfg, ae_cfg


def make_musicgen_cache(root):
    """facebook/musicgen-* layout: config.json + torch state_dict.bin, plus
    local text_encoder/ and encodec/ subdirs (the loader prefers them over
    network snapshots when local_dir is given)."""
    import torch

    from ..models.musicgen.encodec import tiny_encodec_config
    from ..models.musicgen.model import tiny_musicgen_config
    from ..models.t5.t5 import tiny_t5_config

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    mg_cfg = tiny_musicgen_config()
    t5_cfg = tiny_t5_config(d_model=mg_cfg.text_d_model, vocab_size=512)
    # bandwidth sized so the codec builds num_codebooks quantizers
    enc_cfg = tiny_encodec_config(codebook_size=mg_cfg.codebook_size)
    bw = (mg_cfg.num_codebooks * enc_cfg.frame_rate * enc_cfg.codebook_nbits
          / 1000)
    enc_cfg = tiny_encodec_config(
        codebook_size=mg_cfg.codebook_size, target_bandwidths=(bw,),
    )

    with open(root / "config.json", "w") as f:
        json.dump({
            "decoder": {
                "num_codebooks": mg_cfg.num_codebooks,
                "bos_token_id": mg_cfg.bos_token_id,
                "hidden_size": mg_cfg.hidden_size,
                "num_attention_heads": mg_cfg.num_attention_heads,
                "num_hidden_layers": mg_cfg.num_hidden_layers,
                "ffn_dim": mg_cfg.ffn_dim,
            },
            "audio_encoder": {
                "codebook_size": mg_cfg.codebook_size,
                "sampling_rate": mg_cfg.sampling_rate,
                "_name_or_path": "synthetic/encodec_tiny",
            },
            "text_encoder": {
                "d_model": mg_cfg.text_d_model,
                "_name_or_path": "synthetic/t5-tiny",
            },
        }, f)
    best = {k: torch.tensor(v)
            for k, v in audiocraft_musicgen_state(mg_cfg).items()}
    torch.save({"best_state": best}, root / "state_dict.bin")

    t5_sd, t5_json = hf_t5_encoder_state(t5_cfg)
    (root / "text_encoder").mkdir(exist_ok=True)
    with open(root / "text_encoder" / "config.json", "w") as f:
        json.dump(t5_json, f)
    save_safetensors(root / "text_encoder" / "model.safetensors", t5_sd)
    from ..tokenizers.assets import write_spiece_model

    write_spiece_model(root / "text_encoder" / "spiece.model", _SPM_VOCAB,
                       byte_fallback=True)

    enc_sd, enc_json = hf_encodec_state(enc_cfg)
    (root / "encodec").mkdir(exist_ok=True)
    with open(root / "encodec" / "config.json", "w") as f:
        json.dump(enc_json, f)
    save_safetensors(root / "encodec" / "model.safetensors", enc_sd)
    return mg_cfg, t5_cfg, enc_cfg
