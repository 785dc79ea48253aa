"""Checkpoint loaders: HF Hub (or local dir) → assembled pipelines.

Parity with flux/utils.py:98-210 and stable_diffusion/.../model_io.py:185-330:
download safetensors (+ sharded index.json), sanitize keys, build configs
from the HF json, construct the pipeline. Env-var overrides FLUX_DEV /
FLUX_SCHNELL / AE honored (flux/utils.py:35,50,67,82).

Structure validation uses jax.eval_shape on the random init — zero-cost shape
templates — so key mismatches fail loudly at load, not at trace time
(SURVEY §7 "weight-mapping fidelity" hard part).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import registry, sanitize
from .params import unflatten


# ------------------------------------------------------------ safetensors


def load_safetensors(path) -> dict:
    from safetensors import safe_open

    out = {}
    with safe_open(str(path), framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_sharded_safetensors(directory, index_file) -> dict:
    """Multi-file checkpoints via *.index.json (flux/utils.py:176-188)."""
    directory = Path(directory)
    with open(directory / index_file) as f:
        index = json.load(f)
    out = {}
    for shard in sorted(set(index["weight_map"].values())):
        out.update(load_safetensors(directory / shard))
    return out


def hf_download(repo_id: str, filename: str) -> str:
    from huggingface_hub import hf_hub_download

    return hf_hub_download(repo_id, filename)


def hf_snapshot(repo_id: str, allow_patterns=None) -> Path:
    from huggingface_hub import snapshot_download

    return Path(snapshot_download(repo_id=repo_id, allow_patterns=allow_patterns))


# ------------------------------------------------------------ structure check


def conform_params(flat_nested, template_treedef_params, name: str, drop_extra=True):
    """Match an assembled param tree against an eval_shape template: drop
    extra branches (e.g. schnell checkpoints ship unused guidance_in), fail
    on missing ones, and verify shapes."""
    template = template_treedef_params

    def walk(got, want, path):
        if isinstance(want, dict):
            if not isinstance(got, dict):
                raise ValueError(f"{name}: expected dict at {path}, got {type(got)}")
            out = {}
            for k, w in want.items():
                if k not in got:
                    raise ValueError(f"{name}: missing param {path}/{k}")
                out[k] = walk(got[k], w, f"{path}/{k}")
            return out
        if isinstance(want, list):
            if len(got) != len(want):
                raise ValueError(
                    f"{name}: list length mismatch at {path}: {len(got)} vs {len(want)}"
                )
            return [walk(g, w, f"{path}/{i}") for i, (g, w) in enumerate(zip(got, want))]
        got_shape = tuple(np.asarray(got).shape)
        if got_shape != tuple(want.shape):
            raise ValueError(
                f"{name}: shape mismatch at {path}: checkpoint {got_shape} vs "
                f"model {tuple(want.shape)}"
            )
        return got

    return walk(flat_nested, template, name)


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: jnp.asarray(x, dtype)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        else jnp.asarray(x),
        tree,
    )


# ------------------------------------------------------------ Flux


def load_flux_pipeline(name: str = "flux-schnell", dtype=jnp.bfloat16,
                       local_dir: Optional[str] = None, quantize: bool = False,
                       configs=None):
    from ..models.clip.text import init_clip_text
    from ..models.flux.autoencoder import init_autoencoder
    from ..models.flux.model import init_flux
    from ..models.t5.t5 import init_t5_encoder
    from ..pipelines.flux import FluxPipeline
    from ..tokenizers.clip_bpe import CLIPTokenizer
    from ..tokenizers.sentencepiece_unigram import SentencePieceUnigramTokenizer

    spec = registry.FLUX_MODELS[name]
    # `configs` override: same load machinery (file discovery, sharded index,
    # sanitize, conform, cast/quantize, tokenizers) against non-registry
    # hparams — the synthetic-checkpoint dress rehearsal uses tiny ones
    flow_cfg, ae_cfg, clip_cfg, t5_cfg = configs or registry.flux_configs(name)
    key = jax.random.PRNGKey(0)

    # flow
    ckpt = registry.flux_ckpt_override(name)
    flow_file = ckpt or (
        Path(local_dir) / spec.repo_flow if local_dir else hf_download(spec.repo_id, spec.repo_flow)
    )
    flow_flat = sanitize.sanitize_flux(load_safetensors(flow_file))
    flow = unflatten(flow_flat, sanitize.FLUX_STACKS)
    tmpl = jax.eval_shape(lambda: init_flux(key, flow_cfg))
    flow = conform_params(flow, tmpl, "flux-flow")

    # autoencoder
    ae_file = registry.ae_ckpt_override() or (
        Path(local_dir) / spec.repo_ae if local_dir else hf_download(spec.repo_id, spec.repo_ae)
    )
    ae_flat = sanitize.sanitize_flux_ae(load_safetensors(ae_file))
    ae = unflatten(ae_flat, ())
    ae = conform_params(ae, jax.eval_shape(lambda: init_autoencoder(key, ae_cfg)), "flux-ae")

    # CLIP-L text encoder + tokenizer
    clip_dir = Path(local_dir) / "text_encoder" if local_dir else hf_snapshot(
        spec.repo_id, ["text_encoder/*", "tokenizer/*"]
    )
    clip_root = clip_dir if local_dir else clip_dir / "text_encoder"
    clip_flat = sanitize.sanitize_clip(load_safetensors(clip_root / "model.safetensors"))
    clip = unflatten(clip_flat, sanitize.CLIP_STACKS)
    clip = conform_params(clip, jax.eval_shape(lambda: init_clip_text(key, clip_cfg)), "clip")
    tok_dir = (Path(local_dir) if local_dir else clip_dir) / "tokenizer"
    clip_tok = CLIPTokenizer.from_pretrained_dir(tok_dir)

    # T5-XXL encoder + tokenizer (sharded)
    t5_dir = Path(local_dir) / "text_encoder_2" if local_dir else hf_snapshot(
        spec.repo_id, ["text_encoder_2/*", "tokenizer_2/*"]
    )
    t5_root = t5_dir if local_dir else t5_dir / "text_encoder_2"
    if (t5_root / "model.safetensors.index.json").exists():
        raw = load_sharded_safetensors(t5_root, "model.safetensors.index.json")
    else:
        raw = load_safetensors(t5_root / "model.safetensors")
    t5_flat = sanitize.sanitize_t5(raw)
    t5 = unflatten(t5_flat, sanitize.T5_STACKS)
    t5 = conform_params(t5, jax.eval_shape(lambda: init_t5_encoder(key, t5_cfg)), "t5")
    t5_tok_dir = (Path(local_dir) if local_dir else t5_dir) / "tokenizer_2"
    t5_tok = SentencePieceUnigramTokenizer.from_file(
        t5_tok_dir / "spiece.model", max_length=spec.t5_max_length
    )

    if quantize:
        # weight-only quantization on the big matmuls: int8 (quantize=True/
        # "int8") fits Flux-12B + T5-XXL on one 16 GB v5e; "int4" (group-128
        # nibble-packed flow) is the memory planner's co-residency tier —
        # flux + SD(XL) int8 together (server/memory.py). Quantization
        # streams per-tensor from the host tree BEFORE device transfer —
        # putting the full bf16 flow on device first (24 GB) could never
        # fit the chip the quantized model is meant for.
        from ..ops.quant import quantize_tree_to_device

        if quantize == "int4":
            flow_q = quantize_tree_to_device(
                flow, bits=4, group_size=128, pack=True, dtype=dtype
            )
        else:
            flow_q = quantize_tree_to_device(flow, dtype=dtype)
        params = {
            "flow": flow_q,
            "ae": cast_tree(ae, dtype),
            "clip": cast_tree(clip, dtype),
            "t5": quantize_tree_to_device(t5, dtype=dtype),
        }
    else:
        params = {
            "flow": cast_tree(flow, dtype),
            "ae": cast_tree(ae, dtype),
            "clip": cast_tree(clip, dtype),
            "t5": cast_tree(t5, dtype),
        }
    return FluxPipeline(
        name, params, flow_cfg, ae_cfg, clip_cfg, t5_cfg,
        clip_tokenizer=clip_tok, t5_tokenizer=t5_tok, dtype=dtype,
    )


# ------------------------------------------------------------ SD


def _sd_files(model: str, local_dir: Optional[str]):
    if local_dir:
        root = Path(local_dir)
        return lambda rel: root / rel
    return lambda rel: Path(hf_download(model, rel))


def _sd_quant_predicate(p) -> bool:
    """SD int8 policy: dense kernels only ((in, out) or scan-stacked
    (depth, in, out)) with MXU-friendly input dims — the analog of the
    reference's nn.quantize(unet), which also only quantizes Linear layers
    (stable_diffusion/txt2image.py:36-56); 4-D conv kernels stay bf16
    because conv2d has no dequant path (and convs are bandwidth-cheap
    relative to the attention/ff matmuls)."""
    k = p["kernel"]
    return k.ndim <= 3 and k.shape[-2] % 512 == 0


def load_sd_pipeline(model: str = "stabilityai/stable-diffusion-2-1-base",
                     cls=None, dtype=jnp.bfloat16, local_dir: Optional[str] = None,
                     quantize: bool = False):
    from ..models.clip.text import CLIPTextConfig, init_clip_text
    from ..models.sd.config import AutoencoderConfig, DiffusionConfig, UNetConfig
    from ..models.sd.unet import init_unet
    from ..models.sd.vae import init_sd_vae
    from ..pipelines.sd import StableDiffusion, StableDiffusionXL
    from ..tokenizers.clip_bpe import CLIPTokenizer

    get = _sd_files(model, local_dir)
    key = jax.random.PRNGKey(0)
    is_xl = "xl" in model.lower()
    cls = cls or (StableDiffusionXL if is_xl else StableDiffusion)

    with open(get("unet/config.json")) as f:
        uc = json.load(f)
    n = len(uc["block_out_channels"])
    unet_cfg = UNetConfig(
        in_channels=uc["in_channels"],
        out_channels=uc["out_channels"],
        block_out_channels=tuple(uc["block_out_channels"]),
        layers_per_block=tuple([uc["layers_per_block"]] * n),
        transformer_layers_per_block=tuple(
            uc.get("transformer_layers_per_block", [1] * n)
            if isinstance(uc.get("transformer_layers_per_block", 1), list)
            else [uc.get("transformer_layers_per_block", 1)] * n
        ),
        num_attention_heads=tuple(
            uc["attention_head_dim"]
            if isinstance(uc["attention_head_dim"], list)
            else [uc["attention_head_dim"]] * n
        ),
        cross_attention_dim=tuple(
            uc["cross_attention_dim"]
            if isinstance(uc["cross_attention_dim"], list)
            else [uc["cross_attention_dim"]] * n
        ),
        norm_num_groups=uc["norm_num_groups"],
        down_block_types=tuple(uc["down_block_types"]),
        # HF lists up blocks deepest-first; our config indexes by level
        # (model_io.py:212 does the same reversal)
        up_block_types=tuple(uc["up_block_types"][::-1]),
        addition_embed_type=uc.get("addition_embed_type"),
        addition_time_embed_dim=uc.get("addition_time_embed_dim"),
        projection_class_embeddings_input_dim=uc.get(
            "projection_class_embeddings_input_dim"
        ),
    )
    unet_flat = sanitize.sanitize_sd_unet(
        load_safetensors(get("unet/diffusion_pytorch_model.safetensors"))
    )
    # transformer blocks inside each attention site are scan-stacked
    unet = unflatten(
        unet_flat,
        ("down_blocks.attentions.blocks", "up_blocks.attentions.blocks",
         "mid_blocks.blocks"),
    )
    unet = conform_params(unet, jax.eval_shape(lambda: init_unet(key, unet_cfg)), "sd-unet")

    with open(get("vae/config.json")) as f:
        vc = json.load(f)
    ae_cfg = AutoencoderConfig(
        in_channels=vc["in_channels"],
        out_channels=vc["out_channels"],
        latent_channels_out=2 * vc["latent_channels"],
        latent_channels_in=vc["latent_channels"],
        block_out_channels=tuple(vc["block_out_channels"]),
        layers_per_block=vc["layers_per_block"],
        norm_num_groups=vc["norm_num_groups"],
        scaling_factor=vc.get("scaling_factor", 0.18215),
    )
    vae_flat = sanitize.sanitize_sd_vae(
        load_safetensors(get("vae/diffusion_pytorch_model.safetensors"))
    )
    vae = unflatten(vae_flat, ())
    vae = conform_params(vae, jax.eval_shape(lambda: init_sd_vae(key, ae_cfg)), "sd-vae")

    def load_text_encoder(cfg_rel, weights_rel, with_projection=False):
        with open(get(cfg_rel)) as f:
            tc = json.load(f)
        cfg = CLIPTextConfig(
            num_layers=tc["num_hidden_layers"],
            model_dims=tc["hidden_size"],
            num_heads=tc["num_attention_heads"],
            max_length=tc["max_position_embeddings"],
            vocab_size=tc["vocab_size"],
            hidden_act=tc["hidden_act"],
            projection_dim=tc.get("projection_dim") if with_projection else None,
        )
        flat = sanitize.sanitize_clip(load_safetensors(get(weights_rel)))
        p = unflatten(flat, sanitize.CLIP_STACKS)
        return conform_params(
            p, jax.eval_shape(lambda: init_clip_text(key, cfg)), "sd-clip"
        ), cfg

    clip, clip_cfg = load_text_encoder("text_encoder/config.json", "text_encoder/model.safetensors")
    if quantize:
        # serving memory-planner policy (server/memory.py): int8 weight-only
        # on the UNet/CLIP dense layers so SD(XL) co-resides with flux int8
        from ..ops.quant import quantize_tree_to_device

        def q(tree):
            return quantize_tree_to_device(
                tree, predicate=_sd_quant_predicate, dtype=dtype
            )
    else:
        def q(tree):
            return cast_tree(tree, dtype)
    params = {
        "unet": q(unet),
        "vae": cast_tree(vae, dtype),
        "clip": q(clip),
    }
    clip_cfgs = [clip_cfg]
    tokenizers = [
        CLIPTokenizer.from_files(get("tokenizer/vocab.json"), get("tokenizer/merges.txt"))
    ]
    if is_xl:
        clip2, clip2_cfg = load_text_encoder(
            "text_encoder_2/config.json", "text_encoder_2/model.safetensors",
            with_projection=True,
        )
        params["clip_2"] = cast_tree(clip2, dtype)
        clip_cfgs.append(clip2_cfg)
        tokenizers.append(
            CLIPTokenizer.from_files(
                get("tokenizer_2/vocab.json"), get("tokenizer_2/merges.txt")
            )
        )

    with open(get("scheduler/scheduler_config.json")) as f:
        sc = json.load(f)
    diff_cfg = DiffusionConfig(
        beta_schedule=sc["beta_schedule"],
        beta_start=sc["beta_start"],
        beta_end=sc["beta_end"],
        num_train_steps=sc["num_train_timesteps"],
    )
    return cls(model, params, unet_cfg, ae_cfg, clip_cfgs, diff_cfg,
               tokenizers=tokenizers, dtype=dtype)


# ------------------------------------------------------------ MusicGen


def load_musicgen_pipeline(repo: str = "facebook/musicgen-medium", dtype=jnp.bfloat16,
                           local_dir: Optional[str] = None, quantize: bool = False):
    """MusicGen ships torch state_dict.bin; converted here at load (one-time)
    — the reference does the same via torch.load (musicgen.py:352)."""
    from ..models.musicgen.encodec import EncodecConfig, EncodecModel, decoder_spec, encoder_spec, init_encodec
    from ..models.musicgen.model import MusicGenConfig, init_musicgen
    from ..models.t5.t5 import T5Config, init_t5_encoder
    from ..pipelines.musicgen import MusicGenPipeline
    from ..tokenizers.sentencepiece_unigram import SentencePieceUnigramTokenizer

    path = Path(local_dir) if local_dir else hf_snapshot(
        repo, ["*.json", "state_dict.bin"]
    )
    with open(path / "config.json") as f:
        config = json.load(f)
    dec = config["decoder"]
    cfg = MusicGenConfig(
        num_codebooks=dec["num_codebooks"],
        codebook_size=config["audio_encoder"]["codebook_size"],
        bos_token_id=dec["bos_token_id"],
        hidden_size=dec["hidden_size"],
        num_attention_heads=dec["num_attention_heads"],
        num_hidden_layers=dec["num_hidden_layers"],
        ffn_dim=dec["ffn_dim"],
        text_d_model=config["text_encoder"]["d_model"],
        sampling_rate=config["audio_encoder"]["sampling_rate"],
    )
    converted = path / "model.fgt.safetensors"
    if converted.exists():
        # pre-converted by scripts/convert_musicgen.py — no torch needed
        flat = load_safetensors(converted)
    else:
        import torch

        weights = torch.load(
            path / "state_dict.bin", weights_only=True, map_location="cpu"
        )["best_state"]
        weights = {k: v.numpy() for k, v in weights.items()}
        flat = sanitize.sanitize_musicgen(weights)
    key = jax.random.PRNGKey(0)
    params = unflatten(flat, sanitize.MUSICGEN_STACKS)
    params = conform_params(
        params, jax.eval_shape(lambda: init_musicgen(key, cfg)), "musicgen"
    )

    # T5 text encoder from the HF repo named in the config (a local cache may
    # carry it as a text_encoder/ subdir — real multi-repo layouts land there
    # via validate_real.py's expected layout)
    t5_repo = config["text_encoder"]["_name_or_path"]
    if local_dir and (path / "text_encoder").exists():
        t5_path = path / "text_encoder"
    else:
        t5_path = hf_snapshot(t5_repo, ["*.json", "*.safetensors", "*.model"])
    with open(t5_path / "config.json") as f:
        t5_cfg = T5Config.from_dict(json.load(f))
    t5_flat = sanitize.sanitize_t5(load_safetensors(t5_path / "model.safetensors"))
    t5 = unflatten(t5_flat, sanitize.T5_STACKS)
    t5.pop("decoder", None)
    t5.pop("lm_head", None)
    t5 = conform_params(t5, jax.eval_shape(lambda: init_t5_encoder(key, t5_cfg)), "t5")
    tokenizer = SentencePieceUnigramTokenizer.from_file(t5_path / "spiece.model")

    # EnCodec from the mlx-community float32 conversion (reference musicgen.py:220-224)
    enc_name = config["audio_encoder"]["_name_or_path"].split("/")[-1].replace("_", "-")
    if local_dir and (path / "encodec").exists():
        enc_path = path / "encodec"
    else:
        enc_path = hf_snapshot(f"mlx-community/{enc_name}-float32", ["*.json", "*.safetensors"])
    with open(enc_path / "config.json") as f:
        enc_cfg = EncodecConfig.from_dict(json.load(f))
    e_spec, d_spec = encoder_spec(enc_cfg), decoder_spec(enc_cfg)
    enc_flat = sanitize.sanitize_encodec(
        load_safetensors(enc_path / "model.safetensors"), e_spec, d_spec
    )
    enc_params = unflatten(enc_flat, ())
    enc_params = conform_params(
        enc_params, jax.eval_shape(lambda: init_encodec(key, enc_cfg)), "encodec"
    )
    codec = EncodecModel(enc_cfg, cast_tree(enc_params, jnp.float32))

    if quantize:
        # int8 weights ~1.5x the AR step rate (HBM-bound loop, BENCH_RESULTS);
        # streamed per-tensor from the host tree before device transfer
        from ..ops.quant import quantize_tree_to_device

        params = quantize_tree_to_device(params, dtype=dtype)
        t5 = quantize_tree_to_device(t5, dtype=dtype)
    else:
        params = cast_tree(params, dtype)
        t5 = cast_tree(t5, dtype)
    return MusicGenPipeline(
        cfg, params, t5_cfg, t5, codec, tokenizer=tokenizer, dtype=dtype,
    )
