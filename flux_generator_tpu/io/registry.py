"""Model registry: hparams + HF repo/file locations per model name.

Mirrors the reference registries: flux/utils.py:30-95 (`configs`) and
stable_diffusion/stable_diffusion/model_io.py:17-46 (`_MODELS`). Env-var
checkpoint overrides FLUX_DEV / FLUX_SCHNELL / AE carry over.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

from ..models.clip.text import CLIPTextConfig
from ..models.flux.autoencoder import AutoEncoderConfig
from ..models.flux.model import FluxConfig
from ..models.t5.t5 import T5Config


@dataclasses.dataclass(frozen=True)
class FluxModelSpec:
    repo_id: str
    repo_flow: str
    repo_ae: str
    ckpt_env: Optional[str]
    flow: FluxConfig
    ae: AutoEncoderConfig
    t5_max_length: int


_FLUX_BASE = dict(
    in_channels=64,
    vec_in_dim=768,
    context_in_dim=4096,
    hidden_size=3072,
    mlp_ratio=4.0,
    num_heads=24,
    depth=19,
    depth_single_blocks=38,
    axes_dim=(16, 56, 56),
    theta=10_000,
    qkv_bias=True,
)

FLUX_MODELS = {
    "flux-dev": FluxModelSpec(
        repo_id="black-forest-labs/FLUX.1-dev",
        repo_flow="flux1-dev.safetensors",
        repo_ae="ae.safetensors",
        ckpt_env="FLUX_DEV",
        flow=FluxConfig(guidance_embed=True, **_FLUX_BASE),
        ae=AutoEncoderConfig(),
        t5_max_length=512,
    ),
    "flux-schnell": FluxModelSpec(
        repo_id="black-forest-labs/FLUX.1-schnell",
        repo_flow="flux1-schnell.safetensors",
        repo_ae="ae.safetensors",
        ckpt_env="FLUX_SCHNELL",
        flow=FluxConfig(guidance_embed=False, **_FLUX_BASE),
        ae=AutoEncoderConfig(),
        t5_max_length=256,
    ),
}

# CLIP-L and T5-XXL as used by Flux
FLUX_CLIP_CONFIG = CLIPTextConfig(
    num_layers=12, model_dims=768, num_heads=12, max_length=77, vocab_size=49408,
    hidden_act="quick_gelu",
)
FLUX_T5_CONFIG = T5Config(
    vocab_size=32128,
    num_layers=24,
    num_heads=64,
    relative_attention_num_buckets=32,
    d_kv=64,
    d_model=4096,
    feed_forward_proj="gated-gelu",
    tie_word_embeddings=False,
    d_ff=10240,
)

SD_MODELS = {
    "sdxl-turbo": {
        "repo_id": "stabilityai/sdxl-turbo",
    },
    "stable-diffusion-2-1-base": {
        "repo_id": "stabilityai/stable-diffusion-2-1-base",
    },
}

MUSICGEN_REPO = "facebook/musicgen-medium"
ENCODEC_REPO = "mlx-community/encodec-32khz-float32"


def flux_configs(name: str):
    spec = FLUX_MODELS[name]
    return spec.flow, spec.ae, FLUX_CLIP_CONFIG, FLUX_T5_CONFIG


def flux_ckpt_override(name: str) -> Optional[str]:
    env = FLUX_MODELS[name].ckpt_env
    return os.getenv(env) if env else None


def ae_ckpt_override() -> Optional[str]:
    return os.getenv("AE")
