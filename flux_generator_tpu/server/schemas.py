"""API request/response schemas (parity: flux_app.py:47-62)."""

from __future__ import annotations

from typing import List, Optional

from pydantic import BaseModel


class SDAPIRequest(BaseModel):
    prompt: str
    negative_prompt: Optional[str] = None
    width: int = 512
    height: int = 512
    steps: Optional[int] = None
    cfg_scale: float = 4.0
    batch_size: int = 1
    n_iter: int = 1
    seed: int = -1
    # "schnell", "dev", "flux-schnell", "flux-dev",
    # "stabilityai/stable-diffusion-2-1-base", "stabilityai/sdxl-turbo"
    model: str = "schnell"


class SDAPIResponse(BaseModel):
    images: List[str]
    parameters: dict
    info: str


class Img2ImgRequest(BaseModel):
    prompt: str
    init_images: List[str]  # base64 or data-URL PNGs
    negative_prompt: Optional[str] = None
    denoising_strength: float = 0.75
    width: int = 512
    height: int = 512
    steps: Optional[int] = None
    cfg_scale: float = 7.5
    batch_size: int = 1
    seed: int = -1
    model: str = "stabilityai/stable-diffusion-2-1-base"


class MusicRequest(BaseModel):
    prompt: str
    max_steps: int = 500
    top_k: int = 250
    temperature: float = 1.0
    guidance: float = 3.0
    seed: int = -1
    # samples share ONE batched AR loop (weight reads amortize: measured
    # 7.8/13.8/21.7 aggregate audio-sec/sec at n=1/2/4 — BENCH_RESULTS)
    n_samples: int = 1
