#!/usr/bin/env python
"""Per-layer activation checksum harness (SURVEY §7 hard part 6 / VERDICT r1
missing #1).

Weight-mapping bugs (geglu splits, in_proj splits, convtr flips) only show up
with real activations. This harness makes real-checkpoint validation a
10-minute job the moment weights land:

  1. On a machine with the reference implementation + weights, record the
     same fingerprints there (mean / abs-mean / std per block at a fixed
     input) — the stats are implementation-agnostic.
  2. Here: `python scripts/checksum_activations.py --family flux --real`
     (drops --real / adds --tiny for random weights; random mode is the
     self-test and the format demo).
  3. Diff the two JSON files; a wrong weight mapping shows up as divergence
     at the FIRST affected layer rather than noise at the output.

Outputs one JSON file per family under --out (default ./checksums/).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _js(stats) -> list:
    return np.asarray(stats, dtype=np.float64).round(6).tolist()


def flux_checksums(tiny: bool, real: bool) -> dict:
    from flux_generator_tpu.models.flux.model import flux_forward
    from flux_generator_tpu.pipelines.flux import (
        FluxPipeline,
        latent_ids,
        pack_latents,
    )

    if real:
        pipe = FluxPipeline.from_pretrained("flux-schnell")
    else:
        pipe = FluxPipeline.random_init("flux-schnell", tiny=tiny,
                                        dtype=jnp.float32 if tiny else jnp.bfloat16)
    cfg = pipe.flow_cfg
    b, h, w = 1, 8, 8
    # inputs from numpy's PCG64 — bit-reproducible on ANY platform, so the
    # reference-side recorder (scripts/record_reference_fingerprints.py,
    # MLX on a Mac) feeds the model the identical arrays
    rng = np.random.default_rng(0)
    img = pack_latents(jnp.asarray(
        rng.standard_normal((b, h, w, cfg.in_channels // 4)), pipe.dtype
    ))
    txt = jnp.asarray(
        rng.standard_normal((b, 16, cfg.context_in_dim)), pipe.dtype
    )
    vec = jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), pipe.dtype)
    out, stats = flux_forward(
        pipe.params["flow"], cfg, img, latent_ids(b, h, w), txt,
        jnp.zeros((b, 16, 3), jnp.int32), jnp.full((b,), 0.5, pipe.dtype),
        vec,
        guidance=jnp.full((b,), 4.0, pipe.dtype) if cfg.guidance_embed else None,
        capture_stats=True,
    )
    return {
        "family": "flux", "input": "np.default_rng(0), 8x8 latent, 16 txt tokens",
        "double_blocks_img_txt": _js(stats["double"]),
        "single_blocks": _js(stats["single"]),
        "final": _js(stats["final"]),
    }


def t5_checksums(tiny: bool, real: bool) -> dict:
    from flux_generator_tpu.models.t5.t5 import (
        T5Config,
        init_t5_encoder,
        t5_encode,
        tiny_t5_config,
    )

    if real:
        from flux_generator_tpu.pipelines.flux import FluxPipeline

        pipe = FluxPipeline.from_pretrained("flux-schnell")
        params, cfg = pipe.params["t5"], pipe.t5_cfg
    else:
        cfg = tiny_t5_config() if tiny else T5Config()
        params = init_t5_encoder(jax.random.PRNGKey(0), cfg,
                                 jnp.float32 if tiny else jnp.bfloat16)
    tokens = jnp.arange(1, 9, dtype=jnp.int32)[None, :] % cfg.vocab_size
    out, stats = t5_encode(params, cfg, tokens, capture_stats=True)
    return {
        "family": "t5", "input": "tokens arange(1,9)",
        "layers": _js(stats),
        "final": _js([np.asarray(out, np.float64).mean(),
                      np.abs(np.asarray(out, np.float64)).mean(),
                      np.asarray(out, np.float64).std()]),
    }


def clip_checksums(tiny: bool, real: bool) -> dict:
    from flux_generator_tpu.models.clip.text import (
        CLIPTextConfig,
        clip_text_forward,
        init_clip_text,
        tiny_clip_config,
    )

    if real:
        from flux_generator_tpu.pipelines.flux import FluxPipeline

        pipe = FluxPipeline.from_pretrained("flux-schnell")
        params, cfg = pipe.params["clip"], pipe.clip_cfg
    else:
        cfg = tiny_clip_config() if tiny else CLIPTextConfig()
        params = init_clip_text(jax.random.PRNGKey(0), cfg,
                                jnp.float32 if tiny else jnp.bfloat16)
    tokens = (jnp.arange(1, 12, dtype=jnp.int32)[None, :] % cfg.vocab_size)
    out = clip_text_forward(params, cfg, tokens)
    hs = np.asarray(out["hidden_states"], np.float64)  # (L, B, N, D)
    per_layer = np.stack(
        [hs.mean(axis=(1, 2, 3)), np.abs(hs).mean(axis=(1, 2, 3)), hs.std(axis=(1, 2, 3))],
        axis=-1,
    )
    return {
        "family": "clip", "input": "tokens arange(1,12)",
        "layers": per_layer.round(6).tolist(),
        "pooled": _js([np.asarray(out["pooled_output"], np.float64).mean(),
                       np.abs(np.asarray(out["pooled_output"], np.float64)).mean(),
                       np.asarray(out["pooled_output"], np.float64).std()]),
    }


def encodec_checksums(tiny: bool, real: bool) -> dict:
    from flux_generator_tpu.models.musicgen.encodec import EncodecModel

    if real:
        model = EncodecModel.from_pretrained()
    else:
        model = EncodecModel.random_init()
    nq = len(model.params["quantizer"])
    codes = (jnp.arange(nq * 10, dtype=jnp.int32).reshape(1, nq, 10)
             % model.cfg.codebook_size)[None]
    audio = np.asarray(model.decode(codes, [None]), np.float64)
    return {
        "family": "encodec", "input": "codes arange(40) % K",
        "decode": _js([audio.mean(), np.abs(audio).mean(), audio.std()]),
    }


FAMILIES = {
    "flux": flux_checksums,
    "t5": t5_checksums,
    "clip": clip_checksums,
    "encodec": encodec_checksums,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=[*FAMILIES, "all"], default="all")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random configs (CPU self-test)")
    ap.add_argument("--real", action="store_true",
                    help="load real checkpoints via from_pretrained")
    ap.add_argument("--out", default="checksums")
    args = ap.parse_args(argv)

    if args.tiny:
        # tiny mode is the CPU self-test; don't pay tunnel compiles for it
        # (the axon plugin ignores JAX_PLATFORMS — set it programmatically)
        jax.config.update("jax_platforms", "cpu")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    names = list(FAMILIES) if args.family == "all" else [args.family]
    for name in names:
        result = FAMILIES[name](tiny=args.tiny, real=args.real)
        path = out_dir / f"{name}{'_tiny' if args.tiny else ''}.json"
        path.write_text(json.dumps(result, indent=1))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
