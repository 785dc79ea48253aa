#!/usr/bin/env python
"""Record per-layer activation fingerprints from the REFERENCE (MLX) impl.

Run this ON A MACHINE THAT CAN RUN THE REFERENCE (Apple Silicon, mlx
installed, real checkpoints in the HF cache):

    python record_reference_fingerprints.py --reference ~/flux-generator \
        --family all --out checksums_ref

It emits one JSON per family in EXACTLY the format
``scripts/checksum_activations.py --real`` writes on the TPU side, so the
two directories diff directly:

    python scripts/checksum_activations.py --real --out checksums_tpu
    python scripts/validate_real.py --fingerprints checksums_ref ...

Inputs are generated with ``np.random.default_rng(0)`` — bit-identical on
both platforms — and fed to the reference models via class-level ``__call__``
patches that tap each block's output (no reference code is modified on
disk). Stats per tap: (mean, |x| mean, std) in float32.

The ``--selfcheck`` mode runs WITHOUT mlx/reference: it only verifies that
the numpy input construction (incl. 2×2 latent packing) matches the TPU
harness bit-for-bit, so input drift between the two scripts is impossible.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


# --------------------------------------------------------- shared inputs
# These MUST stay in lockstep with scripts/checksum_activations.py.


def flux_inputs(in_channels=64, context_in_dim=4096, vec_in_dim=768):
    rng = np.random.default_rng(0)
    b, h, w = 1, 8, 8
    lat = rng.standard_normal((b, h, w, in_channels // 4))
    txt = rng.standard_normal((b, 16, context_in_dim))
    vec = rng.standard_normal((b, vec_in_dim))
    img = pack_latents_np(lat)
    img_ids = latent_ids_np(b, h, w)
    txt_ids = np.zeros((b, 16, 3), np.int32)
    t = np.full((b,), 0.5)
    return img, img_ids, txt, txt_ids, t, vec


def pack_latents_np(x):
    """numpy twin of pipelines.flux.pack_latents (2×2 patch packing)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h * w // 4, c * 4)


def latent_ids_np(batch, h, w):
    j, k = np.meshgrid(np.arange(h // 2), np.arange(w // 2), indexing="ij")
    ids = np.stack([np.zeros_like(j), j, k], axis=-1).reshape(1, -1, 3)
    return np.broadcast_to(ids, (batch, h * w // 4, 3)).astype(np.int32)


T5_TOKENS = np.arange(1, 9, dtype=np.int32)[None, :]
CLIP_TOKENS = np.arange(1, 12, dtype=np.int32)[None, :]


def encodec_codes(nq, codebook_size):
    return (np.arange(nq * 10, dtype=np.int32).reshape(1, nq, 10)
            % codebook_size)[None]


# --------------------------------------------------------- recording


def _js(x) -> list:
    return np.asarray(x, dtype=np.float64).round(6).tolist()


def _mx_stats(x):
    import mlx.core as mx

    xf = np.asarray(x.astype(mx.float32))
    return [float(xf.mean()), float(np.abs(xf).mean()), float(xf.std())]


def record_flux(model_name: str) -> dict:
    import mlx.core as mx
    from flux import layers as L
    from flux.utils import configs, load_flow_model

    model = load_flow_model(model_name)
    cfg = configs[model_name].params
    img, img_ids, txt, txt_ids, t, vec = flux_inputs(
        cfg.in_channels, cfg.context_in_dim, cfg.vec_in_dim
    )
    dbl, sgl = [], []
    orig_d, orig_s = L.DoubleStreamBlock.__call__, L.SingleStreamBlock.__call__

    def d_call(self, *a, **k):
        i, tx = orig_d(self, *a, **k)
        mx.eval(i, tx)
        dbl.append([_mx_stats(i), _mx_stats(tx)])
        return i, tx

    def s_call(self, *a, **k):
        out = orig_s(self, *a, **k)
        mx.eval(out)
        sgl.append(_mx_stats(out))
        return out

    L.DoubleStreamBlock.__call__ = d_call
    L.SingleStreamBlock.__call__ = s_call
    try:
        dt = mx.bfloat16
        out = model(
            img=mx.array(img).astype(dt),
            img_ids=mx.array(img_ids),
            txt=mx.array(txt).astype(dt),
            txt_ids=mx.array(txt_ids),
            timesteps=mx.array(t).astype(dt),
            y=mx.array(vec).astype(dt),
            guidance=(mx.array(np.full((1,), 4.0)).astype(dt)
                      if cfg.guidance_embed else None),
        )
        mx.eval(out)
    finally:
        L.DoubleStreamBlock.__call__ = orig_d
        L.SingleStreamBlock.__call__ = orig_s
    return {
        "family": "flux",
        "input": "np.default_rng(0), 8x8 latent, 16 txt tokens",
        "double_blocks_img_txt": _js(dbl),
        "single_blocks": _js(sgl),
        "final": _mx_stats(out),
    }


def record_t5(model_name: str) -> dict:
    import mlx.core as mx
    from flux import t5 as T
    from flux.utils import load_t5

    model = load_t5(model_name)
    layers = []
    orig = T.TransformerEncoderLayer.__call__

    def call(self, *a, **k):
        out = orig(self, *a, **k)
        mx.eval(out)
        layers.append(_mx_stats(out))
        return out

    T.TransformerEncoderLayer.__call__ = call
    try:
        out = model(mx.array(T5_TOKENS))
        mx.eval(out)
    finally:
        T.TransformerEncoderLayer.__call__ = orig
    return {
        "family": "t5", "input": "tokens arange(1,9)",
        "layers": _js(layers),
        "final": _mx_stats(out),
    }


def record_clip(model_name: str) -> dict:
    import mlx.core as mx
    from flux.utils import load_clip

    model = load_clip(model_name)
    out = model(mx.array(CLIP_TOKENS))
    mx.eval(out.pooled_output)
    return {
        "family": "clip", "input": "tokens arange(1,12)",
        "layers": [_mx_stats(h) for h in out.hidden_states],
        "pooled": _mx_stats(out.pooled_output),
    }


def record_encodec() -> dict:
    import mlx.core as mx
    from musicgen.encodec import EncodecModel

    model, _ = EncodecModel.from_pretrained("mlx-community/encodec-32khz-float32")
    nq = model.quantizer.get_num_quantizers()
    codes = encodec_codes(nq, model.config.codebook_size)
    audio = model.decode(mx.array(codes), [None])
    mx.eval(audio)
    return {
        "family": "encodec", "input": "codes arange(40) % K",
        "decode": _mx_stats(audio),
    }


def record_sdxl(model_name: str = "stabilityai/sdxl-turbo") -> dict:
    """SDXL text_time temb tap — must mirror validate_real.sdxl_fingerprints:
    rng(0) pooled, time_ids 1024^2, t=500, through timesteps->time_embedding
    + add_time_proj/add_embedding (reference unet.py:404-422)."""
    import mlx.core as mx
    from stable_diffusion import StableDiffusionXL

    sd = StableDiffusionXL(model_name)
    unet = sd.unet
    rng = np.random.default_rng(0)
    pooled_dim = (
        unet.config.projection_class_embeddings_input_dim
        - 6 * unet.config.addition_time_embed_dim
    )
    pooled = mx.array(rng.standard_normal((1, pooled_dim)).astype(np.float32))
    time_ids = mx.array([[1024, 1024, 0, 0, 1024, 1024.0]])
    temb = unet.time_embedding(unet.timesteps(mx.array([500.0])))
    emb = unet.add_time_proj(time_ids).flatten(1)
    emb = mx.concatenate([pooled, emb], axis=-1)
    temb = temb + unet.add_embedding(emb)
    mx.eval(temb)
    return {
        "family": "sdxl",
        "input": "np.default_rng(0) pooled, time_ids 1024^2, t=500",
        "text_time_temb": _mx_stats(temb),
    }


def record_musicgen(model_name: str = "facebook/musicgen-medium") -> dict:
    """MusicGen delay-undo edge tap — must mirror
    validate_real.musicgen_fingerprints: rng(0) conditioning (1, 6, H)
    fed PAST the text encoder (the tap isolates the decoder + delay
    machinery), 8 steps, top_k=1 (argmax — key-independent), codes exact."""
    import mlx.core as mx
    from musicgen import MusicGen

    model = MusicGen.from_pretrained(model_name)
    rng = np.random.default_rng(0)
    cond = mx.array(
        (rng.standard_normal((1, 6, model.decoder_hidden_size)) * 0.3
         ).astype(np.float32))
    # drive the reference's generate loop with injected conditioning at
    # top_k=1; adapt here if its API names differ — the CONTRACT is the
    # rng(0) conditioning + 8 steps + argmax sampling + delay undo
    codes = model.generate_with_conditioning(cond, max_steps=8, top_k=1)
    mx.eval(codes)
    return {
        "family": "musicgen",
        "input": "np.default_rng(0) conditioning (1, 6, H), 8 steps, top_k=1",
        "codes": np.array(codes, np.int64).tolist(),
    }


def selfcheck():
    """Runs here (no mlx needed): the input constructions above must match
    scripts/checksum_activations.py bit for bit."""
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    rng = np.random.default_rng(0)
    # compare at f32 on both sides: jnp.asarray downcasts f64→f32 (x64 off),
    # and packing is a pure permutation, so equality must then be exact
    lat = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    ours = np.asarray(pack_latents(jnp.asarray(lat)))
    theirs = pack_latents_np(lat)
    assert np.array_equal(ours, theirs), "pack_latents drifted"
    assert np.array_equal(
        np.asarray(latent_ids(1, 8, 8)), latent_ids_np(1, 8, 8)
    ), "latent_ids drifted"
    # the harness consumes the SAME rng stream order: latent, txt, vec
    img, img_ids, txt, txt_ids, t, vec = flux_inputs(64, 4096, 768)
    assert img.shape == (1, 16, 64) and txt.shape == (1, 16, 4096)
    assert vec.shape == (1, 768)
    print("selfcheck OK: inputs identical to checksum_activations.py")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", help="path to the reference repo checkout")
    ap.add_argument("--family", default="all",
                    choices=["flux", "t5", "clip", "encodec", "sdxl",
                             "musicgen", "all"])
    ap.add_argument("--model", default="flux-schnell")
    ap.add_argument("--out", default="checksums_ref")
    ap.add_argument("--selfcheck", action="store_true",
                    help="verify input construction only (no mlx needed)")
    args = ap.parse_args(argv)

    if args.selfcheck:
        selfcheck()
        return

    if not args.reference:
        ap.error("--reference is required (path to the MLX reference repo)")
    sys.path.insert(0, args.reference)

    recorders = {
        "flux": lambda: record_flux(args.model),
        "t5": lambda: record_t5(args.model),
        "clip": lambda: record_clip(args.model),
        "encodec": record_encodec,
        "sdxl": record_sdxl,
        "musicgen": record_musicgen,
    }
    names = list(recorders) if args.family == "all" else [args.family]
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        result = recorders[name]()
        path = out_dir / f"{name}.json"
        path.write_text(json.dumps(result, indent=1))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
