#!/usr/bin/env python
"""One-command real-weight validation (VERDICT r2 #1): pass/fail exit code.

Usage (the moment real checkpoints land):

    python scripts/validate_real.py /path/to/weights \
        [--fingerprints checksums_ref] [--ref-images refimgs] \
        [--lpips-weights lpips_dir] [--families flux,sd,sdxl,musicgen]

/path/to/weights layout — any subset of:
    flux/      flux1-schnell.safetensors, ae.safetensors, text_encoder/,
               tokenizer/, text_encoder_2/ (sharded ok), tokenizer_2/
    sd/        diffusers repo layout (unet/, vae/, text_encoder/, tokenizer/,
               scheduler/)
    sdxl/      same + text_encoder_2/, tokenizer_2/
    musicgen/  config.json, state_dict.bin, text_encoder/, encodec/

Checks per family:
  1. LOAD — full io.loaders path (sanitize → conform → cast), which alone
     catches shape/key mapping breaks;
  2. FINGERPRINTS — per-layer activation stats vs the reference-recorded
     JSONs (scripts/record_reference_fingerprints.py on a Mac); reports the
     FIRST divergent layer;
  3. IMAGES — fixed-seed generation compared to reference outputs by SSIM
     (always) and LPIPS (when the two weight files are present — see
     flux_generator_tpu/utils/metrics.py). BASELINE bar: LPIPS ≤ 1e-2.

`--selftest` runs the whole machinery against synthetic full-format
checkpoints (io/synthetic.py) with no network and no real weights — the
dress rehearsal. Exit code 0 = all requested checks passed.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402

PASS, FAIL = "PASS", "FAIL"
# bf16 forward noise on (mean, abs-mean, std) stats; mapping bugs diverge by
# orders of magnitude at the first wrong layer, so loose is fine
STAT_RTOL, STAT_ATOL = 0.05, 0.02
SSIM_MIN = 0.90
LPIPS_MAX = 1e-2


def _report(results) -> int:
    width = max(len(r[0]) for r in results)
    bad = 0
    for name, ok, detail in results:
        print(f"{name:<{width}}  {PASS if ok else FAIL}  {detail}")
        bad += not ok
    print(f"\n{len(results) - bad}/{len(results)} checks passed")
    return 1 if bad else 0


def _stats_close(got, want, path="") -> str | None:
    """Walk nested stat lists; return the first divergent location or None."""
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    if got.shape != want.shape:
        return f"{path}: shape {got.shape} vs {want.shape}"
    bad = ~np.isclose(got, want, rtol=STAT_RTOL, atol=STAT_ATOL)
    if bad.any():
        idx = tuple(int(i) for i in np.argwhere(bad)[0])
        return (f"{path}{list(idx)}: got {got[idx]:.6g} want {want[idx]:.6g}")
    return None


def compare_fingerprints(ours: dict, ref: dict) -> str | None:
    """Diff two fingerprint JSONs (same family). Keys 'family'/'input' must
    match; every numeric entry must agree within tolerance."""
    if ours.get("input") != ref.get("input"):
        return f"input mismatch: {ours.get('input')} vs {ref.get('input')}"
    for key in ours:
        if key in ("family", "input") or key not in ref:
            continue
        div = _stats_close(ours[key], ref[key], path=key)
        if div:
            return div
    return None


# ------------------------------------------------------------ family runs


def run_flux(local_dir, configs=None, quantize=False):
    import jax.numpy as jnp

    from flux_generator_tpu.io.loaders import load_flux_pipeline

    dtype = jnp.bfloat16 if configs is None else jnp.float32
    pipe = load_flux_pipeline("flux-schnell", dtype=dtype,
                              local_dir=str(local_dir), configs=configs,
                              quantize=quantize)
    size = (8, 8) if configs else (64, 64)
    img = pipe.generate_images("a photo of a cat", latent_size=size,
                               num_steps=2, seed=42, as_uint8=True)
    return pipe, np.asarray(img)


def flux_fingerprints(pipe) -> dict:
    """Same taps as scripts/checksum_activations.py flux --real, computed on
    an already-loaded pipeline."""
    import jax.numpy as jnp

    from flux_generator_tpu.models.flux.model import flux_forward
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    cfg = pipe.flow_cfg
    rng = np.random.default_rng(0)
    b, h, w = 1, 8, 8
    img = pack_latents(jnp.asarray(
        rng.standard_normal((b, h, w, cfg.in_channels // 4)), pipe.dtype))
    txt = jnp.asarray(rng.standard_normal((b, 16, cfg.context_in_dim)), pipe.dtype)
    vec = jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), pipe.dtype)
    out, stats = flux_forward(
        pipe.params["flow"], cfg, img, latent_ids(b, h, w), txt,
        jnp.zeros((b, 16, 3), jnp.int32), jnp.full((b,), 0.5, pipe.dtype), vec,
        guidance=jnp.full((b,), 4.0, pipe.dtype) if cfg.guidance_embed else None,
        capture_stats=True,
    )
    js = lambda s: np.asarray(s, np.float64).round(6).tolist()  # noqa: E731
    return {
        "family": "flux",
        "input": "np.default_rng(0), 8x8 latent, 16 txt tokens",
        "double_blocks_img_txt": js(stats["double"]),
        "single_blocks": js(stats["single"]),
        "final": js(stats["final"]),
    }


def sdxl_fingerprints(pipe) -> dict:
    """SDXL text_time conditioning tap (VERDICT r4 #9): the added-embedding
    path (pooled text + Fourier time_ids -> add_embedding MLP -> temb) is
    the one SDXL-only input route, so a wrong text_encoder_2 projection or
    time_ids layout shows up here before any image diff. Inputs from
    np.default_rng(0) — byte-identical on the reference recorder side
    (record_reference_fingerprints.py selfcheck locks the construction)."""
    import jax.numpy as jnp

    from flux_generator_tpu.models.sd.unet import compute_temb

    cfg = pipe.unet_cfg
    rng = np.random.default_rng(0)
    pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
    pooled = jnp.asarray(rng.standard_normal((1, pooled_dim)), pipe.dtype)
    time_ids = jnp.asarray([[1024, 1024, 0, 0, 1024, 1024.0]])
    temb = compute_temb(
        pipe.params["unet"], cfg, jnp.asarray([500.0]),
        (pooled, time_ids), pipe.dtype,
    )
    a = np.asarray(temb, np.float64)
    return {
        "family": "sdxl",
        "input": "np.default_rng(0) pooled, time_ids 1024^2, t=500",
        "text_time_temb": [round(float(a.mean()), 6),
                           round(float(np.abs(a).mean()), 6),
                           round(float(a.std()), 6)],
    }


def musicgen_fingerprints(pipe) -> dict:
    """MusicGen delay-undo edge tap (VERDICT r4 #9): 8-step top_k=1 codes
    with fixed rng(0) conditioning, recorded EXACTLY (ints). Covers the two
    delay-pattern edges the image diff can't see: codebook k only goes live
    at step k (head edge) and the last K-1 frames mask back to BOS before
    the shift-undo (tail edge) — an off-by-one in either shifts these
    columns."""
    import jax

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.standard_normal((1, 6, pipe.cfg.hidden_size)) * 0.3, pipe.dtype)
    from flux_generator_tpu.models.musicgen import model as mg

    codes = mg.generate(pipe.params, pipe.cfg, cond, max_steps=8, top_k=1,
                        key=jax.random.PRNGKey(0))
    return {
        "family": "musicgen",
        "input": "np.default_rng(0) conditioning (1, 6, H), 8 steps, top_k=1",
        "codes": np.asarray(codes, np.int64).tolist(),
    }


def run_sd(local_dir, xl=False):
    import jax.numpy as jnp

    from flux_generator_tpu.io.loaders import load_sd_pipeline

    name = "sdxl-local" if xl else "sd-local"
    pipe = load_sd_pipeline(name, dtype=jnp.float32 if "tiny" in str(local_dir)
                            else jnp.bfloat16, local_dir=str(local_dir))
    size = (8, 8)
    for x_t in pipe.generate_latents("a photo of a cat", num_steps=2,
                                     cfg_weight=0.0 if xl else 7.5,
                                     latent_size=size, seed=42):
        pass
    return pipe, np.asarray(pipe.decode_u8(x_t))


def run_musicgen(local_dir):
    import jax.numpy as jnp

    from flux_generator_tpu.io.loaders import load_musicgen_pipeline

    pipe = load_musicgen_pipeline(dtype=jnp.float32, local_dir=str(local_dir))
    audio = pipe.generate("soft piano", max_steps=6, top_k=4, seed=1)
    return pipe, np.asarray(audio)


# ------------------------------------------------------------ main


def _fp_result(fam, fps, fingerprints, label):
    """Diff a family's fingerprints against the reference dir when given."""
    if fingerprints:
        ref_file = Path(fingerprints) / f"{fam}.json"
        if not ref_file.exists():
            return (f"{fam}/fingerprints", False, f"missing {ref_file}")
        div = compare_fingerprints(fps, json.loads(ref_file.read_text()))
        return (f"{fam}/fingerprints", div is None, div or f"{label} agrees")
    return (f"{fam}/fingerprints", True,
            f"{label} recorded (no reference dir given)")


def validate(root, families, fingerprints=None, ref_images=None,
             lpips_weights=None, selftest=False):
    from flux_generator_tpu.utils.metrics import LPIPS, ssim

    results = []
    tmp = None
    if selftest:
        import tempfile

        from flux_generator_tpu.io.synthetic import (
            make_flux_cache, make_musicgen_cache, make_sd_cache,
        )

        tmp = Path(tempfile.mkdtemp(prefix="fgt_selftest_"))
        flux_configs = make_flux_cache(tmp / "flux")
        make_sd_cache(tmp / "sd")
        make_sd_cache(tmp / "sdxl", xl=True)
        make_musicgen_cache(tmp / "musicgen")
        root = tmp
    else:
        flux_configs = None
    root = Path(root)

    imgs = {}
    for fam in families:
        sub = root / fam
        if not sub.exists():
            results.append((f"{fam}/load", False, f"missing directory {sub}"))
            continue
        try:
            if fam == "flux":
                pipe, img = run_flux(sub, configs=flux_configs)
                imgs["flux"] = img
                results.append((f"{fam}/load+generate", True,
                                f"image {img.shape}, finite={np.isfinite(img.astype(np.float32)).all()}"))
                fps = flux_fingerprints(pipe)
                if fingerprints:
                    ref = json.loads((Path(fingerprints) / "flux.json").read_text())
                    div = compare_fingerprints(fps, ref)
                    results.append((f"{fam}/fingerprints", div is None,
                                    div or f"{len(fps['single_blocks'])} single-block taps agree"))
                else:
                    results.append((f"{fam}/fingerprints", True,
                                    "recorded (no reference dir given; pass --fingerprints to diff)"))
            elif fam in ("sd", "sdxl"):
                pipe, img = run_sd(sub, xl=(fam == "sdxl"))
                imgs[fam] = img
                results.append((f"{fam}/load+generate", True, f"image {img.shape}"))
                if fam == "sdxl":
                    fps = sdxl_fingerprints(pipe)
                    results.append(_fp_result(fam, fps, fingerprints,
                                              "text_time temb tap"))
            elif fam == "musicgen":
                pipe, audio = run_musicgen(sub)
                ok = np.isfinite(audio.astype(np.float32)).all() and audio.size > 0
                results.append((f"{fam}/load+generate", ok,
                                f"audio {audio.shape}"))
                fps = musicgen_fingerprints(pipe)
                results.append(_fp_result(fam, fps, fingerprints,
                                          "delay-undo edge codes"))
        except Exception as e:  # noqa: BLE001 — each family fails independently
            results.append((f"{fam}/load+generate", False,
                            f"{type(e).__name__}: {e}"))

    if ref_images:
        from PIL import Image

        lp = (LPIPS(lpips_weights)
              if lpips_weights and LPIPS.available(lpips_weights) else None)
        for fam, img in imgs.items():
            ref_file = Path(ref_images) / f"{fam}.png"
            if not ref_file.exists():
                results.append((f"{fam}/image-match", False,
                                f"missing reference image {ref_file}"))
                continue
            ref = np.asarray(Image.open(ref_file).convert("RGB"))
            got = img[0] if img.ndim == 4 else img
            if ref.shape != got.shape:
                results.append((f"{fam}/image-match", False,
                                f"shape {got.shape} vs {ref.shape}"))
                continue
            s = ssim(got, ref)
            detail = f"ssim={s:.4f}"
            ok = s >= SSIM_MIN
            if lp is not None:
                d = lp(got, ref)
                detail += f" lpips={d:.4f}"
                ok = d <= LPIPS_MAX
            results.append((f"{fam}/image-match", ok, detail))

    code = _report(results)
    if tmp is not None:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return code


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", help="weights root (see module doc)")
    ap.add_argument("--families", default="flux,sd,sdxl,musicgen")
    ap.add_argument("--fingerprints",
                    help="dir of record_reference_fingerprints.py JSONs")
    ap.add_argument("--ref-images", help="dir of <family>.png reference images")
    ap.add_argument("--lpips-weights",
                    help="dir with vgg16-397923af.pth + lpips_vgg.pth")
    ap.add_argument("--selftest", action="store_true",
                    help="run against synthetic full-format checkpoints")
    args = ap.parse_args(argv)
    if not args.selftest and not args.root:
        ap.error("give a weights root or --selftest")
    return validate(
        args.root, args.families.split(","), fingerprints=args.fingerprints,
        ref_images=args.ref_images, lpips_weights=args.lpips_weights,
        selftest=args.selftest,
    )


if __name__ == "__main__":
    sys.exit(main())
