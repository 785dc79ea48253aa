#!/usr/bin/env python3
"""Where does the flux W8A8 denoise step's non-MXU time go?

r4 measurements: the W8A8 denoise runs ~92 ms/step at 512² where the int8
matmul floor is ~47 ms — and swapping the activation-quant formulation
(xla vs pq vs fused-pallas) does NOT move the full program, so the gap is
NOT the quant passes. This script Δ-times the jitted denoise scan
(steps=8 minus steps=4, cancelling dispatch/fetch) with components stubbed
out at the module level:

  full       — production path (FGT_W8A8 as set in the env)
  no-attn    — _rope_attention returns v (no RoPE, no attention)
  no-norm    — layer_norm/rms_norm become identity (wrong math, same matmuls)
  no-mod     — modulation vectors become constants (kills the M=1 denses)
  mm-only    — all three stubs together: matmuls + gelu + residuals only

Per-variant cost = what the stubbed component contributes per step.
Usage: FGT_W8A8=1 python scripts/prof_flux_step.py [--size 512]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def build(size):
    from flux_generator_tpu.models.flux.autoencoder import AutoEncoderConfig, init_autoencoder
    from flux_generator_tpu.models.flux.model import FluxConfig, init_flux
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import FluxPipeline, latent_ids, pack_latents
    from flux_generator_tpu.models.clip.text import tiny_clip_config
    from flux_generator_tpu.models.t5.t5 import tiny_t5_config

    cfg = FluxConfig()
    dtype = jnp.bfloat16
    flow = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: quantize_tree(init_flux(jax.random.PRNGKey(0), cfg, dtype))),
    ))()
    pipe = FluxPipeline(
        "flux-schnell", {"flow": flow}, cfg, AutoEncoderConfig(),
        tiny_clip_config(), tiny_t5_config(), dtype=dtype,
    )
    h = w = size // 8
    key = jax.random.PRNGKey(0)
    x_t = pack_latents(jax.random.normal(key, (1, h, w, 16), dtype))
    x_ids = latent_ids(1, h, w)
    txt = jax.random.normal(key, (1, 256, cfg.context_in_dim), dtype)
    txt_ids = jnp.zeros((1, 256, 3), jnp.int32)
    vec = jax.random.normal(key, (1, cfg.vec_in_dim), dtype)
    return pipe, (x_t, x_ids, txt, txt_ids, vec)


def timed(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def per_step(pipe, args):
    import flux_generator_tpu.pipelines.flux as fpipe

    # fresh jit cache per variant (module-level stubs change the traced fn)
    pipe._denoise = jax.jit(pipe._denoise_impl)

    def run(steps):
        return np.asarray(pipe.denoise_latents(*args, steps, 4.0))

    t8 = timed(lambda: run(8))
    t4 = timed(lambda: run(4))
    return (t8 - t4) / 4.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--variants", default="full,no-attn,no-norm,no-mod,mm-only")
    args = ap.parse_args()

    import flux_generator_tpu.models.flux.model as fm

    pipe, inputs = build(args.size)

    orig_attn = fm._rope_attention
    orig_ln = fm.layer_norm
    orig_rms = fm.rms_norm
    orig_mod = fm._modulation

    def stub_attn(q, k, v, cos, sin, use_pallas=None):
        return v

    def stub_ln(x, p=None, eps=1e-6):
        return x

    def stub_rms(x, p=None, eps=1e-6):
        return x

    def stub_mod(p, vec, n):
        # ones, not zeros: a zero gate would let XLA dead-code the entire
        # gated branch (attention/mlp matmuls) and the variant would measure
        # nothing
        one = jnp.ones((vec.shape[0], 1, 1), vec.dtype)
        return tuple(one for _ in range(3 * n))

    recipes = {
        "full": {},
        "no-attn": {"_rope_attention": stub_attn},
        "no-norm": {"layer_norm": stub_ln, "rms_norm": stub_rms},
        "no-mod": {"_modulation": stub_mod},
        "mm-only": {"_rope_attention": stub_attn, "layer_norm": stub_ln,
                    "rms_norm": stub_rms, "_modulation": stub_mod},
    }
    base = None
    for name in args.variants.split(","):
        patch = recipes[name]
        for attr, fn in patch.items():
            setattr(fm, attr, fn)
        try:
            ms = per_step(pipe, inputs) * 1e3
        finally:
            fm._rope_attention = orig_attn
            fm.layer_norm = orig_ln
            fm.rms_norm = orig_rms
            fm._modulation = orig_mod
        if name == "full":
            base = ms
            print(f"{name:8s} {ms:7.2f} ms/step", flush=True)
        else:
            delta = f"  (component ≈ {base - ms:+.2f} ms)" if base else ""
            print(f"{name:8s} {ms:7.2f} ms/step{delta}", flush=True)


if __name__ == "__main__":
    main()
