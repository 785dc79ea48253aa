#!/usr/bin/env python3
"""SD UNet MFU gap study (r4, VERDICT r3 #4 follow-through).

bench.py --config sd21 measures 7.0% MFU at 512² (108 ms / 1.49 TFLOP by
XLA's own cost analysis). This script pins WHERE the time goes:

  1. conv microbench — one 3×3 conv at each UNet level geometry, Δ-timed
     over a 40-deep chain, vs its MXU FLOP floor. Shows whether XLA's TPU
     conv lowering is the bottleneck.
  2. batch sweep — UNet step at CFG batch 2/4/8. Flat = latency/overhead
     bound; linear = compute/memory bound per op.
  3. attention Δ-stub — self+cross attention replaced by identity-on-v;
     the gap bounds total attention cost.
  4. FLOP audit — XLA cost analysis of the full step for cross-checking.

Usage: python scripts/prof_sd_mfu.py [size]   (default 512)
"""

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)

V5E_BF16_PEAK = 197e12


def _med(f, n=5):
    f()  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def conv_microbench():
    """One 3×3 same-pad conv per UNet level geometry, Δ-timed between a
    10-deep and a 50-deep chain (a single conv is microseconds — Δ vs a
    1-deep run is swamped by ms-scale tunnel noise and gave negative
    times in the first cut)."""
    print("== conv microbench (3x3 NHWC, bf16, batch 2 = CFG batch) ==")
    D1, D2 = 10, 50
    for hw, c in [(64, 320), (32, 640), (16, 1280), (8, 1280)]:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (2, hw, hw, c), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, c, c), jnp.bfloat16) * 0.02

        def chain(depth):
            @jax.jit
            def f(x, w):
                def body(i, x):
                    return jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.bfloat16,
                    ) * (1.0 / c)
                return jax.lax.fori_loop(0, depth, body, x)
            return f

        f1, f2 = chain(D1), chain(D2)
        t1 = _med(lambda: float(jnp.sum(f1(x, w).astype(jnp.float32))))
        t2 = _med(lambda: float(jnp.sum(f2(x, w).astype(jnp.float32))))
        per = (t2 - t1) / (D2 - D1)
        fl = 2 * 2 * hw * hw * c * c * 9  # batch 2
        print(f"  {hw:3d}² c={c:<5d} {per*1e3:7.3f} ms/conv  "
              f"{fl/per/1e12:6.1f} TF/s  ({100*fl/per/V5E_BF16_PEAK:5.1f}% peak)",
              flush=True)


def build_pipe():
    from flux_generator_tpu.models.clip.text import CLIPTextConfig
    from flux_generator_tpu.models.sd.config import (
        AutoencoderConfig, DiffusionConfig, UNetConfig,
    )
    from flux_generator_tpu.models.sd.unet import init_unet
    from flux_generator_tpu.models.sd.vae import init_sd_vae
    from flux_generator_tpu.pipelines.sd import StableDiffusion

    unet_cfg = UNetConfig()
    ae_cfg = AutoencoderConfig()
    dtype = jnp.bfloat16
    params = {
        "unet": jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda: init_unet(jax.random.PRNGKey(0), unet_cfg, dtype)),
        ))(),
        "vae": jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda: init_sd_vae(jax.random.PRNGKey(1), ae_cfg, dtype)),
        ))(),
    }
    return StableDiffusion(
        "stable-diffusion-2-1-base", params, unet_cfg, ae_cfg,
        CLIPTextConfig(num_layers=23, model_dims=1024, num_heads=16),
        DiffusionConfig(), dtype=dtype,
    )


def step_time(pipe, size, cfg_batch):
    """ms per UNet forward at the given total UNet batch, Δ-method."""
    from flux_generator_tpu.models.sd import sampler as smp

    latent = size // 8
    dtype = jnp.bfloat16
    n = cfg_batch // 2  # images; CFG doubles
    cond = jax.random.normal(jax.random.PRNGKey(1), (2 * n, 77, 1024), dtype)
    x_T = smp.sample_prior(
        jax.random.PRNGKey(2), pipe.sigmas, (n, latent, latent, 4), dtype)

    def run(steps):
        def f(key):
            x = pipe.denoise(x_T, cond, steps, cfg_weight=7.5, seed_key=key)
            return float(jnp.sum(x.astype(jnp.float32)))
        return _med(lambda: f(jax.random.PRNGKey(3)))

    t4, t24 = run(4), run(24)
    return (t24 - t4) / 20 * 1000


def batch_sweep(size):
    print(f"== batch sweep ({size}², UNet step incl CFG) ==")
    pipe = build_pipe()
    for cb in (2, 4, 8):
        per = step_time(pipe, size, cb)
        print(f"  UNet batch {cb}: {per:7.2f} ms/step  "
              f"({per/cb:6.2f} ms per sample-step)", flush=True)
    return pipe


def attention_stub(pipe, size):
    print(f"== attention Δ-stub ({size}²) ==")
    base = step_time(pipe, size, 2)
    import flux_generator_tpu.models.sd.unet as unet_mod

    real = unet_mod._self_attention
    real_dpa = unet_mod.dot_product_attention
    unet_mod._self_attention = lambda q, k, v: q
    unet_mod.dot_product_attention = lambda q, k, v, **kw: q
    pipe2 = build_pipe()
    stub = step_time(pipe2, size, 2)
    unet_mod._self_attention = real
    unet_mod.dot_product_attention = real_dpa
    print(f"  normal {base:.2f} ms  attn-free {stub:.2f} ms  "
          f"-> attention ≈ {base-stub:.2f} ms/step "
          f"({100*(base-stub)/base:.0f}%)", flush=True)


def flop_audit(size):
    pipe = build_pipe()
    from flux_generator_tpu.models.sd import sampler as smp
    latent = size // 8
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 1024), jnp.bfloat16)
    x_T = smp.sample_prior(
        jax.random.PRNGKey(2), pipe.sigmas, (1, latent, latent, 4), jnp.bfloat16)
    fn = jax.jit(lambda x, c: pipe.denoise(x, c, 1, cfg_weight=7.5,
                                           seed_key=jax.random.PRNGKey(0)))
    lowered = fn.lower(x_T, cond)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(f"== XLA cost analysis, 1 denoise step at {size}² ==")
    for k in ("flops", "bytes accessed"):
        if k in cost:
            print(f"  {k}: {cost[k]/1e12:.3f} T")


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    conv_microbench()
    pipe = batch_sweep(size)
    attention_stub(pipe, size)
    flop_audit(size)
