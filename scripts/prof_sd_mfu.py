#!/usr/bin/env python3
"""SD/SDXL UNet MFU gap study (r4, VERDICT r3 #4 follow-through).

With the corrected accounting (marginal step time, per-step flops),
bench measures SD2.1 512² at 44.9% MFU (16.8 ms/step) and SDXL-Turbo
1024² at 20.4% (64.2 ms/step). This script pins WHERE the remaining
time goes:

  1. conv microbench — one 3×3 conv at each UNet level geometry, Δ-timed
     between a 10- and a 50-deep chain, vs its MXU FLOP floor. Shows
     whether XLA's TPU conv lowering is the bottleneck.
  2. batch sweep — UNet step across batch sizes. Flat = latency/overhead
     bound; linear = compute/memory bound per op.
  3. attention Δ-stub — self+cross attention replaced by identity-on-v;
     the gap bounds total attention cost.
  4. FLOP audit — XLA cost analysis of the full step for cross-checking.

Usage: python scripts/prof_sd_mfu.py [--sdxl] [size]
       (default 512; 1024 with --sdxl)
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
    """One 3×3 same-pad conv per UNet level geometry: a lax.scan over N
    stacked DISTINCT weights (each conv must fetch its own kernel from HBM,
    like the real UNet), timed as one program with N large enough that the
    ~2 ms fixed dispatch+fetch cost is <3% — two earlier Δ-of-two-chains
    protocols both produced negative/impossible per-conv times (tunnel
    noise between separately-fetched runs exceeds 40 convs of work)."""
    nb = 1 if SDXL else 2
    levels = ([(128, 320), (64, 640), (32, 1280)] if SDXL
              else [(64, 320), (32, 640), (16, 1280), (8, 1280)])
    print(f"== conv microbench (3x3 NHWC, bf16, batch {nb}) ==")
    N = 100
    for hw, c in levels:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (nb, hw, hw, c), jnp.bfloat16)
        ws = jax.random.normal(k, (N, 3, 3, c, c), jnp.bfloat16) * 0.02

        @jax.jit
        def f(x, ws):
            def body(xc, w):
                y = jax.lax.conv_general_dilated(
                    xc, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16,
                ) * (1.0 / c)
                return y, ()
            y, _ = jax.lax.scan(body, x, ws)
            return y

        t = _med(lambda: float(jnp.sum(f(x, ws).astype(jnp.float32))))
        per = t / N
        fl = 2 * nb * hw * hw * c * c * 9
        wbytes = 9 * c * c * 2  # bf16 kernel fetched per conv
        print(f"  {hw:3d}² c={c:<5d} {per*1e3:7.3f} ms/conv  "
              f"{fl/per/1e12:6.1f} TF/s ({100*fl/per/V5E_BF16_PEAK:5.1f}% "
              f"MXU peak, {wbytes/per/1e9:5.0f} GB/s weight stream; "
              f"total {t*1e3:.1f} ms/{N})",
              flush=True)


SDXL = False  # --sdxl: SDXL-Turbo geometry (1-step, no CFG, batch 1)


def build_pipe():
    from flux_generator_tpu.models.clip.text import CLIPTextConfig
    from flux_generator_tpu.models.sd.config import (
        AutoencoderConfig, DiffusionConfig, UNetConfig,
    )
    from flux_generator_tpu.models.sd.unet import init_unet
    from flux_generator_tpu.models.sd.vae import init_sd_vae
    from flux_generator_tpu.pipelines.sd import StableDiffusion, StableDiffusionXL

    if SDXL:
        unet_cfg = UNetConfig(
            block_out_channels=(320, 640, 1280),
            layers_per_block=(2, 2, 2),
            transformer_layers_per_block=(1, 2, 10),
            num_attention_heads=(5, 10, 20),
            cross_attention_dim=(2048, 2048, 2048),
            down_block_types=(
                "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=(
                "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
            addition_embed_type="text_time",
            addition_time_embed_dim=256,
            projection_class_embeddings_input_dim=2816,
        )
    else:
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
    cls = StableDiffusionXL if SDXL else StableDiffusion
    return cls(
        "sdxl-turbo" if SDXL else "stable-diffusion-2-1-base",
        params, unet_cfg, ae_cfg,
        CLIPTextConfig(num_layers=23, model_dims=1024, num_heads=16),
        DiffusionConfig(), dtype=dtype,
    )


def step_time(pipe, size, cfg_batch):
    """ms per UNet forward at the given total UNet batch, Δ-method.
    SD2.1 runs CFG (UNet batch = 2·images, weight 7.5); SDXL-Turbo runs
    CFG-free (UNet batch = images) with text_time conditioning."""
    from flux_generator_tpu.models.sd import sampler as smp

    latent = size // 8
    dtype = jnp.bfloat16
    kw = {}
    if SDXL:
        n = cfg_batch
        cond = jax.random.normal(jax.random.PRNGKey(1), (n, 77, 2048), dtype)
        pooled = jax.random.normal(jax.random.PRNGKey(4), (n, 1280), dtype)
        tt = jnp.broadcast_to(
            jnp.array([[size, size, 0, 0, size, float(size)]]), (n, 6))
        kw = dict(cfg_weight=0.0, text_time=(pooled, tt))
    else:
        n = cfg_batch // 2  # images; CFG doubles
        cond = jax.random.normal(jax.random.PRNGKey(1), (2 * n, 77, 1024), dtype)
        kw = dict(cfg_weight=7.5)
    x_T = smp.sample_prior(
        jax.random.PRNGKey(2), pipe.sigmas, (n, latent, latent, 4), dtype)

    def run(steps):
        def f(key):
            x = pipe.denoise(x_T, cond, steps, seed_key=key, **kw)
            return float(jnp.sum(x.astype(jnp.float32)))
        return _med(lambda: f(jax.random.PRNGKey(3)))

    t4, t24 = run(4), run(24)
    return (t24 - t4) / 20 * 1000


def batch_sweep(size):
    label = "no CFG" if SDXL else "incl CFG"
    print(f"== batch sweep ({size}², UNet step {label}) ==")
    pipe = build_pipe()
    for cb in (1, 2, 4, 8) if SDXL else (2, 4, 8):
        per = step_time(pipe, size, cb)
        print(f"  UNet batch {cb}: {per:7.2f} ms/step  "
              f"({per/cb:6.2f} ms per sample-step)", flush=True)
    return pipe


def attention_stub(pipe, size):
    print(f"== attention Δ-stub ({size}²) ==")
    base = step_time(pipe, size, 1 if SDXL else 2)
    import flux_generator_tpu.models.sd.unet as unet_mod

    real = unet_mod._self_attention
    real_dpa = unet_mod.dot_product_attention
    unet_mod._self_attention = lambda q, k, v: q
    unet_mod.dot_product_attention = lambda q, k, v, **kw: q
    pipe2 = build_pipe()
    stub = step_time(pipe2, size, 1 if SDXL else 2)
    unet_mod._self_attention = real
    unet_mod.dot_product_attention = real_dpa
    print(f"  normal {base:.2f} ms  attn-free {stub:.2f} ms  "
          f"-> attention ≈ {base-stub:.2f} ms/step "
          f"({100*(base-stub)/base:.0f}%)", flush=True)


def flop_audit(size):
    pipe = build_pipe()
    from flux_generator_tpu.models.sd import sampler as smp
    latent = size // 8
    dt = jnp.bfloat16
    x_T = smp.sample_prior(
        jax.random.PRNGKey(2), pipe.sigmas, (1, latent, latent, 4), dt)
    if SDXL:
        cond = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 2048), dt)
        tt = (jax.random.normal(jax.random.PRNGKey(4), (1, 1280), dt),
              jnp.array([[size, size, 0, 0, size, float(size)]]))
        fn = jax.jit(lambda x, c: pipe.denoise(
            x, c, 1, cfg_weight=0.0, seed_key=jax.random.PRNGKey(0),
            text_time=tt))
    else:
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 1024), dt)
        fn = jax.jit(lambda x, c: pipe.denoise(
            x, c, 1, cfg_weight=7.5, seed_key=jax.random.PRNGKey(0)))
    lowered = fn.lower(x_T, cond)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(f"== XLA cost analysis, 1 denoise step at {size}² ==")
    for k in ("flops", "bytes accessed"):
        if k in cost:
            print(f"  {k}: {cost[k]/1e12:.3f} T")


if __name__ == "__main__":
    if "--sdxl" in sys.argv:
        sys.argv.remove("--sdxl")
        SDXL = True
    size = int(sys.argv[1]) if len(sys.argv) > 1 else (1024 if SDXL else 512)
    conv_microbench()
    pipe = batch_sweep(size)
    attention_stub(pipe, size)
    flop_audit(size)
