"""SD UNet groupnorm-fusion study (NOTES.md #4): is the groupnorm+silu+conv
chain a real cost, or does XLA fuse it away?

Method: Δ-timing of the jitted denoise scan at two step counts (cancels the
tunnel dispatch/fetch overhead), normal group_norm vs a stats-free stub
(scale+bias only — wrong math, same memory traffic shape minus the two
reduction passes). The gap bounds what a fused Pallas groupnorm could win.
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
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
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


def measure(pipe, size, label):
    from flux_generator_tpu.models.sd import sampler as smp

    latent = size // 8
    dtype = jnp.bfloat16
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 1024), dtype)
    x_T = smp.sample_prior(jax.random.PRNGKey(2), pipe.sigmas, (1, latent, latent, 4), dtype)

    def run(steps):
        def f(key):
            x = pipe.denoise(x_T, cond, steps, cfg_weight=7.5, seed_key=key)
            return float(jnp.sum(x.astype(jnp.float32)))
        f(jax.random.PRNGKey(3))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            f(jax.random.PRNGKey(4 + i))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t4, t24 = run(4), run(24)
    per = (t24 - t4) / 20 * 1000
    print(f"{label:44s} {per:7.2f} ms / UNet step (CFG batch 2)", flush=True)
    return per


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    pipe = build_pipe()
    base = measure(pipe, size, f"group_norm normal ({size}²)")

    # stats-free stub: same elementwise tail, no mean/var reduction passes
    from flux_generator_tpu.ops import norms

    real = norms.group_norm

    def stub(x, p=None, groups=32, eps=1e-5):
        y = x
        if p is not None:
            if "scale" in p:
                y = y * p["scale"].astype(x.dtype)
            if "bias" in p:
                y = y + p["bias"].astype(x.dtype)
        return y

    norms.group_norm = stub
    import flux_generator_tpu.models.sd.unet as unet_mod
    import flux_generator_tpu.models.sd.vae as vae_mod

    saved = []
    for mod in (unet_mod, vae_mod):
        if hasattr(mod, "group_norm"):
            saved.append((mod, mod.group_norm))
            mod.group_norm = stub
    pipe2 = build_pipe()
    nostats = measure(pipe2, size, f"group_norm stats-free stub ({size}²)")
    norms.group_norm = real
    for mod, fn in saved:
        mod.group_norm = fn

    print(f"groupnorm reduction cost: {base - nostats:.2f} ms/step "
          f"({100*(base-nostats)/base:.1f}% of the UNet step)")


if __name__ == "__main__":
    main()
