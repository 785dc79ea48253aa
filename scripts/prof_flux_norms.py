"""Flux denoise elementwise-cost study: how much of the non-MXU time
(~47 ms/step at 512², inferred from the bf16-vs-W8A8 split) is the
layer_norm/rms_norm chains? Δ-timing (4 vs 24 steps) with stubbed norms
bounds what a fused AdaLN/QKNorm kernel could win."""

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


def build():
    from flux_generator_tpu.models.flux.model import FluxConfig, init_flux
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import FluxPipeline
    from flux_generator_tpu.models.clip.text import tiny_clip_config
    from flux_generator_tpu.models.t5.t5 import tiny_t5_config
    from flux_generator_tpu.models.flux.autoencoder import AutoEncoderConfig, init_autoencoder

    cfg = FluxConfig()
    ae_cfg = AutoEncoderConfig()
    dtype = jnp.bfloat16
    flow = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: quantize_tree(init_flux(jax.random.PRNGKey(0), cfg, dtype))),
    ))()
    ae = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: init_autoencoder(jax.random.PRNGKey(0), ae_cfg, dtype)),
    ))()
    return FluxPipeline(
        "flux-schnell", {"flow": flow, "ae": ae}, cfg, ae_cfg,
        tiny_clip_config(), tiny_t5_config(), dtype=dtype,
    )


def measure(pipe, label):
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    dtype = jnp.bfloat16
    b, h, w = 1, 64, 64
    key = jax.random.PRNGKey(0)
    x_t = pack_latents(jax.random.normal(key, (b, h, w, 16), dtype))
    x_ids = latent_ids(b, h, w)
    txt = jax.random.normal(key, (b, 256, 4096), dtype)
    txt_ids = jnp.zeros((b, 256, 3), jnp.int32)
    vec = jax.random.normal(key, (b, 768), dtype)

    def run(steps):
        def f():
            out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, steps, 4.0)
            return float(jnp.sum(out.astype(jnp.float32)))
        f()
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    per = (run(24) - run(4)) / 20 * 1000
    print(f"{label:40s} {per:7.2f} ms / denoise step", flush=True)
    return per


def main():
    import flux_generator_tpu.models.flux.model as fm

    import gc

    pipe = build()
    base = measure(pipe, "baseline (real norms)")
    del pipe
    gc.collect()
    jax.clear_caches()

    saved_ln, saved_rms = fm.layer_norm, fm.rms_norm
    fm.layer_norm = lambda x, p=None, eps=1e-5: x
    fm.rms_norm = lambda x, p=None, eps=1e-6, **kw: x
    pipe2 = build()
    stub = measure(pipe2, "layer_norm+rms_norm stubbed")
    fm.layer_norm, fm.rms_norm = saved_ln, saved_rms

    print(f"norm cost: {base - stub:.2f} ms/step ({100*(base-stub)/base:.1f}%)")


if __name__ == "__main__":
    main()
