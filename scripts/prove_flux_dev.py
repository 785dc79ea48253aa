"""Full-size flux-dev proof: the guidance-distilled 12B variant (extra
guidance MLP embedder, resolution-shifted schedule) compiles and denoises
at full geometry on one chip. Run once per round; result goes in NOTES.md.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    from flux_generator_tpu.io.registry import flux_configs
    from flux_generator_tpu.models.flux.autoencoder import init_autoencoder
    from flux_generator_tpu.models.flux.model import init_flux
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import FluxPipeline, latent_ids, pack_latents
    from flux_generator_tpu.models.clip.text import tiny_clip_config
    from flux_generator_tpu.models.t5.t5 import tiny_t5_config

    cfg, ae_cfg, _, _ = flux_configs("flux-dev")
    assert cfg.guidance_embed
    dtype = jnp.bfloat16
    flow = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: quantize_tree(init_flux(jax.random.PRNGKey(0), cfg, dtype))),
    ))()
    ae = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: init_autoencoder(jax.random.PRNGKey(0), ae_cfg, dtype)),
    ))()
    pipe = FluxPipeline(
        "flux-dev", {"flow": flow, "ae": ae}, cfg, ae_cfg,
        tiny_clip_config(), tiny_t5_config(), dtype=dtype,
    )
    assert not pipe.schnell  # dev time-shift schedule

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512,
                    help="image px (512 or 1024 — dev's native showcase)")
    ap.add_argument("--steps", type=int, default=4,
                    help="proof steps; dev serves at 35-50")
    args = ap.parse_args()

    b, h, w = 1, args.size // 8, args.size // 8
    key = jax.random.PRNGKey(0)
    x_t = pack_latents(jax.random.normal(key, (b, h, w, 16), dtype))
    x_ids = latent_ids(b, h, w)
    txt = jax.random.normal(key, (b, 512, cfg.context_in_dim), dtype)  # dev pads 512
    txt_ids = jnp.zeros((b, 512, 3), jnp.int32)
    vec = jax.random.normal(key, (b, cfg.vec_in_dim), dtype)

    steps = args.steps

    def one():
        out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, steps, 4.0)
        return np.asarray(pipe.decode_u8(out, (h, w)))

    one()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        img = one()
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    print(f"flux-dev 12B (guidance_embed) {args.size}², {steps} steps: "
          f"p50 {p50:.3f} s ({p50 / steps * 1000:.0f} ms/step; typical "
          f"25-step serve ≈ {p50 / steps * 25:.1f} s), "
          f"output {img.shape} {img.dtype}")


if __name__ == "__main__":
    main()
