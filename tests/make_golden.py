"""Regenerate golden regression fixtures (tests/golden/*.npz).

Run `python tests/make_golden.py` ONLY when an intentional numerical change
is made; tests/test_golden.py compares current outputs against these files so
refactors can't silently shift numerics (the reference has no such tests,
SURVEY §4).
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GOLDEN = pathlib.Path(__file__).parent / "golden"


def flux_fixture():
    from flux_generator_tpu.pipelines.flux import FluxPipeline, latent_ids, pack_latents

    pipe = FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)
    b, h, w = 1, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(10), (b, h, w, pipe.ae_cfg.z_channels))
    x_t = pack_latents(x)
    x_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.PRNGKey(11), (b, 4, pipe.flow_cfg.context_in_dim))
    txt_ids = jnp.zeros((b, 4, 3), jnp.int32)
    vec = jax.random.normal(jax.random.PRNGKey(12), (b, pipe.flow_cfg.vec_in_dim))
    out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, 2, 4.0)
    img = pipe.decode(out, (h, w))
    return {"latent": np.asarray(out), "image": np.asarray(img)}


def sd_fixture():
    from flux_generator_tpu.pipelines.sd import StableDiffusion

    class Tok:
        def tokenize(self, t):
            return [1, 5, 9, 63]

    pipe = StableDiffusion.random_init(tiny=True)
    pipe.tokenizers = [Tok()]
    x_t = list(pipe.generate_latents("x", num_steps=2, cfg_weight=7.5,
                                     latent_size=(8, 8), seed=21))[-1]
    return {"latent": np.asarray(x_t), "image": np.asarray(pipe.decode(x_t))}


def musicgen_fixture():
    from flux_generator_tpu.models.musicgen import model as mg
    from flux_generator_tpu.pipelines.musicgen import MusicGenPipeline

    pipe = MusicGenPipeline.random_init()
    cond = jax.random.normal(jax.random.PRNGKey(30), (1, 3, pipe.cfg.hidden_size))
    codes = mg.generate(pipe.params, pipe.cfg, cond, max_steps=12, top_k=4,
                        key=jax.random.PRNGKey(31))
    return {"codes": np.asarray(codes)}


def main():
    GOLDEN.mkdir(exist_ok=True)
    np.savez(GOLDEN / "flux_tiny.npz", **flux_fixture())
    np.savez(GOLDEN / "sd_tiny.npz", **sd_fixture())
    np.savez(GOLDEN / "musicgen_tiny.npz", **musicgen_fixture())
    print(f"wrote fixtures to {GOLDEN}")


if __name__ == "__main__":
    main()
