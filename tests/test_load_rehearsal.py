"""Load-path dress rehearsal (VERDICT r2 #1c): write synthetic checkpoints in
the real on-disk formats — safetensors (+ sharded index.json), HF
config.jsons, torch state_dict.bin, tokenizer asset files — then load them
through io.loaders with NO shortcuts and run a fixed-seed generation step.

This is the exact code path real weights will take; the only difference at
weight-landing time is the directory contents and the config scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.io.synthetic import (

    make_flux_cache,
    make_musicgen_cache,
    make_sd_cache,
)

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def flux_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("flux_cache")
    configs = make_flux_cache(root)
    return root, configs


def test_flux_load_and_generate(flux_cache):
    from flux_generator_tpu.io.loaders import load_flux_pipeline

    root, configs = flux_cache
    pipe = load_flux_pipeline(
        "flux-schnell", dtype=jnp.float32, local_dir=str(root), configs=configs
    )
    # tokenizers came from the on-disk asset files
    assert pipe.clip_tokenizer.vocab_size == configs[2].vocab_size
    assert pipe.t5_tokenizer.vocab_size > 0
    imgs = pipe.generate_images("a photo of a cat", latent_size=(8, 8),
                                num_steps=1, seed=7)
    assert imgs.shape[-1] == 3
    assert np.isfinite(np.asarray(imgs, np.float32)).all()


def test_flux_load_quantized(tmp_path):
    """The streaming quantize-before-transfer path through the same file
    formats — flow hidden lifted to 512 so the reference's int8 eligibility
    predicate (in-dim % 512 == 0) actually fires."""
    from flux_generator_tpu.io.loaders import load_flux_pipeline

    configs = make_flux_cache(tmp_path, quantizable=True)
    pipe = load_flux_pipeline(
        "flux-schnell", dtype=jnp.bfloat16, local_dir=str(tmp_path),
        configs=configs, quantize=True,
    )
    # the big matmuls landed as int8 buffers
    qkv = pipe.params["flow"]["double_blocks"]["img_attn"]["qkv"]
    assert "kernel_q" in qkv and qkv["kernel_q"].dtype == jnp.int8


def test_flux_sharded_index_is_exercised(flux_cache):
    root, _ = flux_cache
    idx = root / "text_encoder_2" / "model.safetensors.index.json"
    assert idx.exists()
    import json

    weight_map = json.loads(idx.read_text())["weight_map"]
    assert len(set(weight_map.values())) == 2  # genuinely multi-shard


def test_flux_corrupt_shape_fails_loudly(flux_cache, tmp_path):
    """A wrong-shaped tensor in the checkpoint must fail at load with a
    path-qualified error, not at trace time."""
    import shutil

    from flux_generator_tpu.io.loaders import load_flux_pipeline
    from flux_generator_tpu.io.synthetic import bfl_flux_state, save_safetensors

    root, configs = flux_cache
    bad = tmp_path / "bad"
    shutil.copytree(root, bad)
    state = bfl_flux_state(configs[0])
    state["img_in.weight"] = state["img_in.weight"][:, :-1]  # truncate
    save_safetensors(bad / "flux1-schnell.safetensors", state)
    with pytest.raises(ValueError, match="img_in"):
        load_flux_pipeline("flux-schnell", dtype=jnp.float32,
                           local_dir=str(bad), configs=configs)


def test_sd_load_and_generate(tmp_path):
    from flux_generator_tpu.io.loaders import load_sd_pipeline

    make_sd_cache(tmp_path)
    pipe = load_sd_pipeline("stable-diffusion-2-1-base", dtype=jnp.float32,
                            local_dir=str(tmp_path))
    for x_t in pipe.generate_latents("a cat", num_steps=1, cfg_weight=1.0,
                                     latent_size=(8, 8), seed=3):
        pass
    imgs = pipe.decode(x_t)
    assert imgs.shape[-1] == 3
    assert np.isfinite(np.asarray(imgs, np.float32)).all()


def test_sdxl_load_and_generate(tmp_path):
    from flux_generator_tpu.io.loaders import load_sd_pipeline
    from flux_generator_tpu.pipelines.sd import StableDiffusionXL

    make_sd_cache(tmp_path, xl=True)
    pipe = load_sd_pipeline("sdxl-turbo-synthetic-xl", dtype=jnp.float32,
                            local_dir=str(tmp_path))
    assert isinstance(pipe, StableDiffusionXL)
    assert "clip_2" in pipe.params
    for x_t in pipe.generate_latents("a cat", num_steps=1, cfg_weight=0.0,
                                     latent_size=(8, 8), seed=3):
        pass
    imgs = pipe.decode(x_t)
    assert np.isfinite(np.asarray(imgs, np.float32)).all()


def test_musicgen_load_and_generate(tmp_path):
    from flux_generator_tpu.io.loaders import load_musicgen_pipeline

    make_musicgen_cache(tmp_path)
    pipe = load_musicgen_pipeline(dtype=jnp.float32, local_dir=str(tmp_path))
    audio = pipe.generate("piano music", max_steps=6, top_k=4, seed=1)
    assert np.isfinite(np.asarray(audio, np.float32)).all()
    assert np.asarray(audio).size > 0
