"""Stable Diffusion 2.1 / SDXL-Turbo pipelines — TPU-native.

Parity with stable_diffusion/stable_diffusion/__init__.py: CLIP conditioning
with negative prompt, CFG by 2x-batched UNet then eps_neg + w·(eps_text −
eps_neg), Euler (SD) / Euler-ancestral (SDXL) denoising, img2img from a
strength-scaled start step, decode with clip(x/2+0.5, 0, 1).

TPU-first: the denoise loop is one jitted `lax.scan` (per-step PRNG keys for
the ancestral sampler are folded in on-device); seeds are explicit keys
(the reference falls back to time()-seeded global state, sd/__init__.py:113).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip.text import (
    CLIPTextConfig,
    clip_text_forward,
    init_clip_text,
    tiny_clip_config,
)
from ..models.sd import sampler as smp
from ..models.sd.config import (
    AutoencoderConfig,
    DiffusionConfig,
    UNetConfig,
    tiny_sd_ae_config,
    tiny_unet_config,
)
from ..models.sd.unet import init_unet, unet_forward
from ..models.sd.vae import init_sd_vae, sd_vae_decode, sd_vae_encode

_DEFAULT_MODEL = "stabilityai/sdxl-turbo"


class StableDiffusion:
    """Base SD pipeline (Euler sampler, single CLIP encoder)."""

    ancestral = False

    def __init__(
        self,
        model: str,
        params: dict,
        unet_cfg: UNetConfig,
        ae_cfg: AutoencoderConfig,
        clip_cfgs,
        diffusion_cfg: DiffusionConfig = DiffusionConfig(),
        tokenizers=None,
        dtype=jnp.bfloat16,
    ):
        self.model = model
        self.params = params
        self.unet_cfg = unet_cfg
        self.ae_cfg = ae_cfg
        self.clip_cfgs = clip_cfgs if isinstance(clip_cfgs, (list, tuple)) else [clip_cfgs]
        self.diffusion_cfg = diffusion_cfg
        self.tokenizers = tokenizers if isinstance(tokenizers, (list, tuple)) else [tokenizers]
        self.dtype = dtype
        self.sigmas = smp.make_sigmas(diffusion_cfg)

        self._text_encode = jax.jit(self._text_encode_impl)
        self._denoise = jax.jit(self._denoise_impl, static_argnames=("cfg_on",))
        self._step = jax.jit(self._step_impl, static_argnames=("cfg_on",))
        def _vae_decode(p, z):
            from ..ops.tiling import batched_apply, tiled_decode_2d

            def one(zi):
                # beyond 1024² the full-image decoder's conv activations OOM
                # — overlap-tiled decode bounds the footprint (ops/tiling)
                if max(zi.shape[1], zi.shape[2]) > 128:
                    factor = 2 ** (len(self.ae_cfg.block_out_channels) - 1)
                    return tiled_decode_2d(
                        lambda zt: sd_vae_decode(p, self.ae_cfg, zt),
                        zi, tile=96, overlap=16, factor=factor,
                    )
                return sd_vae_decode(p, self.ae_cfg, zi)

            # batch × resolution beyond one 1024² image: decode per image —
            # batch 2 @1024² OOMs a 16 GB chip otherwise
            img = batched_apply(one, z, pixel_limit=128 * 128)
            return jnp.clip(img / 2 + 0.5, 0, 1)

        self._decode = jax.jit(_vae_decode)
        # uint8 variant: quantize pixels on device — serving PNG-encodes from
        # uint8 anyway, and the fetch moves 4x fewer bytes
        self._decode_u8 = jax.jit(
            lambda p, z: (_vae_decode(p, z).astype(jnp.float32) * 255).astype(jnp.uint8)
        )
        def _vae_encode(p, x):
            from ..ops.tiling import batched_apply, tiled_decode_2d

            def one(xi):
                if max(xi.shape[1], xi.shape[2]) > 1024:
                    factor = 2 ** (len(self.ae_cfg.block_out_channels) - 1)
                    return tiled_decode_2d(
                        lambda xt: sd_vae_encode(p, self.ae_cfg, xt)[0],
                        xi, tile=768, overlap=128, factor=1 / factor,
                    )
                return sd_vae_encode(p, self.ae_cfg, xi)[0]

            return batched_apply(one, x, pixel_limit=1024 * 1024)

        self._encode = jax.jit(_vae_encode)

    # -------------------------------------------------- constructors

    @classmethod
    def random_init(cls, model: str = _DEFAULT_MODEL, key=None, tiny: bool = True,
                    dtype=jnp.float32):
        key = key if key is not None else jax.random.PRNGKey(0)
        if not tiny:
            raise NotImplementedError("full-size random init: use from_pretrained")
        unet_cfg = tiny_unet_config()
        ae_cfg = tiny_sd_ae_config()
        clip_cfg = tiny_clip_config(model_dims=unet_cfg.cross_attention_dim[0])
        ks = jax.random.split(key, 3)
        params = {
            "unet": init_unet(ks[0], unet_cfg, dtype),
            "vae": init_sd_vae(ks[1], ae_cfg, dtype),
            "clip": init_clip_text(ks[2], clip_cfg, dtype),
        }
        return cls(model, params, unet_cfg, ae_cfg, clip_cfg, dtype=dtype)

    @classmethod
    def from_pretrained(cls, model: str = _DEFAULT_MODEL, dtype=jnp.bfloat16,
                        quantize: bool = False):
        from ..io.loaders import load_sd_pipeline

        return load_sd_pipeline(model, cls=cls, dtype=dtype, quantize=quantize)

    # -------------------------------------------------- conditioning

    def _pad_rows(self, rows, tokenizer, cfg=None):
        """Pad token rows to the model's FIXED max_length so the
        conditioning sequence length never depends on the prompt — or, in
        the coalesced path, on co-batched users' prompts. Solo and
        coalesced runs therefore see identical cross-attention keys, and
        the UNet denoise program compiles once instead of once per prompt
        length. Rows longer than the position table are truncated with EOS
        re-forced (CLIP pools at the EOS position)."""
        n = (cfg or self.clip_cfgs[0]).max_length
        eos = getattr(tokenizer, "eos_token", None)
        out = []
        for r in rows:
            if len(r) > n:
                r = r[:n]
                if eos is not None:
                    r[-1] = eos
            out.append(r + [0] * (n - len(r)))
        return jnp.array(out)

    def _tokenize(self, tokenizer, text: str, negative_text: Optional[str] = None,
                  cfg=None):
        rows = [tokenizer.tokenize(text)]
        if negative_text is not None:
            rows.append(tokenizer.tokenize(negative_text))
        return self._pad_rows(rows, tokenizer, cfg)

    def _text_encode_impl(self, clip_params, tokens):
        return clip_text_forward(clip_params, self.clip_cfgs[0], tokens)[
            "last_hidden_state"
        ]

    def get_text_conditioning(self, text, n_images=1, cfg_weight=7.5, negative_text=""):
        tokens = self._tokenize(
            self.tokenizers[0], text, negative_text if cfg_weight > 1 else None
        )
        conditioning = self._text_encode(self.params["clip"], tokens).astype(self.dtype)
        if n_images > 1:
            conditioning = jnp.repeat(conditioning, n_images, axis=0)
        return conditioning

    # -------------------------------------------------- denoising

    def _eps(self, unet_params, x_t, t, conditioning, cfg_weight, cfg_on, text_time):
        x_in = jnp.concatenate([x_t] * 2, axis=0) if cfg_on else x_t
        t_in = jnp.broadcast_to(t, (x_in.shape[0],))
        eps = unet_forward(
            unet_params, self.unet_cfg, x_in, t_in, conditioning, text_time=text_time
        )
        if cfg_on:
            eps_text, eps_neg = jnp.split(eps, 2, axis=0)
            eps = eps_neg + cfg_weight.astype(eps.dtype) * (eps_text - eps_neg)
        return eps

    def _step_impl(self, unet_params, x_t, t, t_prev, conditioning, cfg_weight,
                   key, cfg_on, text_time=None):
        eps = self._eps(unet_params, x_t, t, conditioning, cfg_weight, cfg_on, text_time)
        if self.ancestral:
            return smp.euler_ancestral_step(key, self.sigmas, eps, x_t, t, t_prev)
        return smp.euler_step(self.sigmas, eps, x_t, t, t_prev)

    def _denoise_impl(self, unet_params, x_T, ts, conditioning, cfg_weight, key,
                      cfg_on, text_time=None):
        def body(carry, inp):
            x, i = carry
            t, t_prev = inp
            k = jax.random.fold_in(key, i)
            x = self._step_impl(
                unet_params, x, t, t_prev, conditioning, cfg_weight, k, cfg_on,
                text_time,
            )
            return (x, i + 1), None

        pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
        (x, _), _ = jax.lax.scan(body, (x_T, 0), pairs)
        return x

    def denoise(self, x_T, conditioning, num_steps, cfg_weight, seed_key,
                start_time=None, text_time=None):
        ts = jnp.asarray(
            smp.timesteps(self.sigmas, num_steps, start_time), jnp.float32
        )
        return self._denoise(
            self.params["unet"], x_T, ts, conditioning,
            jnp.asarray(cfg_weight, jnp.float32), seed_key,
            cfg_on=cfg_weight > 1, text_time=text_time,
        )

    # -------------------------------------------------- generation (parity API)

    def _make_text_time(self, pooled, n):
        return None

    def generate_latents(
        self,
        text: str,
        n_images: int = 1,
        num_steps: int = 50,
        cfg_weight: float = 7.5,
        negative_text: str = "",
        latent_size: Tuple[int, int] = (64, 64),
        seed=None,
    ):
        key = jax.random.PRNGKey(np.random.randint(1 << 31) if seed is None else seed)
        k_prior, k_steps = jax.random.split(key)
        conditioning = self.get_text_conditioning(text, n_images, cfg_weight, negative_text)
        text_time = self._text_time_for(conditioning, n_images)
        if text_time is not None:
            conditioning = conditioning[0]
        x_t = smp.sample_prior(
            k_prior, self.sigmas,
            (n_images, *latent_size, self.ae_cfg.latent_channels_in), self.dtype,
        )
        ts = smp.timesteps(self.sigmas, num_steps)
        cfg_on = cfg_weight > 1
        for i in range(num_steps):
            x_t = self._step(
                self.params["unet"], x_t, jnp.asarray(ts[i]), jnp.asarray(ts[i + 1]),
                conditioning, jnp.asarray(cfg_weight, jnp.float32),
                jax.random.fold_in(k_steps, i), cfg_on, text_time,
            )
            yield x_t

    def _text_time_for(self, conditioning, n_images):
        return None

    # ------------------------------------------- batched multi-prompt path

    def _batch_tokens(self, tokenizer, texts, negative_text, cfg_on, cfg=None):
        """(text rows..., then negative rows when CFG) padded to the model's
        fixed max_length — the CFG double-batch layout _eps expects
        (eps_text | eps_neg), with conditioning identical to solo runs."""
        rows = [tokenizer.tokenize(t) for t in texts]
        if cfg_on:
            rows += [tokenizer.tokenize(negative_text)] * len(texts)
        return self._pad_rows(rows, tokenizer, cfg)

    def _batch_conditioning(self, texts, cfg_weight, negative_text):
        tokens = self._batch_tokens(
            self.tokenizers[0], texts, negative_text, cfg_weight > 1
        )
        return self._text_encode(self.params["clip"], tokens).astype(self.dtype)

    def generate_latents_batch(self, texts, seeds, num_steps: int = 50,
                               cfg_weight: float = 7.5, negative_text: str = "",
                               latent_size: Tuple[int, int] = (64, 64)):
        """Batched multi-PROMPT generation: n different prompts, n seeds, one
        denoise program — the SD analog of FluxPipeline.generate_latents_batch
        that the serving coalescer drives (the reference serializes every SD
        request through its Gradio queue). Yields one latent batch per step.
        Per-item priors are seeded individually; the ancestral noise stream is
        shared across the batch (per-element via shape), so outputs match
        single runs exactly for Euler (SD2.1) and statistically for
        ancestral (SDXL)."""
        n = len(texts)
        assert n == len(seeds)
        conditioning = self._batch_conditioning(texts, cfg_weight, negative_text)
        text_time = self._text_time_for(conditioning, n)
        if text_time is not None:
            conditioning = conditioning[0]
        priors = [
            # same key derivation as generate_latents (split(key)[0]) so a
            # coalesced image is bit-identical to the same seed run alone
            # (Euler; ancestral shares the step stream across the batch)
            smp.sample_prior(
                jax.random.split(
                    jax.random.PRNGKey(0 if s is None else int(s))
                )[0],
                self.sigmas,
                (1, *latent_size, self.ae_cfg.latent_channels_in), self.dtype,
            )
            for s in seeds
        ]
        x_t = jnp.concatenate(priors, axis=0)
        k_steps = jax.random.PRNGKey(
            0 if seeds[0] is None else int(seeds[0]) ^ 0x5EED
        )
        ts = smp.timesteps(self.sigmas, num_steps)
        cfg_on = cfg_weight > 1
        for i in range(num_steps):
            x_t = self._step(
                self.params["unet"], x_t, jnp.asarray(ts[i]), jnp.asarray(ts[i + 1]),
                conditioning, jnp.asarray(cfg_weight, jnp.float32),
                jax.random.fold_in(k_steps, i), cfg_on, text_time,
            )
            yield x_t

    def generate_latents_from_image(
        self,
        image,
        text: str,
        n_images: int = 1,
        strength: float = 0.8,
        num_steps: int = 50,
        cfg_weight: float = 7.5,
        negative_text: str = "",
        seed=None,
    ):
        key = jax.random.PRNGKey(np.random.randint(1 << 31) if seed is None else seed)
        k_noise, k_steps = jax.random.split(key)
        start_step = smp.max_time(self.sigmas) * strength
        num_steps = int(num_steps * strength)

        conditioning = self.get_text_conditioning(text, n_images, cfg_weight, negative_text)
        text_time = self._text_time_for(conditioning, n_images)
        if text_time is not None:
            conditioning = conditioning[0]

        x_0 = self._encode(self.params["vae"], image[None].astype(self.dtype))
        x_0 = jnp.broadcast_to(x_0, (n_images, *x_0.shape[1:]))
        x_t = smp.add_noise(k_noise, self.sigmas, x_0, jnp.asarray(start_step))

        ts = smp.timesteps(self.sigmas, num_steps, start_time=start_step)
        cfg_on = cfg_weight > 1
        for i in range(num_steps):
            x_t = self._step(
                self.params["unet"], x_t, jnp.asarray(ts[i]), jnp.asarray(ts[i + 1]),
                conditioning, jnp.asarray(cfg_weight, jnp.float32),
                jax.random.fold_in(k_steps, i), cfg_on, text_time,
            )
            yield x_t

    def decode(self, x_t):
        return self._decode(self.params["vae"], x_t)

    def decode_u8(self, x_t):
        """Decode straight to uint8 RGB on device (the serving fast path)."""
        return self._decode_u8(self.params["vae"], x_t)


class StableDiffusionXL(StableDiffusion):
    """SDXL(-Turbo): dual CLIP encoders, text_time micro-conditioning,
    Euler-ancestral sampler (sd/__init__.py:172-306)."""

    ancestral = True

    @classmethod
    def random_init(cls, model: str = _DEFAULT_MODEL, key=None, tiny: bool = True,
                    dtype=jnp.float32):
        key = key if key is not None else jax.random.PRNGKey(0)
        if not tiny:
            raise NotImplementedError("full-size random init: use from_pretrained")
        clip1 = tiny_clip_config(model_dims=8)
        clip2 = tiny_clip_config(model_dims=8, projection_dim=8)
        unet_cfg = tiny_unet_config(
            cross_attention_dim=(16, 16),
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=8 + 6 * 8,
        )
        ae_cfg = tiny_sd_ae_config()
        ks = jax.random.split(key, 4)
        params = {
            "unet": init_unet(ks[0], unet_cfg, dtype),
            "vae": init_sd_vae(ks[1], ae_cfg, dtype),
            "clip": init_clip_text(ks[2], clip1, dtype),
            "clip_2": init_clip_text(ks[3], clip2, dtype),
        }
        return cls(model, params, unet_cfg, ae_cfg, [clip1, clip2], dtype=dtype)

    def get_text_conditioning(self, text, n_images=1, cfg_weight=7.5, negative_text=""):
        neg = negative_text if cfg_weight > 1 else None
        toks1 = self._tokenize(self.tokenizers[0], text, neg, cfg=self.clip_cfgs[0])
        toks2 = self._tokenize(
            self.tokenizers[1] if len(self.tokenizers) > 1 else self.tokenizers[0],
            text, neg, cfg=self.clip_cfgs[1],
        )
        out1 = clip_text_forward(self.params["clip"], self.clip_cfgs[0], toks1)
        out2 = clip_text_forward(self.params["clip_2"], self.clip_cfgs[1], toks2)
        conditioning = jnp.concatenate(
            [out1["hidden_states"][-2], out2["hidden_states"][-2]], axis=-1
        ).astype(self.dtype)
        pooled = out2["pooled_output"].astype(self.dtype)
        if n_images > 1:
            conditioning = jnp.repeat(conditioning, n_images, axis=0)
            pooled = jnp.repeat(pooled, n_images, axis=0)
        return conditioning, pooled

    def _batch_conditioning(self, texts, cfg_weight, negative_text):
        cfg_on = cfg_weight > 1
        toks1 = self._batch_tokens(self.tokenizers[0], texts, negative_text,
                                   cfg_on, cfg=self.clip_cfgs[0])
        toks2 = self._batch_tokens(
            self.tokenizers[1] if len(self.tokenizers) > 1 else self.tokenizers[0],
            texts, negative_text, cfg_on, cfg=self.clip_cfgs[1],
        )
        out1 = clip_text_forward(self.params["clip"], self.clip_cfgs[0], toks1)
        out2 = clip_text_forward(self.params["clip_2"], self.clip_cfgs[1], toks2)
        conditioning = jnp.concatenate(
            [out1["hidden_states"][-2], out2["hidden_states"][-2]], axis=-1
        ).astype(self.dtype)
        pooled = out2["pooled_output"].astype(self.dtype)
        return conditioning, pooled

    def _text_time_for(self, conditioning, n_images):
        conditioning, pooled = conditioning
        time_ids = jnp.array([[512, 512, 0, 0, 512, 512.0]] * pooled.shape[0])
        return (pooled, time_ids)

    def generate_latents(self, text, n_images=1, num_steps=2, cfg_weight=0.0,
                         negative_text="", latent_size=(64, 64), seed=None):
        yield from super().generate_latents(
            text, n_images, num_steps, cfg_weight, negative_text, latent_size, seed
        )

    def generate_latents_from_image(self, image, text, n_images=1, strength=0.8,
                                    num_steps=2, cfg_weight=0.0, negative_text="",
                                    seed=None):
        yield from super().generate_latents_from_image(
            image, text, n_images, strength, num_steps, cfg_weight, negative_text, seed
        )
