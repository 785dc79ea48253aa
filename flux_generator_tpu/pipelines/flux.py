"""Flux text-to-image pipeline — TPU-native.

Capability parity with flux/flux.py (FluxPipeline): tokenize → T5/CLIP
conditioning → 2x2 latent patchify with 3-axis position ids → flow-matching
denoise → unpatchify + VAE decode, plus the conditioning-first generator
protocol (flux/flux.py:128-155) that the server drives step-by-step, and the
flow-matching training loss (flux/flux.py:195-227).

TPU-first differences:
  - The whole denoise loop runs inside ONE jitted `lax.scan` over the
    timestep schedule (`denoise_latents`) — no host↔device sync per step
    (the reference mx.eval's every step, flux_app.py:171-176).
  - Seeds are explicit `jax.random` keys threaded per request.
  - Compiled executables are cached per (batch, latent-size, steps) bucket by
    jax.jit's own cache; serving quantizes sizes to 16px so the bucket count
    stays small (see server.api.to_latent_size).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip.text import CLIPTextConfig, clip_text_forward, init_clip_text, tiny_clip_config
from ..models.flux import autoencoder as ae_mod
from ..models.flux import sampler as sampler_mod
from ..models.flux.autoencoder import AutoEncoderConfig, tiny_ae_config
from ..models.flux.model import FluxConfig, flux_forward, init_flux, tiny_flux_config
from ..models.t5.t5 import T5Config, init_t5_encoder, t5_encode, tiny_t5_config


# ------------------------------------------------------------ latent packing


def pack_latents(x):
    """(B, h, w, c) → (B, h·w/4, 4c): 2x2 patch packing (flux/flux.py:53-58)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h * w // 4, c * 4)


def unpack_latents(x, h: int, w: int):
    """(B, h·w/4, 4c) → (B, h, w, c) (flux/flux.py:157-160)."""
    b = x.shape[0]
    x = x.reshape(b, h // 2, w // 2, -1, 2, 2)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, -1)


def latent_ids(batch: int, h: int, w: int):
    """3-axis position ids for packed patches: (const 0, row, col)
    (flux/flux.py:60-71)."""
    j, k = jnp.meshgrid(jnp.arange(h // 2), jnp.arange(w // 2), indexing="ij")
    ids = jnp.stack([jnp.zeros_like(j), j, k], axis=-1).reshape(1, -1, 3)
    return jnp.broadcast_to(ids, (batch, h * w // 4, 3))


# ------------------------------------------------------------ pipeline


class FluxPipeline:
    def __init__(
        self,
        name: str,
        params: dict,
        flow_cfg: FluxConfig,
        ae_cfg: AutoEncoderConfig,
        clip_cfg: CLIPTextConfig,
        t5_cfg: T5Config,
        clip_tokenizer=None,
        t5_tokenizer=None,
        dtype=jnp.bfloat16,
    ):
        self.name = name
        self.params = params
        self.flow_cfg = flow_cfg
        self.ae_cfg = ae_cfg
        self.clip_cfg = clip_cfg
        self.t5_cfg = t5_cfg
        self.clip_tokenizer = clip_tokenizer
        self.t5_tokenizer = t5_tokenizer
        self.dtype = dtype
        self.schnell = "schnell" in name

        # jitted entry points (shape-bucketed by jit's executable cache)
        self._t5_encode = jax.jit(
            lambda p, toks: t5_encode(p, self.t5_cfg, toks)
        )
        self._clip_pooled = jax.jit(
            lambda p, toks: clip_text_forward(p, self.clip_cfg, toks)["pooled_output"]
        )
        self._denoise = jax.jit(self._denoise_impl)
        self._step = jax.jit(self._step_impl)
        # whole-request program: conditioning + denoise + uint8 decode in ONE
        # executable — no inter-program dispatch (the serving one-shot path)
        self._e2e = jax.jit(self._e2e_impl, static_argnums=(4, 5, 6))
        self._decode = jax.jit(self._decode_impl, static_argnums=(2, 3, 4))
        def _encode_impl(p, x):
            from ..ops.tiling import batched_apply, tiled_decode_2d

            def one(xi):
                # large img2img inputs: tiled encode (same memory bound as
                # the tiled decode; latent means blend across overlaps)
                if max(xi.shape[1], xi.shape[2]) > 1024:
                    return tiled_decode_2d(
                        lambda xt: ae_mod.encode(p["ae"], self.ae_cfg, xt),
                        xi, tile=768, overlap=128,
                        factor=1 / self.ae_downsample,
                    )
                return ae_mod.encode(p["ae"], self.ae_cfg, xi)

            return batched_apply(one, x, pixel_limit=1024 * 1024)

        self._encode_image = jax.jit(_encode_impl)

    # -------------------------------------------------- constructors

    @classmethod
    def random_init(cls, name: str = "flux-schnell", key=None, tiny: bool = False,
                    dtype=jnp.bfloat16, **cfg_overrides):
        """Randomly initialized pipeline (tests, benchmarks, offline dev)."""
        from ..io.registry import flux_configs

        key = key if key is not None else jax.random.PRNGKey(0)
        if tiny:
            flow_cfg = tiny_flux_config(guidance_embed="dev" in name, **cfg_overrides)
            ae_cfg = tiny_ae_config(z_channels=flow_cfg.in_channels // 4)
            clip_cfg = tiny_clip_config(model_dims=flow_cfg.vec_in_dim)
            t5_cfg = tiny_t5_config(d_model=flow_cfg.context_in_dim)
        else:
            flow_cfg, ae_cfg, clip_cfg, t5_cfg = flux_configs(name)
        ks = jax.random.split(key, 4)
        params = {
            "flow": init_flux(ks[0], flow_cfg, dtype),
            "ae": ae_mod.init_autoencoder(ks[1], ae_cfg, dtype),
            "clip": init_clip_text(ks[2], clip_cfg, dtype),
            "t5": init_t5_encoder(ks[3], t5_cfg, dtype),
        }
        return cls(name, params, flow_cfg, ae_cfg, clip_cfg, t5_cfg, dtype=dtype)

    @classmethod
    def from_pretrained(cls, name: str = "flux-schnell", dtype=jnp.bfloat16,
                        **kwargs):
        from ..io.loaders import load_flux_pipeline

        return load_flux_pipeline(name, dtype=dtype, **kwargs)

    def shard(self, mesh=None):
        """Tensor-parallel-shard the flow + T5 weights over a ("data",
        "model") mesh (parallel.sharding rules); activations stay batch-
        sharded. Call once after load for multi-chip serving."""
        from ..parallel.mesh import create_mesh
        from ..parallel.sharding import replicate, shard_params

        import jax

        mesh = mesh or create_mesh(data=1, model=len(jax.devices()))
        self.mesh = mesh
        self.params["flow"] = shard_params(self.params["flow"], mesh)
        self.params["t5"] = shard_params(self.params["t5"], mesh)
        self.params["clip"] = replicate(self.params["clip"], mesh)
        self.params["ae"] = replicate(self.params["ae"], mesh)
        return self

    def enable_pipeline_parallel(self, mesh=None, axis: str = "pipe",
                                 microbatches: Optional[int] = None):
        """Pipeline-parallel the flow over `mesh.shape[axis]` stages: each
        device holds a contiguous chunk of double/single blocks (weights
        stage-sharded — the memory win that lets a model larger than one
        chip's HBM serve), and microbatches stream GPipe-style
        (parallel/pipeline.py). Stacks are zero-padded to a stage multiple
        (zero blocks are exact identities — gated residuals). Inference
        feature: enable AFTER any quantize/LoRA-fuse, BEFORE first call."""
        import numpy as np
        from jax.sharding import Mesh

        from ..parallel.pipeline import pad_stack, shard_pipeline_params

        if mesh is None:
            devs = jax.devices()
            mesh = Mesh(np.array(devs), (axis,))
        stages = mesh.shape[axis]
        flow = self.params["flow"]
        for name in ("double_blocks", "single_blocks"):
            padded, _ = pad_stack(flow[name], stages)
            flow[name] = shard_pipeline_params(padded, mesh, axis)
        self.pp = (mesh, axis, microbatches)
        # re-wrap the jitted entries: the pp flag is baked into traces, so a
        # fresh jit cache guarantees no stale non-pp executable is reused
        # (_e2e too — the fused one-program path also traces through _flow)
        self._denoise = jax.jit(self._denoise_impl)
        self._step = jax.jit(self._step_impl)
        self._e2e = jax.jit(self._e2e_impl, static_argnums=(4, 5, 6))
        return self

    def enable_ring_attention(self, mesh=None, axis: str = "model",
                              threshold: int = 32768):
        """Sequence-parallel attention for very large generations (≥2048² →
        16k+ image tokens): shard the token axis over `axis` of `mesh` and
        ring-rotate K/V via ppermute (parallel.ring_attention). Applies to
        every attention whose sequence length is >= threshold AND divisible
        by the mesh axis; shorter sequences keep the single-device path."""
        from ..parallel.mesh import create_mesh
        from ..runtime.config import set_ring_attention

        mesh = mesh or create_mesh(data=1, model=len(jax.devices()))
        set_ring_attention(mesh, axis=axis, threshold=threshold)
        return self

    # -------------------------------------------------- text conditioning

    @property
    def ae_downsample(self) -> int:
        """Spatial factor of the autoencoder (8 at full size; tiny test
        configs use fewer levels)."""
        return 2 ** (len(self.ae_cfg.ch_mult) - 1)

    def tokenize(self, text):
        if self.t5_tokenizer is None or self.clip_tokenizer is None:
            raise RuntimeError(
                "pipeline built without tokenizers (random_init); pass token "
                "arrays directly or load with from_pretrained"
            )
        t5_tokens = jnp.array(self.t5_tokenizer.encode(text))
        clip_tokens = jnp.array(self.clip_tokenizer.encode(text))
        return t5_tokens, clip_tokens

    def prepare_conditioning(self, n_images: int, t5_tokens, clip_tokens):
        txt = self._t5_encode(self.params["t5"], t5_tokens).astype(self.dtype)
        if txt.shape[0] == 1 and n_images > 1:
            txt = jnp.broadcast_to(txt, (n_images, *txt.shape[1:]))
        txt_ids = jnp.zeros((n_images, txt.shape[1], 3), jnp.int32)
        vec = self._clip_pooled(self.params["clip"], clip_tokens).astype(self.dtype)
        if vec.shape[0] == 1 and n_images > 1:
            vec = jnp.broadcast_to(vec, (n_images, *vec.shape[1:]))
        return txt, txt_ids, vec

    # -------------------------------------------------- denoising

    def _flow(self, flow_params, x_t, x_ids, txt, txt_ids, vec, t, guidance):
        b = x_t.shape[0]
        return flux_forward(
            flow_params,
            self.flow_cfg,
            img=x_t,
            img_ids=x_ids,
            txt=txt,
            txt_ids=txt_ids,
            timesteps=jnp.full((b,), t, self.dtype),
            y=vec,
            guidance=jnp.full((b,), guidance, self.dtype)
            if self.flow_cfg.guidance_embed
            else None,
            pp=getattr(self, "pp", None),
        )

    def _step_impl(self, flow_params, x_t, x_ids, txt, txt_ids, vec, t, t_prev, guidance):
        pred = self._flow(flow_params, x_t, x_ids, txt, txt_ids, vec, t, guidance)
        return x_t + (t_prev - t).astype(x_t.dtype) * pred

    def _denoise_impl(self, flow_params, x_t, x_ids, txt, txt_ids, vec, ts, guidance):
        """One jitted lax.scan over all denoise steps; ts: (steps+1,)."""

        def body(x, t_pair):
            t, t_prev = t_pair
            x = self._step_impl(
                flow_params, x, x_ids, txt, txt_ids, vec, t, t_prev, guidance
            )
            return x, None

        pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
        x_t, _ = jax.lax.scan(body, x_t, pairs)
        return x_t

    def timesteps(self, num_steps: int, image_seq_len: int) -> np.ndarray:
        return sampler_mod.flux_timesteps(num_steps, image_seq_len, self.schnell)

    # -------------------------------------------------- generation

    def generate_latents(
        self,
        text: str,
        n_images: int = 1,
        num_steps: int = 35,
        guidance: float = 4.0,
        latent_size: Tuple[int, int] = (64, 64),
        seed: Optional[int] = None,
    ):
        """Generator protocol parity (flux/flux.py:128-155): first yields the
        conditioning tuple, then one latent per denoise step. Each step is a
        jitted device call; use `denoise_latents` for the fused fast path."""
        key = jax.random.PRNGKey(0 if seed is None else seed)
        h, w = latent_size
        x = sampler_mod.sample_prior(key, (n_images, h, w, self.ae_cfg.z_channels), self.dtype)
        x_t = pack_latents(x)
        x_ids = latent_ids(n_images, h, w)

        t5_tokens, clip_tokens = self.tokenize(text)
        txt, txt_ids, vec = self.prepare_conditioning(n_images, t5_tokens, clip_tokens)
        yield (x_t, x_ids, txt, txt_ids, vec)

        ts = self.timesteps(num_steps, x_t.shape[1])
        g = jnp.asarray(guidance, self.dtype)
        for i in range(num_steps):
            x_t = self._step(
                self.params["flow"], x_t, x_ids, txt, txt_ids, vec,
                jnp.asarray(ts[i], self.dtype), jnp.asarray(ts[i + 1], self.dtype), g,
            )
            yield x_t

    def generate_latents_batch(
        self,
        texts,
        seeds,
        num_steps: int = 2,
        guidance: float = 4.0,
        latent_size: Tuple[int, int] = (64, 64),
    ):
        """Batched multi-PROMPT generation: n different prompts with n
        different seeds denoise in ONE batched program (the serving layer
        coalesces concurrent users into this — the reference serializes
        every request through its Gradio queue). Same generator protocol:
        yields conditioning, then one latent batch per step."""
        h, w = latent_size
        n = len(texts)
        assert n == len(seeds)
        t5_rows, clip_rows = [], []
        for text in texts:
            t5_tok, clip_tok = self.tokenize(text)
            t5_rows.append(t5_tok)
            clip_rows.append(clip_tok)
        t5_tokens = jnp.concatenate(t5_rows, axis=0)
        clip_tokens = jnp.concatenate(clip_rows, axis=0)

        # per-request noise streams: one key per seed
        priors = [
            sampler_mod.sample_prior(
                jax.random.PRNGKey(0 if s is None else int(s)),
                (1, h, w, self.ae_cfg.z_channels), self.dtype,
            )
            for s in seeds
        ]
        x_t = pack_latents(jnp.concatenate(priors, axis=0))
        x_ids = latent_ids(n, h, w)

        txt, txt_ids, vec = self.prepare_conditioning(n, t5_tokens, clip_tokens)
        yield (x_t, x_ids, txt, txt_ids, vec)

        ts = self.timesteps(num_steps, x_t.shape[1])
        g = jnp.asarray(guidance, self.dtype)
        for i in range(num_steps):
            x_t = self._step(
                self.params["flow"], x_t, x_ids, txt, txt_ids, vec,
                jnp.asarray(ts[i], self.dtype), jnp.asarray(ts[i + 1], self.dtype), g,
            )
            yield x_t

    def generate_latents_from_image(
        self,
        image,
        text: str,
        n_images: int = 1,
        strength: float = 0.8,
        num_steps: Optional[int] = None,
        guidance: float = 4.0,
        seed: Optional[int] = None,
    ):
        """Flux img2img — an addition over the reference, whose img2img is
        SD-only (stable_diffusion/image2image.py). Encode the image in [-1,1]
        (B|1, H, W, 3), jump onto the flow-matching schedule at
        t ≈ strength (x_t = (1−t)·x₀ + t·ε — the rectified-flow analog of
        SD's add_noise-at-start-step), and denoise the remaining steps.
        strength 1 → pure noise (txt2img); small → stays near the input.
        Same conditioning-first generator protocol as generate_latents."""
        num_steps = num_steps or (2 if self.schnell else 35)
        key = jax.random.PRNGKey(0 if seed is None else seed)
        img = jnp.asarray(image, self.dtype)
        if img.ndim == 3:
            img = img[None]
        x0 = self._encode_image(self.params, img)
        h, w = x0.shape[1], x0.shape[2]
        x0 = pack_latents(x0)
        x0 = jnp.broadcast_to(x0, (n_images, *x0.shape[1:]))
        x_ids = latent_ids(n_images, h, w)

        ts = self.timesteps(num_steps, x0.shape[1])
        # first schedule index with t <= strength (≥1 denoise step)
        start = min(int(round((1 - strength) * num_steps)), num_steps - 1)
        eps = jax.random.normal(key, x0.shape, self.dtype)
        x_t = sampler_mod.add_noise(x0, jnp.asarray(ts[start], self.dtype), eps)

        t5_tokens, clip_tokens = self.tokenize(text)
        txt, txt_ids, vec = self.prepare_conditioning(n_images, t5_tokens, clip_tokens)
        yield (x_t, x_ids, txt, txt_ids, vec)

        g = jnp.asarray(guidance, self.dtype)
        for i in range(start, num_steps):
            x_t = self._step(
                self.params["flow"], x_t, x_ids, txt, txt_ids, vec,
                jnp.asarray(ts[i], self.dtype), jnp.asarray(ts[i + 1], self.dtype), g,
            )
            yield x_t

    def denoise_latents(self, x_t, x_ids, txt, txt_ids, vec, num_steps, guidance):
        """Fused fast path: entire schedule in one device program."""
        ts = jnp.asarray(self.timesteps(num_steps, x_t.shape[1]), self.dtype)
        return self._denoise(
            self.params["flow"], x_t, x_ids, txt, txt_ids, vec, ts,
            jnp.asarray(guidance, self.dtype),
        )

    def _decode_impl(self, ae_params, x, h: int, w: int, as_uint8: bool = False):
        z = unpack_latents(x, h, w)

        def one(zi):
            if max(h, w) > 128:
                # beyond 1024² the full-image decoder's conv activations
                # (>1 GB each) OOM next to the 12 GB flow — overlap-tiled
                # decode bounds the footprint (autoencoder.decode_tiled)
                return ae_mod.decode_tiled(ae_params, self.ae_cfg, zi)
            return ae_mod.decode(ae_params, self.ae_cfg, zi)

        # batch × resolution beyond one 1024² image: decode per image
        # (ops/tiling.batched_apply) — batch 2 @1024² OOMs otherwise
        from ..ops.tiling import batched_apply

        img = batched_apply(one, z, pixel_limit=128 * 128)
        img = jnp.clip(img + 1, 0, 2) * 0.5
        if as_uint8:
            # on-device pixel quantization: the serving path needs uint8 for
            # PNG encode anyway, and fetching uint8 moves 4x fewer bytes
            # device→host (the axon tunnel charges ~35 ms/MB)
            img = (jnp.clip(img, 0, 1).astype(jnp.float32) * 255).astype(jnp.uint8)
        return img

    def decode(self, x, latent_size: Tuple[int, int] = (64, 64)):
        h, w = latent_size
        return self._decode(self.params["ae"], x, h, w)

    def decode_u8(self, x, latent_size: Tuple[int, int] = (64, 64)):
        """Decode straight to uint8 RGB on device (the serving fast path)."""
        h, w = latent_size
        return self._decode(self.params["ae"], x, h, w, True)

    def _e2e_impl(self, params, tokens, key, guidance, num_steps: int,
                  h: int, w: int):
        """One-program request: T5 + CLIP encode → prior → denoise scan →
        uint8 decode. tokens: (t5 (B, Lt), clip (B, Lc))."""
        t5_tokens, clip_tokens = tokens
        n = t5_tokens.shape[0]
        txt = t5_encode(params["t5"], self.t5_cfg, t5_tokens).astype(self.dtype)
        txt_ids = jnp.zeros((n, txt.shape[1], 3), jnp.int32)
        vec = clip_text_forward(params["clip"], self.clip_cfg, clip_tokens)[
            "pooled_output"
        ].astype(self.dtype)
        x = sampler_mod.sample_prior(key, (n, h, w, self.ae_cfg.z_channels), self.dtype)
        x_t = pack_latents(x)
        x_ids = latent_ids(n, h, w)
        ts = jnp.asarray(self.timesteps(num_steps, x_t.shape[1]), self.dtype)
        x_t = self._denoise_impl(
            params["flow"], x_t, x_ids, txt, txt_ids, vec, ts, guidance
        )
        return self._decode_impl(params["ae"], x_t, h, w, True)

    def generate_images_fused(
        self,
        text: str,
        num_steps: Optional[int] = None,
        guidance: float = 4.0,
        latent_size: Tuple[int, int] = (64, 64),
        seed: Optional[int] = None,
    ):
        """The one-dispatch serving path: everything from token arrays to
        uint8 pixels runs as a single XLA program (no host round-trips
        between conditioning / denoise / decode)."""
        num_steps = num_steps or (2 if self.schnell else 35)
        t5_tokens, clip_tokens = self.tokenize(text)
        key = jax.random.PRNGKey(0 if seed is None else seed)
        h, w = latent_size
        return self._e2e(
            self.params, (jnp.asarray(t5_tokens), jnp.asarray(clip_tokens)),
            key, jnp.asarray(guidance, self.dtype), num_steps, h, w,
        )

    def generate_images(
        self,
        text: str,
        n_images: int = 1,
        num_steps: Optional[int] = None,
        guidance: float = 4.0,
        latent_size: Tuple[int, int] = (64, 64),
        seed: Optional[int] = None,
        as_uint8: bool = False,
    ):
        num_steps = num_steps or (2 if self.schnell else 35)
        key = jax.random.PRNGKey(0 if seed is None else seed)
        h, w = latent_size
        x = sampler_mod.sample_prior(key, (n_images, h, w, self.ae_cfg.z_channels), self.dtype)
        x_t = pack_latents(x)
        x_ids = latent_ids(n_images, h, w)
        t5_tokens, clip_tokens = self.tokenize(text)
        txt, txt_ids, vec = self.prepare_conditioning(n_images, t5_tokens, clip_tokens)
        x_t = self.denoise_latents(x_t, x_ids, txt, txt_ids, vec, num_steps, guidance)
        if as_uint8:
            return self.decode_u8(x_t, latent_size)
        return self.decode(x_t, latent_size)

    # -------------------------------------------------- training

    def training_loss(self, flow_params, key, x_0, t5_features, clip_features, guidance):
        """Flow-matching loss (flux/flux.py:195-227): target eps - x_0, loss
        mean((pred + x_0 - eps)^2), timesteps from the schnell/dev schedule."""
        txt = t5_features
        txt_ids = jnp.zeros((*txt.shape[:-1], 3), jnp.int32)
        vec = clip_features

        x_0, x_ids = pack_latents(x_0), latent_ids(*x_0.shape[:3])
        kt, ke = jax.random.split(key)
        t = sampler_mod.random_timesteps(kt, x_0.shape[0], x_0.shape[1], self.schnell)
        eps = jax.random.normal(ke, x_0.shape, x_0.dtype)
        x_t = jax.lax.stop_gradient(sampler_mod.add_noise(x_0, t, eps))

        b = x_0.shape[0]
        pred = flux_forward(
            flow_params, self.flow_cfg,
            img=x_t, img_ids=x_ids, txt=txt, txt_ids=txt_ids,
            timesteps=t.astype(self.dtype), y=vec,
            guidance=guidance if self.flow_cfg.guidance_embed else None,
            remat=True,  # per-block gradient checkpointing
            # the flash kernel is differentiable (custom VJP runs the blocked
            # dQ/dKV backward kernels), so training uses it wherever
            # inference does (runtime/config auto switch)
        )
        return jnp.mean((pred + x_0 - eps).astype(jnp.float32) ** 2)
