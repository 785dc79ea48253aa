"""MusicGen text-to-music pipeline — TPU-native.

Parity with musicgen/musicgen.py MusicGen.generate: T5-encode the prompt,
project into the decoder width, run the delay-pattern AR loop with CFG and
top-k sampling, then EnCodec-decode to a waveform. The AR loop is one jitted
on-device scan (see models/musicgen/model.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.musicgen import model as mg
from ..models.musicgen.encodec import EncodecModel, tiny_encodec_config
from ..models.t5.t5 import T5Config, init_t5_encoder, t5_encode, tiny_t5_config


def _next_pow2_bucket(s: int, floor: int = 16) -> int:
    """Pad conditioning lengths to a small ladder of compile buckets
    (16, 32, 64, ...): arbitrary prompt lengths reuse a handful of AR-loop
    executables instead of compiling per length. 16 keeps the bucketed S
    axis on the bf16 (16, 128) sublane tile inside the fused kernels."""
    b = floor
    while b < s:
        b *= 2
    return b


class MusicGenPipeline:
    def __init__(
        self,
        cfg: mg.MusicGenConfig,
        params: dict,
        t5_cfg: T5Config,
        t5_params: dict,
        audio_decoder: EncodecModel,
        tokenizer=None,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.params = params
        self.t5_cfg = t5_cfg
        self.t5_params = t5_params
        self.audio_decoder = audio_decoder
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sampling_rate = audio_decoder.cfg.sampling_rate

        self._encode_text = jax.jit(
            lambda tp, p, toks: mg.condition_text(
                p, t5_encode(tp, self.t5_cfg, toks).astype(self.dtype)
            )
        )
        self._generate = jax.jit(
            lambda p, cond, key, max_steps, top_k, temp, guidance, live: mg.generate(
                p, self.cfg, cond, max_steps, top_k, temp, guidance, key,
                live_steps=live,
            ),
            static_argnums=(3, 4),
        )
        # cross-user coalesced entry: per-sample conditioning lengths
        # (prompts padded to one S bucket), per-sample durations, per-sample
        # seed streams — one batched AR loop serves several users' requests
        self._generate_multi = jax.jit(
            lambda p, cond, cl, keys, max_steps, top_k, temp, guidance, live:
            mg.generate(
                p, self.cfg, cond, max_steps, top_k, temp, guidance,
                live_steps=live, cond_len=cl, keys=keys,
            ),
            static_argnums=(4, 5),
        )

    @classmethod
    def random_init(cls, key=None, tiny: bool = True, dtype=jnp.float32):
        key = key if key is not None else jax.random.PRNGKey(0)
        if not tiny:
            raise NotImplementedError("full-size random init: use from_pretrained")
        cfg = mg.tiny_musicgen_config()
        t5_cfg = tiny_t5_config(d_model=cfg.text_d_model)
        # size the bandwidth so the codec builds exactly num_codebooks
        # quantizers (per-quantizer rate = frame_rate · log2(codebook) bps)
        enc_cfg = tiny_encodec_config(codebook_size=cfg.codebook_size)
        bw = cfg.num_codebooks * enc_cfg.frame_rate * enc_cfg.codebook_nbits / 1000
        enc_cfg = tiny_encodec_config(
            codebook_size=cfg.codebook_size, target_bandwidths=(bw,),
        )
        ks = jax.random.split(key, 3)
        return cls(
            cfg,
            mg.init_musicgen(ks[0], cfg, dtype),
            t5_cfg,
            init_t5_encoder(ks[1], t5_cfg, dtype),
            EncodecModel.random_init(enc_cfg, ks[2], dtype),
            dtype=dtype,
        )

    @classmethod
    def from_pretrained(cls, repo: str = "facebook/musicgen-medium",
                        dtype=jnp.bfloat16, quantize: bool = False):
        from ..io.loaders import load_musicgen_pipeline

        return load_musicgen_pipeline(repo, dtype=dtype, quantize=quantize)

    def conditioning(self, text: str):
        if self.tokenizer is None:
            raise RuntimeError("pipeline built without a tokenizer")
        tokens = jnp.array(self.tokenizer.encode(text, pad=False))
        return self._encode_text(self.t5_params, self.params, tokens)

    def generate(
        self,
        text: str,
        max_steps: int = 200,
        top_k: int = 250,
        temp: float = 1.0,
        guidance_coef: float = 3.0,
        seed: Optional[int] = None,
        conditioning=None,
        n_samples: int = 1,
    ):
        """Returns a waveform (T, C) in [-1, 1]; with n_samples > 1 the first
        sample is returned and all are generated in one batched AR loop
        (use `generate_batch` for all of them)."""
        if conditioning is None:
            conditioning = self.conditioning(text)
        if n_samples > 1 and conditioning.shape[0] == 1:
            conditioning = jnp.broadcast_to(
                conditioning, (n_samples, *conditioning.shape[1:])
            )
        key = jax.random.PRNGKey(0 if seed is None else seed)
        # bucket the step count so arbitrary UI slider values reuse one
        # compiled executable (same trick as the 16-px latent snap); the
        # requested max_steps is threaded in as a traced scalar so the
        # delay-pattern ramp-down matches reference semantics exactly
        bucket = max(64, -(-int(max_steps) // 256) * 256)
        codes = self._generate(
            self.params, conditioning, key, bucket, int(top_k),
            float(temp), float(guidance_coef), jnp.int32(max_steps),
        )
        want = int(max_steps) - self.cfg.num_codebooks + 1
        codes = codes[:, :, :want]
        audio = self.audio_decoder.decode(codes[None], [None])
        return audio[0]

    def generate_requests(
        self,
        requests,
        top_k: int = 250,
        temp: float = 1.0,
        guidance_coef: float = 3.0,
    ):
        """Coalesce several DIFFERENT users' requests into ONE batched AR
        loop (the reference serves music strictly one request at a time —
        musicgen/musicgen.py:249-304; batched AR on this chip measured ~3x
        aggregate audio-sec/sec at n=4).

        requests: list of dicts {"text": str, "max_steps": int,
        "seed": Optional[int]}. Per-request prompts are padded to one
        S bucket with cross-attention length masks, durations ride
        per-sample live_steps, seeds per-sample PRNG streams — each
        request's codes match a solo run at its own length (parity test:
        tests/test_musicgen_coalesce.py). All requests share
        (top_k, temp, guidance): that triple is the server's coalescing
        key. Returns waveforms [(T_i, C)] in request order."""
        n = len(requests)
        conds = [self.conditioning(r["text"]) for r in requests]  # (1,S_i,H)
        s_bucket = _next_pow2_bucket(max(c.shape[1] for c in conds))
        cond = jnp.zeros((n, s_bucket, self.cfg.hidden_size), self.dtype)
        for i, c in enumerate(conds):
            cond = cond.at[i, : c.shape[1]].set(c[0].astype(self.dtype))
        cond_len = jnp.array([c.shape[1] for c in conds], jnp.int32)

        steps = [max(8, min(int(r["max_steps"]), 2500)) for r in requests]
        bucket = max(64, -(-max(steps) // 256) * 256)
        live = jnp.array(steps, jnp.int32)
        keys = jnp.stack(
            [jax.random.PRNGKey(int(r.get("seed") or 0)) for r in requests]
        )
        codes = self._generate_multi(
            self.params, cond, cond_len, keys, bucket, int(top_k),
            float(temp), float(guidance_coef), live,
        )
        outs = []
        for i, st in enumerate(steps):
            want = st - self.cfg.num_codebooks + 1
            outs.append(
                self.audio_decoder.decode(
                    codes[i : i + 1, :, :want][None], [None]
                )[0]
            )
        return outs

    def generate_batch(self, text: str, n_samples: int = 2, **kwargs):
        """All n sample waveforms, generated in one batched AR loop."""
        conditioning = self.conditioning(text)
        conditioning = jnp.broadcast_to(
            conditioning, (n_samples, *conditioning.shape[1:])
        )
        key = jax.random.PRNGKey(kwargs.pop("seed", 0) or 0)
        max_steps = int(kwargs.pop("max_steps", 200))
        bucket = max(64, -(-max_steps // 256) * 256)
        codes = self._generate(
            self.params, conditioning, key, bucket,
            int(kwargs.pop("top_k", 250)), float(kwargs.pop("temp", 1.0)),
            float(kwargs.pop("guidance_coef", 3.0)), jnp.int32(max_steps),
        )
        want = max_steps - self.cfg.num_codebooks + 1
        codes = codes[:, :, :want]
        return self.audio_decoder.decode(codes[None], [None])
