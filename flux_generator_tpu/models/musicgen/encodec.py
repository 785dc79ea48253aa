"""EnCodec neural audio codec — TPU-native JAX.

Parity with musicgen/encodec.py: SEANet encoder/decoder with causal /
asymmetric padding convs, 2-layer LSTM bottleneck, residual vector
quantization, chunked encode/decode with linear overlap-add, audio
preprocessing (pad + mask).

TPU-first departures:
  - The reference's custom Metal LSTM kernel (encodec.py:14-59) becomes a
    `lax.scan` over time with the per-step gate math fused by XLA; the input
    projection x@Wx^T is hoisted out of the loop as one big MXU matmul (the
    Pallas variant lives in ops/pallas/lstm.py and is used when enabled).
  - Layer sequences are derived from config as static "specs"; init and
    forward walk the same spec, so params stay a clean pytree.
  - Transposed convs are expressed as lhs-dilated convs; checkpoint kernels
    are time-flipped at load (see io.sanitize) so the math matches torch's
    ConvTranspose1d exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.linear import conv1d, init_dense
from ...ops.norms import group_norm


@dataclasses.dataclass(frozen=True)
class EncodecConfig:
    audio_channels: int = 1
    num_filters: int = 64
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    upsampling_ratios: Sequence[int] = (8, 5, 4, 4)
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    num_lstm_layers: int = 2
    hidden_size: int = 128
    codebook_size: int = 2048
    codebook_dim: int = 128
    compress: int = 2
    use_causal_conv: bool = False
    pad_mode: str = "reflect"
    norm_type: str = "weight_norm"
    trim_right_ratio: float = 1.0
    sampling_rate: int = 32000
    target_bandwidths: Sequence[float] = (2.2,)
    chunk_length_s: Optional[float] = None
    overlap: Optional[float] = None
    normalize: bool = False
    use_conv_shortcut: bool = False

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sampling_rate / self.hop_length)

    @property
    def codebook_nbits(self) -> int:
        return math.ceil(math.log2(self.codebook_size))

    @property
    def num_quantizers(self) -> int:
        # bits follow the actual codebook size (HF EncodecConfig semantics);
        # for the real 32 kHz model (2048 codes, 50 Hz, 2.2 kbps) this gives
        # the same 4 quantizers as audiocraft
        return int(1000 * self.target_bandwidths[-1]
                   // (self.frame_rate * self.codebook_nbits))

    @property
    def chunk_length(self) -> Optional[int]:
        if self.chunk_length_s is None:
            return None
        return int(self.chunk_length_s * self.sampling_rate)

    @property
    def chunk_stride(self) -> Optional[int]:
        if self.chunk_length_s is None or self.overlap is None:
            return None
        return max(1, int((1.0 - self.overlap) * self.chunk_length))

    @classmethod
    def from_dict(cls, d: dict) -> "EncodecConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in d.items() if k in fields})


def tiny_encodec_config(**overrides) -> EncodecConfig:
    base = dict(
        num_filters=4,
        upsampling_ratios=(4, 2),
        num_lstm_layers=1,
        hidden_size=8,
        codebook_size=16,
        codebook_dim=8,
        # frame_rate = ceil(800/8) = 100, 4-bit codebooks → 0.4 kbps per
        # quantizer → 0.8 kbps = 2 quantizers
        target_bandwidths=(0.8,),
        sampling_rate=800,
    )
    base.update(overrides)
    return EncodecConfig(**base)


# ------------------------------------------------------------ layer specs

# spec entries: ("conv", cin, cout, k, stride, dilation) | ("convtr", cin,
# cout, k, stride) | ("resnet", dim, (d1, d2)) | ("lstm", dim) | ("elu",)


def encoder_spec(cfg: EncodecConfig) -> List[tuple]:
    spec = [("conv", cfg.audio_channels, cfg.num_filters, cfg.kernel_size, 1, 1)]
    scaling = 1
    for ratio in reversed(list(cfg.upsampling_ratios)):
        cur = scaling * cfg.num_filters
        for j in range(cfg.num_residual_layers):
            spec.append(("resnet", cur, (cfg.dilation_growth_rate**j, 1)))
        spec.append(("elu",))
        spec.append(("conv", cur, cur * 2, ratio * 2, ratio, 1))
        scaling *= 2
    spec.append(("lstm", scaling * cfg.num_filters))
    spec.append(("elu",))
    spec.append(("conv", scaling * cfg.num_filters, cfg.hidden_size, cfg.last_kernel_size, 1, 1))
    return spec


def decoder_spec(cfg: EncodecConfig) -> List[tuple]:
    scaling = int(2 ** len(cfg.upsampling_ratios))
    spec = [("conv", cfg.hidden_size, scaling * cfg.num_filters, cfg.kernel_size, 1, 1)]
    spec.append(("lstm", scaling * cfg.num_filters))
    for ratio in cfg.upsampling_ratios:
        cur = scaling * cfg.num_filters
        spec.append(("elu",))
        spec.append(("convtr", cur, cur // 2, ratio * 2, ratio))
        for j in range(cfg.num_residual_layers):
            spec.append(("resnet", cur // 2, (cfg.dilation_growth_rate**j, 1)))
        scaling //= 2
    spec.append(("elu",))
    spec.append(("conv", cfg.num_filters, cfg.audio_channels, cfg.last_kernel_size, 1, 1))
    return spec


# ------------------------------------------------------------ init


def _init_conv1d_p(key, cin, cout, k, dtype):
    scale = 1.0 / math.sqrt(cin * k)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (k, cin, cout), dtype, -scale, scale),
        "bias": jax.random.uniform(k2, (cout,), dtype, -scale, scale),
    }


def _init_lstm_p(key, dim, dtype):
    scale = 1.0 / math.sqrt(dim)
    ks = jax.random.split(key, 3)
    return {
        "wx": jax.random.uniform(ks[0], (dim, 4 * dim), dtype, -scale, scale),
        "wh": jax.random.uniform(ks[1], (dim, 4 * dim), dtype, -scale, scale),
        "bias": jax.random.uniform(ks[2], (4 * dim,), dtype, -scale, scale),
    }


def _init_layer(key, entry, cfg, dtype):
    kind = entry[0]
    if kind == "conv":
        _, cin, cout, k, s, d = entry
        p = {"conv": _init_conv1d_p(key, cin, cout, k, dtype)}
        if cfg.norm_type == "time_group_norm":
            p["norm"] = {"scale": jnp.ones((cout,), dtype), "bias": jnp.zeros((cout,), dtype)}
        return p
    if kind == "convtr":
        _, cin, cout, k, s = entry
        p = {"conv": _init_conv1d_p(key, cin, cout, k, dtype)}
        if cfg.norm_type == "time_group_norm":
            p["norm"] = {"scale": jnp.ones((cout,), dtype), "bias": jnp.zeros((cout,), dtype)}
        return p
    if kind == "resnet":
        _, dim, dils = entry
        hidden = dim // cfg.compress
        k1, k2, k3 = jax.random.split(key, 3)
        p = {
            "block": [
                {"conv": _init_conv1d_p(k1, dim, hidden, cfg.residual_kernel_size, dtype)},
                {"conv": _init_conv1d_p(k2, hidden, dim, 1, dtype)},
            ]
        }
        if cfg.use_conv_shortcut:
            p["shortcut"] = {"conv": _init_conv1d_p(k3, dim, dim, 1, dtype)}
        return p
    if kind == "lstm":
        _, dim = entry
        return {
            "lstm": [
                _init_lstm_p(jax.random.fold_in(key, i), dim, dtype)
                for i in range(cfg.num_lstm_layers)
            ]
        }
    if kind == "elu":
        return {}
    raise ValueError(kind)


def init_encodec(key, cfg: EncodecConfig, dtype=jnp.float32):
    k_enc, k_dec, k_q = jax.random.split(key, 3)
    enc_s, dec_s = encoder_spec(cfg), decoder_spec(cfg)
    return {
        "encoder": [
            _init_layer(jax.random.fold_in(k_enc, i), e, cfg, dtype)
            for i, e in enumerate(enc_s)
        ],
        "decoder": [
            _init_layer(jax.random.fold_in(k_dec, i), e, cfg, dtype)
            for i, e in enumerate(dec_s)
        ],
        "quantizer": [
            {"embed": jax.random.normal(jax.random.fold_in(k_q, i),
                                        (cfg.codebook_size, cfg.codebook_dim), dtype)}
            for i in range(cfg.num_quantizers)
        ],
    }


# ------------------------------------------------------------ primitives


def lstm_forward(p, x):
    """x: (B, T, D). torch gate order (i, f, g, o); input projection hoisted
    out of the scan as one MXU matmul (the reference's Metal kernel does the
    per-step gate math the same way, encodec.py:25-46)."""
    b, t, d = x.shape
    h_dim = p["wh"].shape[0]
    xw = x @ p["wx"].astype(x.dtype) + p["bias"].astype(x.dtype)  # (B, T, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ p["wh"].astype(x.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    _, hs = jax.lax.scan(step, init, xw.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)


def _pad1d(x, pad: Tuple[int, int], mode: str):
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), pad, (0, 0)))
    left, right = pad
    length = x.shape[1]
    parts = []
    if left > 0:
        parts.append(x[:, 1 : left + 1][:, ::-1])
    parts.append(x)
    if right > 0:
        parts.append(x[:, max(length - right - 1, 0) : -1][:, ::-1])
    return jnp.concatenate(parts, axis=1)


def _enc_conv(p, cfg, x, k, stride, dilation):
    eff_k = (k - 1) * dilation + 1
    pad_total = k - stride
    length = x.shape[1]
    n_frames = math.ceil((length - eff_k + pad_total) / stride + 1) - 1
    ideal = n_frames * stride + eff_k - pad_total
    extra = ideal - length
    if cfg.use_causal_conv:
        x = _pad1d(x, (pad_total, extra), cfg.pad_mode)
    else:
        pr = pad_total // 2
        x = _pad1d(x, (pad_total - pr, pr + extra), cfg.pad_mode)
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"].astype(x.dtype), (stride,), [(0, 0)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["conv"]["bias"].astype(x.dtype)
    if "norm" in p:
        y = group_norm(y, p["norm"], groups=1)
    return y


def _dec_convtr(p, cfg, x, k, stride):
    # lhs-dilated conv == ConvTranspose1d with time-flipped kernel (flip done
    # at load time; random init needs no flip).
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"].astype(x.dtype), (1,), [(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["conv"]["bias"].astype(x.dtype)
    if "norm" in p:
        y = group_norm(y, p["norm"], groups=1)
    pad_total = k - stride
    if cfg.use_causal_conv:
        pr = math.ceil(pad_total * cfg.trim_right_ratio)
    else:
        pr = pad_total // 2
    pl = pad_total - pr
    return y[:, pl : y.shape[1] - pr]


def _resnet(p, cfg, x, dilations):
    y = x
    ks = (cfg.residual_kernel_size, 1)
    for blk, k, d in zip(p["block"], ks, dilations):
        y = jax.nn.elu(y, alpha=1.0)
        y = _enc_conv(blk, cfg, y, k, 1, d)
    if "shortcut" in p:
        x = _enc_conv(p["shortcut"], cfg, x, 1, 1, 1)
    return x + y


def _run_spec(params, spec, cfg, x):
    for p, entry in zip(params, spec):
        kind = entry[0]
        if kind == "conv":
            x = _enc_conv(p, cfg, x, entry[3], entry[4], entry[5])
        elif kind == "convtr":
            x = _dec_convtr(p, cfg, x, entry[3], entry[4])
        elif kind == "resnet":
            x = _resnet(p, cfg, x, entry[2])
        elif kind == "lstm":
            from ...runtime.config import use_pallas_lstm

            if use_pallas_lstm():
                from ...ops.pallas.lstm import lstm_pallas as _lstm
            else:
                _lstm = lstm_forward
            h = x
            for lp in p["lstm"]:
                h = _lstm(lp, h)
            x = x + h
        elif kind == "elu":
            x = jax.nn.elu(x, alpha=1.0)
    return x


# ------------------------------------------------------------ RVQ


def rvq_encode(quantizer, embeddings, num_quantizers: int):
    """embeddings: (B, T, D) → codes (B, nq, T)."""
    residual = embeddings
    codes = []
    for layer in quantizer[:num_quantizers]:
        embed = layer["embed"].astype(embeddings.dtype)  # (K, D)
        dist = (
            jnp.sum(residual**2, -1, keepdims=True)
            - 2 * residual @ embed.T
            + jnp.sum(embed**2, -1)
        )
        idx = jnp.argmin(dist, axis=-1)
        codes.append(idx)
        residual = residual - embed[idx]
    return jnp.stack(codes, axis=1)


def rvq_decode(quantizer, codes):
    """codes: (B, nq, T) → (B, T, D)."""
    out = None
    nq = codes.shape[1]
    for i in range(nq):
        q = quantizer[i]["embed"][codes[:, i]]
        out = q if out is None else out + q
    return out


# ------------------------------------------------------------ model API


class EncodecModel:
    def __init__(self, cfg: EncodecConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self._enc_spec = encoder_spec(cfg)
        self._dec_spec = decoder_spec(cfg)
        # decode runs as TWO jitted programs split right after the LSTM
        # stage: the Pallas LSTM kernel plus the full upsampling conv stack
        # in ONE program exceeds XLA's 128 MB vmem scheduling budget on TPU
        # (round-1 NOTES #10: "Used 135.82M of 128.00M"); split, each program
        # schedules comfortably and the kernel ships enabled by default.
        lstm_idx = [i for i, e in enumerate(self._dec_spec) if e[0] == "lstm"]
        self._dec_split = (lstm_idx[-1] + 1) if lstm_idx else 0
        self._decode_head_jit = jax.jit(self._decode_frame_head)
        self._decode_tail_jit = jax.jit(self._decode_frame_tail)
        self._encode_frame_jit = jax.jit(self._encode_frame, static_argnums=(2,))

    def _decode_frame_head(self, codes):
        emb = rvq_decode(self.params["quantizer"], codes)
        return _run_spec(
            self.params["decoder"][: self._dec_split],
            self._dec_spec[: self._dec_split], self.cfg, emb,
        )

    def _decode_frame_tail(self, h, scale=None):
        audio = _run_spec(
            self.params["decoder"][self._dec_split :],
            self._dec_spec[self._dec_split :], self.cfg, h,
        )
        if scale is not None:
            audio = audio * scale
        return audio

    def _decode_frame_jit(self, codes, scale=None):
        return self._decode_tail_jit(self._decode_head_jit(codes), scale)

    @classmethod
    def random_init(cls, cfg: Optional[EncodecConfig] = None, key=None, dtype=jnp.float32):
        cfg = cfg or tiny_encodec_config()
        key = key if key is not None else jax.random.PRNGKey(0)
        return cls(cfg, init_encodec(key, cfg, dtype))

    def num_quantizers_for_bandwidth(self, bandwidth: Optional[float]) -> int:
        bw_per_q = math.log2(self.cfg.codebook_size) * self.cfg.frame_rate
        if bandwidth is not None and bandwidth > 0:
            return max(1, math.floor(bandwidth * 1000 / bw_per_q))
        return self.cfg.num_quantizers

    def _encode_frame(self, x, mask, nq: int):
        scale = None
        if self.cfg.normalize:
            x = x * mask[..., None]
            mono = jnp.sum(x, axis=2, keepdims=True) / x.shape[2]
            scale = jnp.sqrt(jnp.mean(mono**2, axis=1, keepdims=True)) + 1e-8
            x = x / scale
        emb = _run_spec(self.params["encoder"], self._enc_spec, self.cfg, x)
        codes = rvq_encode(self.params["quantizer"], emb, nq)
        return codes, scale

    def encode(self, input_values, padding_mask=None, bandwidth: Optional[float] = None):
        """input_values: (B, T, C) → (frames, nq, ...) codes + scales.
        Mirrors encodec.py:510-579 chunked protocol."""
        if bandwidth is None:
            bandwidth = self.cfg.target_bandwidths[0]
        if bandwidth not in self.cfg.target_bandwidths:
            raise ValueError(
                f"unsupported bandwidth {bandwidth}; pick from {self.cfg.target_bandwidths}"
            )
        nq = self.num_quantizers_for_bandwidth(bandwidth)
        _, length, channels = input_values.shape
        if not 1 <= channels <= 2:
            raise ValueError("audio must have 1 or 2 channels")
        chunk_length = self.cfg.chunk_length or length
        stride = self.cfg.chunk_stride or length
        if padding_mask is None:
            padding_mask = jnp.ones(input_values.shape[:2], bool)
        step = chunk_length - stride
        if (length % stride) != step:
            raise ValueError("input not padded for chunked encoding")
        frames, scales = [], []
        for offset in range(0, length - step, stride):
            mask = padding_mask[:, offset : offset + chunk_length]
            frame = input_values[:, offset : offset + chunk_length]
            codes, scale = self._encode_frame_jit(frame, mask, nq)
            frames.append(codes)
            scales.append(scale)
        return jnp.stack(frames), scales

    def _decode_frame(self, codes, scale=None):
        return self._decode_frame_tail(self._decode_frame_head(codes), scale)

    @staticmethod
    def _linear_overlap_add(frames, stride: int):
        n, frame_length, c = frames[0].shape
        total = stride * (len(frames) - 1) + frames[-1].shape[1]
        t = np.linspace(0, 1, frame_length + 2)[1:-1]
        weight = (0.5 - np.abs(t - 0.5))[:, None].astype(np.float32)
        out = jnp.zeros((n, total, c), frames[0].dtype)
        sum_w = jnp.zeros((total, 1), frames[0].dtype)
        offset = 0
        for frame in frames:
            fl = frame.shape[1]
            out = out.at[:, offset : offset + fl].add(weight[:fl] * frame)
            sum_w = sum_w.at[offset : offset + fl].add(weight[:fl])
            offset += stride
        return out / sum_w

    def decode(self, audio_codes, audio_scales, padding_mask=None):
        """audio_codes: (frames, B, nq, T) → waveform (B, T', C)."""
        if self.cfg.chunk_length is None:
            if audio_codes.shape[0] != 1:
                raise ValueError("expected one frame")
            audio = self._decode_frame_jit(audio_codes[0], audio_scales[0])
        else:
            decoded = [
                self._decode_frame_jit(f, s)
                for f, s in zip(audio_codes, audio_scales)
            ]
            audio = self._linear_overlap_add(decoded, self.cfg.chunk_stride or 1)
        if padding_mask is not None and padding_mask.shape[1] < audio.shape[1]:
            audio = audio[:, : padding_mask.shape[1]]
        return audio


def preprocess_audio(raw_audio, sampling_rate=24000, chunk_length=None, chunk_stride=None):
    """Pad a (list of) waveform(s) to a chunk boundary; returns (B, T, C) and
    mask (B, T) (parity: encodec.py:704-741)."""
    if not isinstance(raw_audio, list):
        raw_audio = [raw_audio]
    raw_audio = [np.asarray(x)[..., None] if np.asarray(x).ndim == 1 else np.asarray(x)
                 for x in raw_audio]
    max_length = max(x.shape[0] for x in raw_audio)
    if chunk_length is not None:
        max_length += chunk_length - (max_length % chunk_stride)
    inputs, masks = [], []
    for x in raw_audio:
        mask = np.ones(x.shape[0], bool)
        diff = max_length - x.shape[0]
        if diff > 0:
            mask = np.pad(mask, (0, diff))
            x = np.pad(x, ((0, diff), (0, 0)))
        inputs.append(x)
        masks.append(mask)
    return jnp.stack([jnp.asarray(x) for x in inputs]), jnp.stack(
        [jnp.asarray(m) for m in masks]
    )
