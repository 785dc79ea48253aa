"""MusicGen delay-pattern autoregressive decoder — TPU-native JAX.

Parity with musicgen/musicgen.py: 4-codebook summed embeddings, 48-layer
decoder-only transformer (pre-LN self-attn + cross-attn to T5 conditioning +
GELU MLP), sinusoidal positions from the cache offset, 4 parallel output
heads, classifier-free-guidance 2x batch, top-k sampling, delay-pattern
token masking, delay undo.

TPU-first departures (the AR loop is the hard latency case, SURVEY §7):
  - The ENTIRE generation loop runs on-device inside one jitted `lax.scan`
    over steps; the reference syncs to host every token
    (musicgen/musicgen.py:293).
  - KV caches are preallocated (layers, 2B, max_steps, H, Dh) buffers updated
    with `lax.dynamic_update_slice` — no growing reallocations (the
    reference's KVCache reallocates every 256 steps, musicgen.py:43-64).
  - Cross-attention K/V over the fixed text conditioning are computed ONCE
    before the loop; the reference re-projects the conditioning every step
    (musicgen.py:142).
  - Delay-pattern masking is index arithmetic under `jnp.where`, not in-place
    mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ...ops.embeddings import sinusoidal_positions
from ...ops.linear import dense, init_dense
from ...ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class MusicGenConfig:
    num_codebooks: int = 4
    codebook_size: int = 2048
    bos_token_id: int = 2048
    hidden_size: int = 1536
    num_attention_heads: int = 24
    num_hidden_layers: int = 48
    ffn_dim: int = 6144
    text_d_model: int = 768  # t5-base for musicgen-medium
    sampling_rate: int = 32000

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def tiny_musicgen_config(**overrides) -> MusicGenConfig:
    base = dict(
        num_codebooks=4,
        codebook_size=16,
        bos_token_id=16,
        hidden_size=32,
        num_attention_heads=4,
        num_hidden_layers=2,
        ffn_dim=64,
        text_d_model=16,
    )
    base.update(overrides)
    return MusicGenConfig(**base)


# ------------------------------------------------------------ init


def _init_layer(key, cfg: MusicGenConfig, dtype):
    """q/k/v fused into ONE (h, 3h) kernel per attention — the AR loop is
    dispatch-latency-bound at T=1, so fewer/larger matmuls win (the torch
    checkpoint stores the same fused in_proj_weight)."""
    h = cfg.hidden_size
    ks = jax.random.split(key, 6)
    def ln():
        return {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}
    return {
        "norm1": ln(),
        "self_attn": {
            "qkv": init_dense(ks[0], h, 3 * h, bias=False, dtype=dtype),
            "o": init_dense(ks[1], h, h, bias=False, dtype=dtype),
        },
        "norm_cross": ln(),
        "cross_attn": {
            "qkv": init_dense(ks[2], h, 3 * h, bias=False, dtype=dtype),
            "o": init_dense(ks[3], h, h, bias=False, dtype=dtype),
        },
        "norm2": ln(),
        "linear1": init_dense(ks[4], h, cfg.ffn_dim, bias=False, dtype=dtype),
        "linear2": init_dense(ks[5], cfg.ffn_dim, h, bias=False, dtype=dtype),
    }


def init_musicgen(key, cfg: MusicGenConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    h = cfg.hidden_size
    return {
        "emb": jax.random.normal(
            ks[0], (cfg.num_codebooks, cfg.codebook_size + 1, h), dtype
        ) * 0.02,
        "layers": jax.vmap(lambda k: _init_layer(k, cfg, dtype))(
            jax.random.split(ks[1], cfg.num_hidden_layers)
        ),
        "out_norm": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "linears": jax.random.normal(
            ks[2], (cfg.num_codebooks, h, cfg.codebook_size), dtype
        ) * 0.02,
        "text_proj": init_dense(ks[3], cfg.text_d_model, h, dtype=dtype),
    }


# ------------------------------------------------------------ forward


def _heads(x, n):
    b, t, _ = x.shape
    return x.reshape(b, t, n, -1)


def condition_text(params, t5_features):
    """Project T5 encoder output into the decoder width
    (musicgen.py:17-26 TextConditioner.output_proj)."""
    return dense(params["text_proj"], t5_features)


def precompute_cross_kv(params, cfg: MusicGenConfig, conditioning):
    """Compute per-layer cross-attention K/V once for the fixed conditioning
    (the reference re-projects every step, musicgen.py:142).
    Returns (L, B, S, H, Dh) pair."""
    h = cfg.hidden_size

    from ...ops.linear import materialize_kernel

    def one(layer_p):
        kern = materialize_kernel(layer_p["cross_attn"]["qkv"], conditioning.dtype)
        k = _heads(conditioning @ kern[:, h : 2 * h], cfg.num_attention_heads)
        v = _heads(conditioning @ kern[:, 2 * h :], cfg.num_attention_heads)
        return k, v

    return jax.vmap(one, in_axes=(0,))(params["layers"])


def kv_cache_dtype(activation_dtype):
    """Storage dtype for the self-attention KV caches: the activation dtype,
    or — under FGT_MG_KV=f8 — int8 holding float8_e4m3fn BYTES (halves the
    window HBM traffic that grows with generation length, the long-form
    realtime cap). The bytes travel as int8 rather than a float8-typed
    array because Mosaic's native f8 convert measured ~100x slower than a
    load on v5e (2500-step e2e collapsed 4.63x -> 2.03x realtime); int8
    buffers ride the mature 1-byte DMA path and the kernels decode
    arithmetically (ops/pallas/decode_layer._f8_decode). Rows round to f8
    on insert and widen on read; the math stays in the activation dtype."""
    from ...runtime.config import musicgen_kv_dtype

    if musicgen_kv_dtype() == "f8":
        return jnp.int8
    return activation_dtype


def _kv_load(x, dtype):
    """Widen a cache slice to compute dtype (int8 = e4m3 bytes)."""
    if x.dtype == jnp.int8:
        return jax.lax.bitcast_convert_type(x, jnp.float8_e4m3fn).astype(dtype)
    return x.astype(dtype)


def _kv_store(x, cache_dtype):
    """Round new K/V rows to the cache storage format."""
    if cache_dtype == jnp.int8:
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.float8_e4m3fn), jnp.int8)
    return x.astype(cache_dtype)


def init_kv_cache(cfg: MusicGenConfig, batch: int, max_steps: int, dtype):
    shape = (cfg.num_hidden_layers, batch, max_steps, cfg.num_attention_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decode_step(params, cfg: MusicGenConfig, tokens, cross_kv, k_cache, v_cache, offset,
                cond_len=None):
    """One AR step. tokens: (B, 1, K) int; caches (L, B, S_max, H, Dh);
    offset: scalar int. cond_len: optional (B,) int32 per-row conditioning
    lengths — cross-attention masks text positions >= cond_len[b] (cross-user
    coalescing pads different prompts to one S bucket); None = all live.
    Returns (logits (B, 1, V, K), new_k, new_v)."""
    b = tokens.shape[0]
    h = cfg.num_attention_heads
    x = _embed_tokens(params, cfg, tokens, offset)
    dtype = x.dtype

    s_max = k_cache.shape[2]
    positions = jnp.arange(s_max)
    mask = (positions <= offset)[None, None, None, :]  # (1,1,1,S)

    cross_k, cross_v = cross_kv
    cross_mask = None
    if cond_len is not None:
        s_text = cross_k.shape[2]
        cross_mask = (
            jnp.arange(s_text)[None, :] < jnp.asarray(cond_len)[:, None]
        )[:, None, None, :]  # (B,1,1,S)

    hid = x.shape[-1]

    def pick(tree, li):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False), tree
        )

    # Layer loop with the WHOLE (L, B, S, H, Dh) caches in the loop CARRY:
    # dynamic_update_slice on a carry lowers to an in-place buffer write.
    # (An early lax.scan carried the caches as xs/ys, and ys-stacking
    # materialized a FULL cache copy every step — read+write traffic that
    # grows with the window; at 1500-step generations the copy alone was
    # ~1 GB/step and long-form audio dropped under realtime.)
    #
    # Three knob-selected structures (runtime.config.musicgen_layer_loop)
    # with identical math — they differ only in how the per-layer weight
    # slices reach the MXU, which is what sets the per-op overhead above
    # the pure weight-bandwidth floor (BENCH_RESULTS "MusicGen AR floor"):
    #   fori   — fori_loop + dynamic_index_in_dim gathers (r2 shipping form)
    #   scan   — lax.scan with stacked weights as xs; caches stay in the
    #            carry, so XLA both prefetches the next layer's weight
    #            slices and keeps the cache update in place
    #   unroll — python-unrolled, statically indexed weights
    def layer_body(x, kc_all, vc_all, li, p, ck, cv):
        y = layer_norm(x, p["norm1"])
        qkv = dense(p["self_attn"]["qkv"], y)
        q = _heads(qkv[..., :hid], h)
        k_new = _heads(qkv[..., hid : 2 * hid], h)
        v_new = _heads(qkv[..., 2 * hid :], h)
        kc_all = jax.lax.dynamic_update_slice(
            kc_all, _kv_store(k_new[None], kc_all.dtype), (li, 0, offset, 0, 0))
        vc_all = jax.lax.dynamic_update_slice(
            vc_all, _kv_store(v_new[None], vc_all.dtype), (li, 0, offset, 0, 0))
        kc = jax.lax.dynamic_index_in_dim(kc_all, li, 0, keepdims=False)
        vc = jax.lax.dynamic_index_in_dim(vc_all, li, 0, keepdims=False)
        attn = dot_product_attention(q, _kv_load(kc, dtype), _kv_load(vc, dtype), mask=mask)
        x = x + dense(p["self_attn"]["o"], attn.reshape(b, 1, -1))

        y = layer_norm(x, p["norm_cross"])
        from ...ops.linear import materialize_kernel as _mk

        q = _heads(y @ _mk(p["cross_attn"]["qkv"], y.dtype)[:, :hid], h)
        attn = dot_product_attention(q, ck, cv, mask=cross_mask)
        x = x + dense(p["cross_attn"]["o"], attn.reshape(b, 1, -1))

        y = layer_norm(x, p["norm2"])
        x = x + dense(p["linear2"], jax.nn.gelu(dense(p["linear1"], y), approximate=False))
        return x, kc_all, vc_all

    from ...runtime.config import musicgen_layer_loop

    n_layers = cfg.num_hidden_layers
    mode = musicgen_layer_loop()
    if mode == "scan":

        def scan_body(carry, xs):
            x, kc_all, vc_all = carry
            li, p, ck, cv = xs
            return layer_body(x, kc_all, vc_all, li, p, ck, cv), None

        (x, new_k, new_v), _ = jax.lax.scan(
            scan_body,
            (x, k_cache, v_cache),
            (jnp.arange(n_layers), params["layers"], cross_k, cross_v),
        )
    elif mode == "unroll":
        kc_all, vc_all = k_cache, v_cache
        for li in range(n_layers):
            p = jax.tree.map(lambda a, li=li: a[li], params["layers"])
            x, kc_all, vc_all = layer_body(
                x, kc_all, vc_all, li, p, cross_k[li], cross_v[li]
            )
        new_k, new_v = kc_all, vc_all
    else:

        def fori_body(li, carry):
            x, kc_all, vc_all = carry
            return layer_body(
                x, kc_all, vc_all, li, pick(params["layers"], li),
                pick(cross_k, li), pick(cross_v, li),
            )

        x, new_k, new_v = jax.lax.fori_loop(
            0, n_layers, fori_body, (x, k_cache, v_cache)
        )
    x = layer_norm(x, params["out_norm"])
    logits = jnp.einsum("btd,kdv->btvk", x, params["linears"].astype(dtype))
    return logits, new_k, new_v


def _embed_tokens(params, cfg: MusicGenConfig, tokens, offset):
    """Summed codebook embeddings + sinusoidal position for one AR step
    (musicgen.py:208-211,236-240). tokens (B, 1, K) -> (B, 1, H)."""
    x = jnp.sum(
        jnp.stack(
            [params["emb"][k][tokens[..., k]] for k in range(cfg.num_codebooks)]
        ),
        axis=0,
    )
    pos = sinusoidal_positions(offset.astype(jnp.float32), 1, cfg.hidden_size)
    return x + pos[None].astype(x.dtype)


def decode_step_fused(packed, params, cfg: MusicGenConfig, tokens, cross_kv,
                      k_cache, v_cache, offset,
                      interpret: Optional[bool] = None,
                      impl: Optional[str] = None,
                      cond_len=None):
    """decode_step via the fused Pallas megakernel (ops/pallas/decode_layer):
    the whole 48-layer stack — 6 matmuls + both attentions + norms per layer
    — runs as ONE weight-streaming pallas_call at ~HBM bandwidth, vs ~10 us
    per-op overhead for the discrete XLA formulation at M=2.

    cross_kv: (ck, cv) each (L, B, S, H) — heads flattened; caches
    (L, B, W, H) flat layout (this path owns its cache layout end-to-end).
    Same signature/semantics as decode_step otherwise."""
    from ...ops.pallas.decode_layer import (
        fused_decode_step, fused_decode_step2, fused_decode_step3,
    )
    from ...runtime.config import musicgen_fused_impl

    if interpret is None:
        # run the kernel in interpret mode off-TPU so the fused path (and
        # generate() with it) stays testable on the CPU test mesh
        interpret = jax.default_backend() != "tpu"
    if impl is None:
        impl = musicgen_fused_impl()
        if impl == "auto":  # window-blind call sites default to v3
            impl = "v3"
    step_fn = {"v1": fused_decode_step, "v2": fused_decode_step2,
               "v3": fused_decode_step3}[impl]
    x = _embed_tokens(params, cfg, tokens, offset)
    dtype = x.dtype
    ck, cv = cross_kv
    y, k_cache, v_cache = step_fn(
        packed, x[:, 0, :], ck, cv, offset, k_cache, v_cache, cond_len,
        n_heads=cfg.num_attention_heads, interpret=interpret,
    )
    x = layer_norm(y[:, None, :], params["out_norm"])
    logits = jnp.einsum("btd,kdv->btvk", x, params["linears"].astype(dtype))
    return logits, k_cache, v_cache


def top_k_sample(key, logits, top_k: int, temperature: float):
    """logits: (V, K) → (K,) sampled ids. Top-k filter then categorical
    (musicgen.py:148-183 semantics, explicit key instead of global state)."""
    logits = logits.T.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)  # (K, V)
    vals, _ = jax.lax.top_k(logits, top_k)
    thresh = vals[:, -1:]
    masked = jnp.where(logits >= thresh, logits, -jnp.inf)
    return jax.random.categorical(key, masked, axis=-1)


def generate(
    params,
    cfg: MusicGenConfig,
    conditioning,
    max_steps: int = 200,
    top_k: int = 250,
    temperature: float = 1.0,
    guidance_coef: float = 3.0,
    key=None,
    live_steps=None,
    cond_len=None,
    keys=None,
):
    """Generate delay-pattern codes fully on-device.

    conditioning: (n, S, hidden) projected text features (condition_text);
    n samples generate in ONE batched AR loop (the reference generates one at
    a time). Returns codes (n, num_codebooks, max_steps - num_codebooks + 1)
    ready for EnCodec decode (delay already undone).

    live_steps: optional traced scalar OR (n,) vector — the *requested* step
    count(s) when max_steps is a padded compile bucket. The delay-pattern
    ramp-down window follows live_steps so the reference's tail semantics
    (last K-1 frames masked to BOS) hold at each requested length, while the
    scan length (and the compiled executable) stays the bucket. A vector
    gives every coalesced request its own duration in one batched loop.

    cond_len: optional (n,) int32 — per-sample conditioning lengths when
    rows of `conditioning` are DIFFERENT prompts padded to one S bucket
    (cross-user coalescing): cross-attention masks positions >= cond_len[i]
    for sample i (and its CFG uncond twin), so each sample's codes match a
    solo run at its own true length.

    keys: optional (n,) stacked PRNG keys — per-sample sampling streams
    (per-request seeds under coalescing). None = the single-`key` derivation
    (bit-compatible with earlier rounds)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if live_steps is None:
        live_steps = max_steps
    K = cfg.num_codebooks
    n = conditioning.shape[0]
    dtype = conditioning.dtype

    from ...runtime.config import musicgen_fused_step

    # CFG: [cond..., uncond...] batch of 2n
    cond = jnp.concatenate([conditioning, jnp.zeros_like(conditioning)], axis=0)
    cross_kv = precompute_cross_kv(params, cfg, cond)
    cl2 = None
    if cond_len is not None:
        cl = jnp.asarray(cond_len, jnp.int32).reshape(n)
        cl2 = jnp.concatenate([cl, cl], axis=0)  # uncond twin masks alike

    from ...runtime.config import musicgen_fused_impl_for

    fused = musicgen_fused_step() and cfg.ffn_dim == 4 * cfg.hidden_size
    # v2 (blocked-input cache delivery) thrashes VMEM past ~1500-step
    # windows at n=1; v1 (manual chunk DMA) holds, and ties v2 at batched
    # n — measured routing in runtime.config.musicgen_fused_impl_for
    fused_impl = musicgen_fused_impl_for(max_steps, n_samples=n)
    if fused:
        from ...ops.pallas.decode_layer import packable, pack_decode_weights

        fused = packable(params["layers"])
    if fused:
        # fused megakernel path: flat-heads cross K/V and (L, B, W, H)
        # caches (the kernel owns its cache layout; both layouts slice the
        # window on axis 2, so the chunked loop below is shared)
        packed = pack_decode_weights(
            params["layers"], cfg.hidden_size, cfg.ffn_dim
        )
        L_, B2 = cfg.num_hidden_layers, 2 * n
        ckv = tuple(
            a.reshape(L_, B2, a.shape[2], cfg.hidden_size) for a in cross_kv
        )
        # window axis padded to the cache dtype's native sublane tile so
        # every kernel DMA slice is tile-aligned (rows beyond `offset` are
        # masked in-kernel, so the pad rows are never attended): 8 rows for
        # bf16, 32 for int8/f8-byte caches (Mosaic's (32, 128) int8 tile —
        # an 8-aligned-but-not-32-aligned window slice of an int8 cache
        # would DMA through a mid-tile boundary).
        kv_dt = kv_cache_dtype(dtype)
        row_tile = 32 if kv_dt == jnp.int8 else 8
        w_alloc = -(-max_steps // row_tile) * row_tile
        k_cache = jnp.zeros((L_, B2, w_alloc, cfg.hidden_size), kv_dt)
        v_cache = jnp.zeros_like(k_cache)
    else:
        k_cache, v_cache = init_kv_cache(cfg, 2 * n, max_steps, kv_cache_dtype(dtype))

    audio_seq = jnp.full((n, max_steps + 1, K), cfg.bos_token_id, jnp.int32)

    def step(carry, offset):
        seq, kc, vc = carry
        tok = jax.lax.dynamic_slice(seq, (0, offset, 0), (n, 1, K))
        tok2 = jnp.concatenate([tok, tok], axis=0)  # (2n, 1, K)
        if fused:
            logits, kc, vc = decode_step_fused(
                packed, params, cfg, tok2, ckv, kc, vc, offset,
                impl=fused_impl, cond_len=cl2,
            )
        else:
            logits, kc, vc = decode_step(
                params, cfg, tok2, cross_kv, kc, vc, offset, cond_len=cl2)
        cond_l, uncond_l = logits[:n, 0], logits[n:, 0]  # (n, V, K)
        mixed = uncond_l + (cond_l - uncond_l) * guidance_coef
        if keys is None:
            step_key = jax.random.fold_in(key, offset)
            step_keys = jax.random.split(step_key, n)
        else:  # per-request seed streams (cross-user coalescing)
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(keys, offset)
        sampled = jax.vmap(
            lambda k_, lg: top_k_sample(k_, lg, top_k, temperature)
        )(step_keys, mixed)  # (n, K)
        # delay pattern: codebook k live during steps [k, live_steps - K + k]
        # (live_steps broadcasts (n,) per-request durations or a scalar)
        ks = jnp.arange(K)
        live_n = jnp.broadcast_to(jnp.asarray(live_steps), (n,))
        live = (offset >= ks[None]) & (offset <= live_n[:, None] - K + ks[None])
        tok_next = jnp.where(live, sampled.astype(jnp.int32), cfg.bos_token_id)
        seq = jax.lax.dynamic_update_slice(seq, tok_next[:, None], (0, offset + 1, 0))
        return (seq, kc, vc), None

    from ...runtime.config import musicgen_ar_unroll, musicgen_cache_chunk

    unroll = musicgen_ar_unroll()
    # chunked-cache attention: self-attention reads grow with the cache, so
    # a 2500-step generation re-reading the full padded cache every step is
    # ~2x the necessary traffic. Run the loop in chunks; chunk c attends
    # over a STATIC cache window of the first (c+1)*chunk positions (the
    # mask inside decode_step handles exactness), then writes the window
    # back. One executable: the python loop unrolls n_chunks inner scans.
    chunk = musicgen_cache_chunk()
    n_chunks = max(1, -(-max_steps // chunk))
    for c in range(n_chunks):
        start, stop = c * chunk, min(max_steps, (c + 1) * chunk)
        # fused path: tile-aligned windows (see w_alloc above)
        win = (
            min(-(-stop // row_tile) * row_tile, k_cache.shape[2])
            if fused else stop
        )
        kc_view = k_cache[:, :, :win]
        vc_view = v_cache[:, :, :win]
        (audio_seq, kc_view, vc_view), _ = jax.lax.scan(
            step, (audio_seq, kc_view, vc_view), jnp.arange(start, stop),
            unroll=unroll,
        )
        if stop < max_steps:
            k_cache = k_cache.at[:, :, :win].set(kc_view)
            v_cache = v_cache.at[:, :, :win].set(vc_view)

    # undo delay (musicgen.py:296-300): codebook k shifted back by k
    T_out = max_steps - K + 1
    cols = [
        jax.lax.dynamic_slice(audio_seq[:, :, k], (0, k + 1), (n, T_out))
        for k in range(K)
    ]
    codes = jnp.stack(cols, axis=1)  # (n, K, T_out)
    return codes
