"""Fused MusicGen decode-step Pallas kernel (weight-streaming megakernel).

The AR decode step is per-op-overhead-bound, not bandwidth-bound: 48 layers
x 6 small (M=2) matmuls plus attention/cache machinery measure ~4.3 ms/step
under XLA against a ~1.9 ms pure weight-fetch floor (BENCH_RESULTS "MusicGen
AR floor"; scripts/prof_ar_floor.py). The prototype study
(scripts/prof_pallas_chain.py) showed a single pallas_call that streams the
per-layer weights as uniform (H, H) chunks through the grid pipeline runs the
whole 288-matmul chain at 2.09 ms — 93% of the bandwidth floor — where the
same math as discrete XLA ops costs 3.6 ms.

This module is the production version of that kernel: ONE pallas_call runs
all 48 decoder layers of a single AR step, including both attentions:

  grid = (num_layers * 14,), c = i % 14 selects the phase:
    c0..c2    fused self-attn qkv thirds (q | k_new | v_new)
    c3        flash self-attention over the KV cache (manual double-buffered
              HBM chunk DMAs) + o-projection, residual add
    c4        cross-attn q projection (only the q third of the fused kernel
              is packed — the XLA path fetches all 3H columns and slices)
    c5        cross-attention over the precomputed text K/V + o-projection
    c6..c9    ffn up (h,4h) as 4 output-column chunks
    c10..c13  ffn down (4h,h) as 4 input-row chunks, exact-gelu fused,
              partial sums; residual add at c13

  - x and all intermediates persist in VMEM scratch across grid steps; the
    automatic pipeline double-buffers the 2.36 MB weight-chunk fetches.
  - k_new/v_new rows come OUT of the kernel as (L, B, H) constant-index
    outputs (one copy-out at the end of the grid); the caller inserts them
    into the HBM caches with one XLA dynamic_update_slice per cache — the
    kernel itself never writes HBM.
  - Self-attention streams the cache window in CHUNK-row blocks with a
    running (flash) softmax, seeded by the current token so fully-masked
    blocks cannot poison the running max.

Matches models/musicgen/model.py:decode_step layer math (reference
musicgen/musicgen.py:118-145); the delay-pattern loop, embeddings, out_norm,
logit heads and sampling stay in XLA. Weight-only int8 per-out-channel
quantization (and plain bf16) are supported; grouped/int4 layouts fall back
to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CPL = 14          # weight chunks per layer
NEG = -1e30       # finite mask value (a -inf running max would NaN the exp)


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7, invisible in bf16).
    Mosaic lowers neither erf nor erfc, so exact-gelu needs its own."""
    p_ = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p_ * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax)
    return jnp.sign(x) * y


def _gelu(x):
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


def _ln(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return y * scale + bias


def _f8_decode(b, dt):
    """Decode float8_e4m3fn BYTES held in an int8 array: s·(1+m/8)·2^(e-7),
    denormals (e=0) exact at m·2^-9. Arithmetic VPU decode (~10 vector ops)
    because Mosaic's native f8->bf16 convert measured ~100x slower than a
    native load on v5e (e2e: 2500-step musicgen 4.63x -> 2.03x realtime
    with f8-typed caches), and int8-typed buffers keep the DMA/layout on
    the mature 1-byte path."""
    up = b.astype(jnp.int32) & 0xFF
    e = jax.lax.shift_right_logical(up, 3) & 0xF
    m = (up & 0x7).astype(jnp.float32)
    mag = (1.0 + m * 0.125) * jnp.exp2(e.astype(jnp.float32) - 7.0)
    mag = jnp.where(e == 0, m * jnp.float32(2.0 ** -9), mag)
    return jnp.where(up >= 128, -mag, mag).astype(dt)


def _load_kv(x, dt=jnp.bfloat16):
    """Widen a K/V cache block to compute dtype: int8 means e4m3 bytes
    (FGT_MG_KV=f8), anything else is a plain cast."""
    if x.dtype == jnp.int8:
        return _f8_decode(x, dt)
    return x.astype(dt)


def store_kv_rows(rows, cache_dtype):
    """Encode new K/V rows (bf16/f32) for cache insertion — the XLA-side
    half of the f8 path: rows round to e4m3 and bitcast to int8 OUTSIDE the
    kernel (the rows are (L, B, H) — tiny next to the window the kernel
    streams), so no in-kernel f8 encode is needed."""
    if cache_dtype == jnp.int8:
        # e4m3fn has no inf: values past ±448 round to the NaN byte
        # (0x7F/0xFF), which _f8_decode would silently read back as ±480
        # while the XLA bitcast load path propagates NaN — the two paths
        # would diverge. Saturate at the format max so storage clamps and
        # both decodes agree.
        rows = jnp.clip(rows.astype(jnp.float32), -448.0, 448.0)
        return jax.lax.bitcast_convert_type(
            rows.astype(jnp.float8_e4m3fn), jnp.int8)
    return rows.astype(cache_dtype)


# ------------------------------------------------------------ packing


def _chunk_dense(p, h: int, n_out: int, split: str):
    """Return (chunks (n, h, h) int8-or-float, scales (n, 1, h) f32-like).

    split="out": kernel (…, h, n_out*h) -> n_out column chunks.
    split="in":  kernel (…, n_out*h, h) -> n_out row chunks (scales shared).
    Leading stacked-layer axis L is preserved: outputs (L, n, h, h)."""
    if "kernel_q" in p:
        k, s = p["kernel_q"], p["kernel_scale"]
        if s.ndim == k.ndim:  # grouped scales — unsupported here
            raise ValueError("grouped quantization not packable")
    else:
        k = p["kernel"]
        s = jnp.ones(k.shape[:-2] + (k.shape[-1],), jnp.float32)
    L = k.shape[0]
    if split == "out":
        kc = k.reshape(L, h, n_out, h).transpose(0, 2, 1, 3)
        sc = s.reshape(L, n_out, 1, h)
    else:
        kc = k.reshape(L, n_out, h, h)
        sc = jnp.broadcast_to(s.reshape(L, 1, 1, h), (L, n_out, 1, h))
    return kc, sc


def pack_decode_weights(layers, hidden_size: int, ffn_dim: int):
    """Repack the stacked per-layer decoder params into the kernel's chunk
    stream. Pure reshapes/transposes of the existing (possibly int8) buffers
    — no requantization, so the dequant math is bit-identical to dense().

    Returns dict(w (L*14, H, H), s (L*14, 1, H) bf16, ln (L, 8, H) bf16)."""
    h = hidden_size
    assert ffn_dim == 4 * h, "chunk schedule assumes ffn = 4h"
    qkv_w, qkv_s = _chunk_dense(layers["self_attn"]["qkv"], h, 3, "out")
    o_w, o_s = _chunk_dense(layers["self_attn"]["o"], h, 1, "out")
    xqkv_w, xqkv_s = _chunk_dense(layers["cross_attn"]["qkv"], h, 3, "out")
    xo_w, xo_s = _chunk_dense(layers["cross_attn"]["o"], h, 1, "out")
    up_w, up_s = _chunk_dense(layers["linear1"], h, 4, "out")
    dn_w, dn_s = _chunk_dense(layers["linear2"], h, 4, "in")

    w = jnp.concatenate(
        [qkv_w, o_w, xqkv_w[:, :1], xo_w, up_w, dn_w], axis=1)
    s = jnp.concatenate(
        [qkv_s, o_s, xqkv_s[:, :1], xo_s, up_s, dn_s], axis=1)
    L = w.shape[0]
    w = w.reshape(L * CPL, h, h)
    s = s.reshape(L * CPL, 1, h).astype(jnp.bfloat16)

    ln = jnp.stack(
        [
            layers["norm1"]["scale"], layers["norm1"]["bias"],
            layers["norm_cross"]["scale"], layers["norm_cross"]["bias"],
            layers["norm2"]["scale"], layers["norm2"]["bias"],
            jnp.zeros_like(layers["norm1"]["scale"]),
            jnp.zeros_like(layers["norm1"]["scale"]),
        ],
        axis=1,
    ).astype(jnp.bfloat16)  # (L, 8, H)
    return {"w": w, "s": s, "ln": ln}


def packable(layers) -> bool:
    """True when every decoder dense uses a kernel layout the chunk packer
    understands (plain bf16/f32 or int8 with per-out-channel scales)."""
    for name in ("self_attn", "cross_attn"):
        for part in ("qkv", "o"):
            p = layers[name][part]
            if "kernel_q4" in p:
                return False
            if "kernel_q" in p and p["kernel_scale"].ndim == p["kernel_q"].ndim:
                return False
    for part in ("linear1", "linear2"):
        p = layers[part]
        if "kernel_q4" in p:
            return False
        if "kernel_q" in p and p["kernel_scale"].ndim == p["kernel_q"].ndim:
            return False
    return True


# ------------------------------------------------------------ kernel


def _kernel(
    # inputs
    off_ref, sl_ref, w_ref, s_ref, ln_ref, x_ref, ck_ref, cv_ref,
    kc_hbm, vc_hbm,
    # outputs
    o_ref, kn_out, vn_out,
    # scratch
    xs, lns, ys, hs, accs, kbuf, vbuf, read_sems,
    *, n_heads: int, b_live: int, chunk: int, n_chunks: int, window: int,
    stub: tuple = (),
):
    i = pl.program_id(0)
    li = i // CPL
    c = jax.lax.rem(i, CPL)
    off = off_ref[0]
    h = xs.shape[-1]
    dh = h // n_heads
    scale = dh ** -0.5
    B = b_live

    def wf():
        return w_ref[0].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)

    def dot(a):
        return jax.lax.dot(
            a.astype(jnp.bfloat16), wf(), preferred_element_type=jnp.float32
        )

    def read_chunk(j, slot):
        """Start the K/V cache chunk-j DMAs into buffer `slot` (sizes and
        offsets are 8-row aligned by construction: W % 8 == 0)."""
        lo = j * chunk
        sz = min(window, lo + chunk) - lo
        pltpu.make_async_copy(
            kc_hbm.at[li, :, pl.ds(lo, sz), :],
            kbuf.at[slot, :, pl.ds(0, sz), :],
            read_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            vc_hbm.at[li, :, pl.ds(lo, sz), :],
            vbuf.at[slot, :, pl.ds(0, sz), :],
            read_sems.at[slot, 1],
        ).start()

    def wait_chunk(j, slot):
        lo = j * chunk
        sz = min(window, lo + chunk) - lo
        pltpu.make_async_copy(
            kc_hbm.at[li, :, pl.ds(lo, sz), :],
            kbuf.at[slot, :, pl.ds(0, sz), :],
            read_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            vc_hbm.at[li, :, pl.ds(lo, sz), :],
            vbuf.at[slot, :, pl.ds(0, sz), :],
            read_sems.at[slot, 1],
        ).wait()

    @pl.when(i == 0)
    def _():
        xs[...] = x_ref[...].astype(jnp.float32)

    def ln_at(k):
        return (
            ln_ref[0, k : k + 1].astype(jnp.float32),
            ln_ref[0, k + 1 : k + 2].astype(jnp.float32),
        )

    # ---- self-attention qkv (pre-norm cached in lns). The new K/V rows are
    # per-layer blocked OUTPUTS: Mosaic requires 8-aligned slice sizes on
    # the tiled window axis, so the 1-row cache insert at `offset` happens
    # as one XLA dynamic_update_slice outside the kernel (the kernel seeds
    # the current token's attention from VMEM instead).
    @pl.when(c == 0)
    def _():
        s0, b0 = ln_at(0)
        lns[...] = _ln(xs[...], s0, b0)
        ys[...] = dot(lns[...])
        if "self" not in stub:
            read_chunk(0, 0)

    @pl.when(c == 1)
    def _():
        kn_out[...] = dot(lns[...])[0:B, :].astype(kn_out.dtype)[None]

    @pl.when(c == 2)
    def _():
        vn_out[...] = dot(lns[...])[0:B, :].astype(vn_out.dtype)[None]

    # Head-segment matrices: Mosaic cannot reshape (rows, H) -> (rows, nh,
    # dh) (a lane-dim split is an unsupported layout cast), so per-head
    # reductions are expressed as matmuls with a constant 0/1 (H, nh)
    # segment matrix (sum each head's dh lanes = one MXU dot) and per-head
    # scalars broadcast back to lanes via its (nh, H) transpose. The batch
    # rows are processed in a python loop (B is 2 for CFG, <= 8 batched) so
    # every array stays 2-D with the lane dimension intact.
    def seg_mats():
        seg = (
            jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 0) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 1)
        ).astype(jnp.bfloat16)
        seg_t = (
            jax.lax.broadcasted_iota(jnp.int32, (n_heads, h), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n_heads, h), 1) // dh
        ).astype(jnp.bfloat16)
        return seg, seg_t

    def head_sum(x2d, seg):
        """(rows, H) bf16 -> (rows, nh) f32: per-head lane sums."""
        return jax.lax.dot(x2d, seg, preferred_element_type=jnp.float32)

    def head_expand(x2d, seg_t):
        """(rows, nh) -> (rows, H) f32: replicate per-head values to lanes."""
        return jax.lax.dot(
            x2d.astype(jnp.bfloat16), seg_t, preferred_element_type=jnp.float32
        )

    def pad_rows(outs):
        """Stack per-b (1, H) rows + zero pad to the (M, H) scratch shape."""
        rows = [o.astype(ys.dtype) for o in outs]
        n_pad = ys.shape[0] - len(outs)
        if n_pad:  # Mosaic rejects zero-size vectors — pad only when needed
            rows.append(jnp.zeros((n_pad, h), ys.dtype))
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    # ---- flash self-attention over the cache window + o-proj
    @pl.when(c == 3)
    def _():
        if "self" in stub:  # timing bisect: o-proj of ys directly
            xs[...] = xs[...] + dot(ys[...])
            return
        seg, seg_t = seg_mats()
        kn = kn_out[0]
        vn = vn_out[0]
        qs = [
            (ys[b : b + 1, :] * scale).astype(jnp.bfloat16) for b in range(B)
        ]
        # seed the running softmax with the current token (always live, so
        # fully-masked cache chunks cannot poison the running max)
        m_ = [
            head_sum(qs[b] * kn[b : b + 1, :].astype(jnp.bfloat16), seg)
            for b in range(B)
        ]
        l_ = [jnp.ones_like(m_[b]) for b in range(B)]
        a_ = [vn[b : b + 1, :].astype(jnp.float32) for b in range(B)]
        for j in range(n_chunks):
            slot = j % 2
            wait_chunk(j, slot)
            if j + 1 < n_chunks:
                read_chunk(j + 1, slot ^ 1)
            for b in range(B):
                kc = _load_kv(kbuf[slot, b])              # (C, H) -> bf16
                vc = _load_kv(vbuf[slot, b], jnp.float32)
                lo = head_sum(qs[b] * kc, seg)            # (C, nh)
                pos = j * chunk + jax.lax.broadcasted_iota(
                    jnp.int32, lo.shape, 0)
                lo = jnp.where(pos < off, lo, NEG)
                m_new = jnp.maximum(
                    m_[b], jnp.max(lo, axis=0, keepdims=True))
                p = jnp.exp(lo - m_new)                   # (C, nh)
                r = jnp.exp(m_[b] - m_new)                # (1, nh)
                l_[b] = l_[b] * r + jnp.sum(p, axis=0, keepdims=True)
                # zero dead V rows: when window % chunk != 0 the tail of
                # the last chunk's scratch is never DMA'd, and p == 0
                # would still poison the sum via 0 * garbage(NaN)
                live = jax.lax.broadcasted_iota(
                    jnp.int32, vc.shape, 0) + j * chunk < off
                vz = jnp.where(live, vc, 0.0).astype(jnp.bfloat16)
                pv = jnp.sum(
                    head_expand(p, seg_t).astype(jnp.bfloat16) * vz,
                    axis=0, keepdims=True,
                ).astype(jnp.float32)
                a_[b] = a_[b] * head_expand(r, seg_t) + pv
                m_[b] = m_new
        outs = [a_[b] / head_expand(l_[b], seg_t) for b in range(B)]
        ys[...] = pad_rows(outs)
        xs[...] = xs[...] + dot(ys[...])

    # ---- cross-attention q / attention + o-proj
    @pl.when(c == 4)
    def _():
        s0, b0 = ln_at(2)
        lns[...] = _ln(xs[...], s0, b0)
        ys[...] = dot(lns[...])

    @pl.when(c == 5)
    def _():
        if "cross" in stub:
            xs[...] = xs[...] + dot(ys[...])
            return
        seg, seg_t = seg_mats()
        outs = []
        for b in range(B):
            qb = (ys[b : b + 1, :] * scale).astype(jnp.bfloat16)
            kc = ck_ref[0, b]                             # (S, H) bf16
            vc = cv_ref[0, b]
            lo = head_sum(qb * kc, seg)                   # (S, nh)
            # per-sample conditioning length (cross-user coalescing pads
            # different prompts to one S bucket): mask pad rows out of the
            # softmax and zero the matching V rows (p == 0 would still
            # poison the sum via 0 * NaN if a caller passed garbage pad)
            live_s = jax.lax.broadcasted_iota(
                jnp.int32, lo.shape, 0) < sl_ref[b]
            lo = jnp.where(live_s, lo, NEG)
            m = jnp.max(lo, axis=0, keepdims=True)
            p = jnp.exp(lo - m)
            psum = jnp.sum(p, axis=0, keepdims=True)      # (1, nh)
            vz = jnp.where(
                jnp.broadcast_to(live_s[:, :1], vc.shape), vc, 0)
            av = jnp.sum(
                head_expand(p, seg_t).astype(jnp.bfloat16) * vz,
                axis=0, keepdims=True,
            ).astype(jnp.float32)
            outs.append(av / head_expand(psum, seg_t))
        ys[...] = pad_rows(outs)
        xs[...] = xs[...] + dot(ys[...])

    # ---- ffn
    @pl.when(c == 6)
    def _():
        s0, b0 = ln_at(4)
        lns[...] = _ln(xs[...], s0, b0)

    for j in range(4):
        @pl.when(c == 6 + j)
        def _(j=j):
            hs[:, j * h : (j + 1) * h] = dot(lns[...])

    @pl.when(c == 10)
    def _():
        accs[...] = jnp.zeros_like(accs)

    for j in range(4):
        @pl.when(c == 10 + j)
        def _(j=j):
            g = _gelu(hs[:, j * h : (j + 1) * h])
            accs[...] = accs[...] + dot(g)

    @pl.when(c == 13)
    def _():
        xs[...] = xs[...] + accs[...]
        o_ref[...] = xs[...].astype(o_ref.dtype)


# ------------------------------------------------------------ kernel v2
#
# Same phase schedule and packed-weight stream as _kernel, but all the
# manual DMA machinery is replaced by the automatic grid pipeline:
#   - the K/V cache window arrives as BLOCKED inputs (1, B, chunk, H) whose
#     index map walks the chunks across phases c2/c3 (chunk j is prefetched
#     a full phase before it is consumed, by the same machinery that
#     double-buffers the weight chunks; no in-kernel semaphores);
#   - the new K/V rows leave through constant-index (L, B, H) outputs
#     (one copy-out at the END of the grid instead of 2 blocked copy-outs
#     per layer);
#   - flash chunk 0 is folded into the v-projection phase c2 (the running
#     softmax state lives in ms/ls scratch + the accs buffer, which is free
#     until the ffn-down phases), chunk 1 (long windows) into c3.
# n_chunks <= 2 by construction: chunk = W for W <= 768, else ceil(W/2)
# rounded to 8 — covers the 1504-position long-form window.


def _kernel2(
    # inputs
    off_ref, sl_ref, w_ref, s_ref, ln_ref, x_ref, ck_ref, cv_ref,
    kc_ref, vc_ref,
    # outputs
    o_ref, kn_out, vn_out,
    # scratch
    xs, lns, ys, hs, accs, ms, ls,
    *, n_heads: int, b_live: int, chunk: int, n_chunks: int, window: int,
    stub: tuple = (),
):
    i = pl.program_id(0)
    li = i // CPL
    c = jax.lax.rem(i, CPL)
    off = off_ref[0]
    h = xs.shape[-1]
    dh = h // n_heads
    scale = dh ** -0.5
    B = b_live

    def wf():
        return w_ref[0].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)

    def dot(a):
        return jax.lax.dot(
            a.astype(jnp.bfloat16), wf(), preferred_element_type=jnp.float32
        )

    @pl.when(i == 0)
    def _():
        xs[...] = x_ref[...].astype(jnp.float32)

    def ln_at(k):
        return (
            ln_ref[0, k : k + 1].astype(jnp.float32),
            ln_ref[0, k + 1 : k + 2].astype(jnp.float32),
        )

    def seg_mats():
        seg = (
            jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 0) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 1)
        ).astype(jnp.bfloat16)
        seg_t = (
            jax.lax.broadcasted_iota(jnp.int32, (n_heads, h), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n_heads, h), 1) // dh
        ).astype(jnp.bfloat16)
        return seg, seg_t

    def head_sum(x2d, seg):
        return jax.lax.dot(x2d, seg, preferred_element_type=jnp.float32)

    def head_expand(x2d, seg_t):
        return jax.lax.dot(
            x2d.astype(jnp.bfloat16), seg_t, preferred_element_type=jnp.float32
        )

    def pad_rows(outs):
        rows = [o.astype(ys.dtype) for o in outs]
        n_pad = ys.shape[0] - len(outs)
        if n_pad:  # Mosaic rejects zero-size vectors — pad only when needed
            rows.append(jnp.zeros((n_pad, h), ys.dtype))
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    def process_chunk(j):
        """Fold cache chunk j (the block currently mapped into kc/vc_ref)
        into the running softmax state (ms/ls scratch, accs accumulator)."""
        seg, seg_t = seg_mats()
        for b in range(B):
            qb = (ys[b : b + 1, :] * scale).astype(jnp.bfloat16)
            kcb = _load_kv(kc_ref[0, b])                  # (chunk, H) -> bf16
            vcb = _load_kv(vc_ref[0, b], jnp.float32)
            lo = head_sum(qb * kcb, seg)                  # (chunk, nh)
            pos = j * chunk + jax.lax.broadcasted_iota(
                jnp.int32, lo.shape, 0)
            live = pos < off
            lo = jnp.where(live, lo, NEG)
            m_old = ms[b : b + 1, :]
            m_new = jnp.maximum(m_old, jnp.max(lo, axis=0, keepdims=True))
            p = jnp.exp(lo - m_new)                       # (chunk, nh)
            r = jnp.exp(m_old - m_new)                    # (1, nh)
            ls[b : b + 1, :] = ls[b : b + 1, :] * r + jnp.sum(
                p, axis=0, keepdims=True)
            # zero OOB V rows: the last block may read past W (block pad)
            # and 0 * garbage would still poison the sum
            vz = jnp.where(
                jnp.broadcast_to(live[:, :1], vcb.shape),
                vcb, 0.0,
            ).astype(jnp.bfloat16)
            pv = jnp.sum(
                head_expand(p, seg_t).astype(jnp.bfloat16) * vz,
                axis=0, keepdims=True,
            ).astype(jnp.float32)
            accs[b : b + 1, :] = accs[b : b + 1, :] * head_expand(
                r, seg_t) + pv
            ms[b : b + 1, :] = m_new

    # ---- self-attn qkv + flash chunks
    @pl.when(c == 0)
    def _():
        s0, b0 = ln_at(0)
        lns[...] = _ln(xs[...], s0, b0)
        ys[...] = dot(lns[...])

    @pl.when(c == 1)
    def _():
        kn_out[li] = dot(lns[...])[0:B, :].astype(kn_out.dtype)

    @pl.when(c == 2)
    def _():
        vn = dot(lns[...])
        vn_out[li] = vn[0:B, :].astype(vn_out.dtype)
        if "self" not in stub:
            seg, seg_t = seg_mats()
            kn = kn_out[li]
            # seed the running softmax with the current token (always live,
            # so fully-masked cache chunks cannot poison the running max)
            for b in range(B):
                qb = (ys[b : b + 1, :] * scale).astype(jnp.bfloat16)
                m0 = head_sum(qb * kn[b : b + 1, :].astype(jnp.bfloat16), seg)
                ms[b : b + 1, :] = m0
                ls[b : b + 1, :] = jnp.ones_like(m0)
                accs[b : b + 1, :] = vn[b : b + 1, :]
            process_chunk(0)

    @pl.when(c == 3)
    def _():
        if "self" in stub:  # timing bisect: o-proj of ys directly
            xs[...] = xs[...] + dot(ys[...])
            return
        if n_chunks > 1:
            process_chunk(1)
        _, seg_t = seg_mats()
        outs = [
            accs[b : b + 1, :] / head_expand(ls[b : b + 1, :], seg_t)
            for b in range(B)
        ]
        ys[...] = pad_rows(outs)
        xs[...] = xs[...] + dot(ys[...])

    # ---- cross-attention q / attention + o-proj
    @pl.when(c == 4)
    def _():
        s0, b0 = ln_at(2)
        lns[...] = _ln(xs[...], s0, b0)
        ys[...] = dot(lns[...])

    @pl.when(c == 5)
    def _():
        if "cross" in stub:
            xs[...] = xs[...] + dot(ys[...])
            return
        seg, seg_t = seg_mats()
        outs = []
        for b in range(B):
            qb = (ys[b : b + 1, :] * scale).astype(jnp.bfloat16)
            kc = ck_ref[0, b]                             # (S, H) bf16
            vc = cv_ref[0, b]
            lo = head_sum(qb * kc, seg)                   # (S, nh)
            # per-sample conditioning length (cross-user coalescing pads
            # different prompts to one S bucket): mask pad rows out of the
            # softmax and zero the matching V rows (p == 0 would still
            # poison the sum via 0 * NaN if a caller passed garbage pad)
            live_s = jax.lax.broadcasted_iota(
                jnp.int32, lo.shape, 0) < sl_ref[b]
            lo = jnp.where(live_s, lo, NEG)
            m = jnp.max(lo, axis=0, keepdims=True)
            p = jnp.exp(lo - m)
            psum = jnp.sum(p, axis=0, keepdims=True)      # (1, nh)
            vz = jnp.where(
                jnp.broadcast_to(live_s[:, :1], vc.shape), vc, 0)
            av = jnp.sum(
                head_expand(p, seg_t).astype(jnp.bfloat16) * vz,
                axis=0, keepdims=True,
            ).astype(jnp.float32)
            outs.append(av / head_expand(psum, seg_t))
        ys[...] = pad_rows(outs)
        xs[...] = xs[...] + dot(ys[...])

    # ---- ffn
    @pl.when(c == 6)
    def _():
        s0, b0 = ln_at(4)
        lns[...] = _ln(xs[...], s0, b0)

    for j in range(4):
        @pl.when(c == 6 + j)
        def _(j=j):
            hs[:, j * h : (j + 1) * h] = dot(lns[...])

    @pl.when(c == 10)
    def _():
        accs[...] = jnp.zeros_like(accs)

    for j in range(4):
        @pl.when(c == 10 + j)
        def _(j=j):
            g = _gelu(hs[:, j * h : (j + 1) * h])
            accs[...] = accs[...] + dot(g)

    @pl.when(c == 13)
    def _():
        xs[...] = xs[...] + accs[...]
        o_ref[...] = xs[...].astype(o_ref.dtype)


# ------------------------------------------------------------ kernel v3
#
# v2 with the ≤2-chunk restriction removed (VERDICT r3 next #2: v2 cliffs
# past 1500-step windows because half the window must fit VMEM; v1's manual
# DMA holds but pays in-kernel semaphore waits). v3 streams the K/V window
# through the SAME automatic grid pipeline as the weight chunks, one
# (1, B, chunk, H) block per extra grid phase:
#
#   cpl = 14 + (n_chunks - 1) phases per layer:
#     c0          ln1 + q projection
#     c1          k_new projection
#     c2          v_new projection + running-softmax seed + fold chunk 0
#     c2+j        fold chunk j                     (j = 1 .. n_chunks-1)
#     c2+n        finalize softmax + o-projection  (weight chunk 3)
#     ...         cross/ffn phases as v2, shifted by n_chunks-1
#
# The weight-chunk index map re-maps phases to the 14-chunk packed stream
# (chunk-fold phases prefetch the o-projection weight), so the packed
# weights are IDENTICAL across v1/v2/v3. The chunk size adapts to the CFG
# batch so the double-buffered K/V blocks stay inside a fixed VMEM budget —
# batch-aware by construction, which is what makes the impl choice monotone
# (the v1/v2 FGT_MG_FUSED_MAX_STEPS crossover constant goes away).


def _kernel3(
    # inputs
    off_ref, sl_ref, w_ref, s_ref, ln_ref, x_ref, ck_ref, cv_ref,
    kc_ref, vc_ref,
    # outputs
    o_ref, kn_out, vn_out,
    # scratch
    xs, lns, ys, hs, accs, ms, ls,
    *, n_heads: int, b_live: int, chunk: int, n_chunks: int, window: int,
    cpl: int, stub: tuple = (),
):
    i = pl.program_id(0)
    li = i // cpl
    c = jax.lax.rem(i, cpl)
    shift = n_chunks - 1
    off = off_ref[0]
    h = xs.shape[-1]
    dh = h // n_heads
    scale = dh ** -0.5
    B = b_live

    def wf():
        return w_ref[0].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)

    def dot(a):
        return jax.lax.dot(
            a.astype(jnp.bfloat16), wf(), preferred_element_type=jnp.float32
        )

    @pl.when(i == 0)
    def _():
        xs[...] = x_ref[...].astype(jnp.float32)

    def ln_at(k):
        return (
            ln_ref[0, k : k + 1].astype(jnp.float32),
            ln_ref[0, k + 1 : k + 2].astype(jnp.float32),
        )

    def seg_mats():
        seg = (
            jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 0) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 1)
        ).astype(jnp.bfloat16)
        seg_t = (
            jax.lax.broadcasted_iota(jnp.int32, (n_heads, h), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n_heads, h), 1) // dh
        ).astype(jnp.bfloat16)
        return seg, seg_t

    def head_sum(x2d, seg):
        return jax.lax.dot(x2d, seg, preferred_element_type=jnp.float32)

    def head_expand(x2d, seg_t):
        return jax.lax.dot(
            x2d.astype(jnp.bfloat16), seg_t, preferred_element_type=jnp.float32
        )

    def pad_rows(outs):
        rows = [o.astype(ys.dtype) for o in outs]
        n_pad = ys.shape[0] - len(outs)
        if n_pad:  # Mosaic rejects zero-size vectors — pad only when needed
            rows.append(jnp.zeros((n_pad, h), ys.dtype))
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    def process_chunk(j):
        """Fold the cache chunk currently mapped into kc/vc_ref (chunk j)
        into the running softmax state (ms/ls, accs)."""
        seg, seg_t = seg_mats()
        for b in range(B):
            qb = (ys[b : b + 1, :] * scale).astype(jnp.bfloat16)
            kcb = _load_kv(kc_ref[0, b])                  # (chunk, H) -> bf16
            vcb = _load_kv(vc_ref[0, b], jnp.float32)
            lo = head_sum(qb * kcb, seg)                  # (chunk, nh)
            pos = j * chunk + jax.lax.broadcasted_iota(
                jnp.int32, lo.shape, 0)
            live = pos < off
            lo = jnp.where(live, lo, NEG)
            m_old = ms[b : b + 1, :]
            m_new = jnp.maximum(m_old, jnp.max(lo, axis=0, keepdims=True))
            p = jnp.exp(lo - m_new)                       # (chunk, nh)
            r = jnp.exp(m_old - m_new)                    # (1, nh)
            ls[b : b + 1, :] = ls[b : b + 1, :] * r + jnp.sum(
                p, axis=0, keepdims=True)
            # zero dead V rows: past `off`, and (last chunk) past W where the
            # block pad reads garbage — p == 0 would still poison via 0 * NaN
            vz = jnp.where(
                jnp.broadcast_to(live[:, :1], vcb.shape),
                vcb, 0.0,
            ).astype(jnp.bfloat16)
            pv = jnp.sum(
                head_expand(p, seg_t).astype(jnp.bfloat16) * vz,
                axis=0, keepdims=True,
            ).astype(jnp.float32)
            accs[b : b + 1, :] = accs[b : b + 1, :] * head_expand(
                r, seg_t) + pv
            ms[b : b + 1, :] = m_new

    # ---- self-attn qkv + streamed flash chunks
    @pl.when(c == 0)
    def _():
        s0, b0 = ln_at(0)
        lns[...] = _ln(xs[...], s0, b0)
        ys[...] = dot(lns[...])

    @pl.when(c == 1)
    def _():
        kn_out[li] = dot(lns[...])[0:B, :].astype(kn_out.dtype)

    @pl.when(c == 2)
    def _():
        vn = dot(lns[...])
        vn_out[li] = vn[0:B, :].astype(vn_out.dtype)
        if "self" not in stub:
            seg, seg_t = seg_mats()
            kn = kn_out[li]
            # seed the running softmax with the current token (always live,
            # so fully-masked cache chunks cannot poison the running max)
            for b in range(B):
                qb = (ys[b : b + 1, :] * scale).astype(jnp.bfloat16)
                m0 = head_sum(qb * kn[b : b + 1, :].astype(jnp.bfloat16), seg)
                ms[b : b + 1, :] = m0
                ls[b : b + 1, :] = jnp.ones_like(m0)
                accs[b : b + 1, :] = vn[b : b + 1, :]
            process_chunk(0)

    # fold chunks 1..n_chunks-1, one per phase (each arrives prefetched by
    # the grid pipeline while the previous one is being folded)
    for jj in range(1, n_chunks):
        @pl.when(c == 2 + jj)
        def _(jj=jj):
            if "self" not in stub:
                process_chunk(jj)

    @pl.when(c == 2 + n_chunks)
    def _():
        if "self" in stub:  # timing bisect: o-proj of ys directly
            xs[...] = xs[...] + dot(ys[...])
            return
        _, seg_t = seg_mats()
        outs = [
            accs[b : b + 1, :] / head_expand(ls[b : b + 1, :], seg_t)
            for b in range(B)
        ]
        ys[...] = pad_rows(outs)
        xs[...] = xs[...] + dot(ys[...])

    # ---- cross-attention q / attention + o-proj
    @pl.when(c == 4 + shift)
    def _():
        s0, b0 = ln_at(2)
        lns[...] = _ln(xs[...], s0, b0)
        ys[...] = dot(lns[...])

    @pl.when(c == 5 + shift)
    def _():
        if "cross" in stub:
            xs[...] = xs[...] + dot(ys[...])
            return
        seg, seg_t = seg_mats()
        outs = []
        for b in range(B):
            qb = (ys[b : b + 1, :] * scale).astype(jnp.bfloat16)
            kc = ck_ref[0, b]                             # (S, H) bf16
            vc = cv_ref[0, b]
            lo = head_sum(qb * kc, seg)                   # (S, nh)
            # per-sample conditioning length (cross-user coalescing pads
            # different prompts to one S bucket): mask pad rows out of the
            # softmax and zero the matching V rows (p == 0 would still
            # poison the sum via 0 * NaN if a caller passed garbage pad)
            live_s = jax.lax.broadcasted_iota(
                jnp.int32, lo.shape, 0) < sl_ref[b]
            lo = jnp.where(live_s, lo, NEG)
            m = jnp.max(lo, axis=0, keepdims=True)
            p = jnp.exp(lo - m)
            psum = jnp.sum(p, axis=0, keepdims=True)      # (1, nh)
            vz = jnp.where(
                jnp.broadcast_to(live_s[:, :1], vc.shape), vc, 0)
            av = jnp.sum(
                head_expand(p, seg_t).astype(jnp.bfloat16) * vz,
                axis=0, keepdims=True,
            ).astype(jnp.float32)
            outs.append(av / head_expand(psum, seg_t))
        ys[...] = pad_rows(outs)
        xs[...] = xs[...] + dot(ys[...])

    # ---- ffn
    @pl.when(c == 6 + shift)
    def _():
        s0, b0 = ln_at(4)
        lns[...] = _ln(xs[...], s0, b0)

    for j in range(4):
        @pl.when(c == 6 + shift + j)
        def _(j=j):
            hs[:, j * h : (j + 1) * h] = dot(lns[...])

    @pl.when(c == 10 + shift)
    def _():
        accs[...] = jnp.zeros_like(accs)

    for j in range(4):
        @pl.when(c == 10 + shift + j)
        def _(j=j):
            g = _gelu(hs[:, j * h : (j + 1) * h])
            accs[...] = accs[...] + dot(g)

    @pl.when(c == 13 + shift)
    def _():
        xs[...] = xs[...] + accs[...]
        o_ref[...] = xs[...].astype(o_ref.dtype)


def _cond_len_arr(cond_len, B: int, S: int):
    """(B,) int32 per-row conditioning lengths for the SMEM operand;
    None = every cross K/V row live (the single-prompt fast path)."""
    if cond_len is None:
        return jnp.full((B,), S, jnp.int32)
    return jnp.asarray(cond_len, jnp.int32).reshape(B)


# double-buffered K/V chunk pairs (k+v, bf16) stay inside this VMEM budget;
# the rest of the kernel's residents (weight chunks, scratch, cross K/V) fit
# comfortably beside it under the 110 MB Mosaic limit used by v1/v2
_V3_KV_VMEM_BUDGET = 48 * 1024 * 1024


def v3_chunk_rows(B: int, h: int, W: int, itemsize: int = 2) -> int:
    """Batch-aware chunk size: largest 8-aligned row count whose
    double-buffered K+V blocks fit the VMEM budget, clamped to [256, 1024]
    (tiny chunks waste grid phases, huge ones starve the weight pipeline)."""
    rows = _V3_KV_VMEM_BUDGET // (4 * B * h * itemsize)  # 2 buffers x (k+v)
    chunk = max(256, min(1024, rows // 8 * 8))
    return min(chunk, -(-W // 8) * 8)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "chunk", "interpret", "stub")
)
def fused_decode_step3(
    packed, x, cross_k, cross_v, offset, k_cache, v_cache,
    cond_len=None,
    *, n_heads: int, chunk: int = 0, interpret: bool = False,
    stub: tuple = (),
):
    """fused_decode_step via the streamed-window kernel (_kernel3).

    Identical contract to fused_decode_step/2; works at ANY window length —
    the K/V window streams through the grid pipeline in batch-aware chunks
    instead of being bounded by VMEM (v2) or hand-rolled DMA (v1)."""
    L_cpl, h, _ = packed["w"].shape
    B, _ = x.shape
    W = k_cache.shape[2]
    if W % 8:
        raise ValueError(f"cache window {W} must be a multiple of 8")
    M = max(8, B)
    if not chunk:
        chunk = v3_chunk_rows(B, h, W, jnp.dtype(k_cache.dtype).itemsize)
    n_chunks = -(-W // chunk)
    cpl = CPL + n_chunks - 1
    shift = n_chunks - 1

    x_pad = jnp.zeros((M, h), x.dtype).at[0:B, :].set(x)
    off = jnp.reshape(offset.astype(jnp.int32), (1,))
    sl = _cond_len_arr(cond_len, B, cross_k.shape[2])

    kernel = functools.partial(
        _kernel3, n_heads=n_heads, b_live=B, chunk=chunk,
        n_chunks=n_chunks, window=W, cpl=cpl, stub=stub,
    )
    n_layers = L_cpl // CPL

    def w_idx(i):
        # map the (14 + shift)-phase schedule onto the 14-chunk packed
        # weight stream: chunk-fold phases prefetch the o-proj weight (3)
        li = i // cpl
        c = jax.lax.rem(i, cpl)
        wc = jnp.where(
            c <= 2, c, jnp.where(c <= 2 + n_chunks, 3, c - shift)
        )
        return (li * CPL + wc, 0, 0)

    def kv_idx(i):
        return (
            i // cpl, 0,
            jnp.clip(jax.lax.rem(i, cpl) - 2, 0, n_chunks - 1), 0,
        )

    y, kn, vn = pl.pallas_call(
        kernel,
        grid=(n_layers * cpl,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # offset
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # cond_len
            pl.BlockSpec((1, h, h), w_idx),                         # w chunk
            pl.BlockSpec((1, 1, h), w_idx),                         # scales
            pl.BlockSpec((1, 8, h), lambda i: (i // cpl, 0, 0)),    # ln
            pl.BlockSpec((M, h), lambda i: (0, 0)),                 # x
            pl.BlockSpec(
                (1, B, cross_k.shape[2], h), lambda i: (i // cpl, 0, 0, 0)
            ),                                                      # cross K
            pl.BlockSpec(
                (1, B, cross_v.shape[2], h), lambda i: (i // cpl, 0, 0, 0)
            ),                                                      # cross V
            pl.BlockSpec((1, B, chunk, h), kv_idx),                 # k window
            pl.BlockSpec((1, B, chunk, h), kv_idx),                 # v window
        ],
        out_specs=[
            pl.BlockSpec((M, h), lambda i: (0, 0)),                 # y
            pl.BlockSpec((n_layers, B, h), lambda i: (0, 0, 0)),    # k rows
            pl.BlockSpec((n_layers, B, h), lambda i: (0, 0, 0)),    # v rows
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, h), x.dtype),
            # new rows leave in the COMPUTE dtype; the wrapper encodes
            # them for the cache (f8 bytes under FGT_MG_KV=f8)
            jax.ShapeDtypeStruct((n_layers, B, h), x.dtype),
            jax.ShapeDtypeStruct((n_layers, B, h), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, h), jnp.float32),          # xs
            pltpu.VMEM((M, h), jnp.float32),          # lns
            pltpu.VMEM((M, h), jnp.float32),          # ys
            pltpu.VMEM((M, 4 * h), jnp.float32),      # hs
            pltpu.VMEM((M, h), jnp.float32),          # accs
            pltpu.VMEM((M, n_heads), jnp.float32),    # ms (running max)
            pltpu.VMEM((M, n_heads), jnp.float32),    # ls (running sum)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, sl, packed["w"], packed["s"], packed["ln"], x_pad,
      cross_k, cross_v, k_cache, v_cache)
    zero = jnp.int32(0)
    kn = store_kv_rows(kn, k_cache.dtype)
    vn = store_kv_rows(vn, v_cache.dtype)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, kn[:, :, None, :], (zero, zero, offset, zero))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, vn[:, :, None, :], (zero, zero, offset, zero))
    return y[0:B, :], k_cache, v_cache


@functools.partial(
    jax.jit, static_argnames=("n_heads", "chunk", "interpret", "stub")
)
def fused_decode_step2(
    packed, x, cross_k, cross_v, offset, k_cache, v_cache,
    cond_len=None,
    *, n_heads: int, chunk: int = 0, interpret: bool = False,
    stub: tuple = (),
):
    """fused_decode_step via the auto-pipelined kernel (_kernel2).

    Identical contract to fused_decode_step; `chunk` is derived from the
    window (<= 2 chunks) and the argument is ignored."""
    L_cpl, h, _ = packed["w"].shape
    B, _ = x.shape
    W = k_cache.shape[2]
    if W % 8:
        raise ValueError(f"cache window {W} must be a multiple of 8")
    M = max(8, B)
    if W <= 768:
        chunk = W
    else:
        chunk = (-(-W // 2) + 7) // 8 * 8
    n_chunks = -(-W // chunk)
    assert n_chunks <= 2

    x_pad = jnp.zeros((M, h), x.dtype).at[0:B, :].set(x)
    off = jnp.reshape(offset.astype(jnp.int32), (1,))
    sl = _cond_len_arr(cond_len, B, cross_k.shape[2])

    kernel = functools.partial(
        _kernel2, n_heads=n_heads, b_live=B, chunk=chunk,
        n_chunks=n_chunks, window=W, stub=stub,
    )
    n_layers = L_cpl // CPL

    def kv_idx(i):
        return (
            i // CPL, 0,
            jnp.clip(jax.lax.rem(i, CPL) - 2, 0, n_chunks - 1), 0,
        )

    y, kn, vn = pl.pallas_call(
        kernel,
        grid=(L_cpl,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # offset
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # cond_len
            pl.BlockSpec((1, h, h), lambda i: (i, 0, 0)),           # w chunk
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0)),           # scales
            pl.BlockSpec((1, 8, h), lambda i: (i // CPL, 0, 0)),    # ln
            pl.BlockSpec((M, h), lambda i: (0, 0)),                 # x
            pl.BlockSpec(
                (1, B, cross_k.shape[2], h), lambda i: (i // CPL, 0, 0, 0)
            ),                                                      # cross K
            pl.BlockSpec(
                (1, B, cross_v.shape[2], h), lambda i: (i // CPL, 0, 0, 0)
            ),                                                      # cross V
            pl.BlockSpec((1, B, chunk, h), kv_idx),                 # k window
            pl.BlockSpec((1, B, chunk, h), kv_idx),                 # v window
        ],
        out_specs=[
            pl.BlockSpec((M, h), lambda i: (0, 0)),                 # y
            pl.BlockSpec((L_cpl // CPL, B, h), lambda i: (0, 0, 0)),  # k rows
            pl.BlockSpec((L_cpl // CPL, B, h), lambda i: (0, 0, 0)),  # v rows
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, h), x.dtype),
            # new rows leave in the COMPUTE dtype; the wrapper encodes
            # them for the cache (f8 bytes under FGT_MG_KV=f8)
            jax.ShapeDtypeStruct((n_layers, B, h), x.dtype),
            jax.ShapeDtypeStruct((n_layers, B, h), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, h), jnp.float32),          # xs
            pltpu.VMEM((M, h), jnp.float32),          # lns
            pltpu.VMEM((M, h), jnp.float32),          # ys
            pltpu.VMEM((M, 4 * h), jnp.float32),      # hs
            pltpu.VMEM((M, h), jnp.float32),          # accs
            pltpu.VMEM((M, n_heads), jnp.float32),    # ms (running max)
            pltpu.VMEM((M, n_heads), jnp.float32),    # ls (running sum)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, sl, packed["w"], packed["s"], packed["ln"], x_pad,
      cross_k, cross_v, k_cache, v_cache)
    zero = jnp.int32(0)
    kn = store_kv_rows(kn, k_cache.dtype)
    vn = store_kv_rows(vn, v_cache.dtype)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, kn[:, :, None, :], (zero, zero, offset, zero))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, vn[:, :, None, :], (zero, zero, offset, zero))
    return y[0:B, :], k_cache, v_cache


@functools.partial(
    jax.jit, static_argnames=("n_heads", "chunk", "interpret", "stub")
)
def fused_decode_step(
    packed, x, cross_k, cross_v, offset, k_cache, v_cache,
    cond_len=None,
    *, n_heads: int, chunk: int = 512, interpret: bool = False,
    stub: tuple = (),
):
    """Run all decoder layers of one AR step in a single Pallas program.

    packed: pack_decode_weights output; x: (B, H) bf16 embedded token (+pos);
    cross_k/v: (L, B, S, H) bf16; offset: int32 scalar; k/v_cache:
    (L, B, W, H) bf16 — or float8_e4m3fn under FGT_MG_KV=f8 (loads widen to
    bf16 in-kernel, new rows round on the way out; halves the window DMA
    traffic) — with W a multiple of 8 (Mosaic tiles the window axis).
    cond_len: optional (B,) int32 per-row conditioning lengths — rows of the
    cross K/V at positions >= cond_len[b] are masked out (cross-user
    coalescing pads different prompts to one S bucket); None = all S live.
    The kernel reads the caches; the new K/V rows come back as (L, B, H)
    outputs and are inserted at `offset` with one dynamic_update_slice here.
    Returns (y (B, H) bf16, k_cache, v_cache)."""
    L_cpl, h, _ = packed["w"].shape
    B, _ = x.shape
    W = k_cache.shape[2]
    if W % 8:
        raise ValueError(f"cache window {W} must be a multiple of 8")
    M = max(8, B)
    chunk = min(chunk, W)
    n_chunks = -(-W // chunk)

    x_pad = jnp.zeros((M, h), x.dtype).at[0:B, :].set(x)
    off = jnp.reshape(offset.astype(jnp.int32), (1,))
    sl = _cond_len_arr(cond_len, B, cross_k.shape[2])

    kernel = functools.partial(
        _kernel, n_heads=n_heads, b_live=B, chunk=chunk,
        n_chunks=n_chunks, window=W, stub=stub,
    )
    n_layers = L_cpl // CPL
    y, kn, vn = pl.pallas_call(
        kernel,
        grid=(L_cpl,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # offset
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # cond_len
            pl.BlockSpec((1, h, h), lambda i: (i, 0, 0)),           # w chunk
            pl.BlockSpec((1, 1, h), lambda i: (i, 0, 0)),           # scales
            pl.BlockSpec((1, 8, h), lambda i: (i // CPL, 0, 0)),    # ln
            pl.BlockSpec((M, h), lambda i: (0, 0)),                 # x
            pl.BlockSpec(
                (1, B, cross_k.shape[2], h), lambda i: (i // CPL, 0, 0, 0)
            ),                                                      # cross K
            pl.BlockSpec(
                (1, B, cross_v.shape[2], h), lambda i: (i // CPL, 0, 0, 0)
            ),                                                      # cross V
            pl.BlockSpec(memory_space=pltpu.HBM),                   # k cache
            pl.BlockSpec(memory_space=pltpu.HBM),                   # v cache
        ],
        out_specs=[
            pl.BlockSpec((M, h), lambda i: (0, 0)),                 # y
            pl.BlockSpec((1, B, h), lambda i: (i // CPL, 0, 0)),    # k rows
            pl.BlockSpec((1, B, h), lambda i: (i // CPL, 0, 0)),    # v rows
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, h), x.dtype),
            # new rows leave in the COMPUTE dtype; the wrapper encodes
            # them for the cache (f8 bytes under FGT_MG_KV=f8)
            jax.ShapeDtypeStruct((n_layers, B, h), x.dtype),
            jax.ShapeDtypeStruct((n_layers, B, h), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, h), jnp.float32),          # xs
            pltpu.VMEM((M, h), jnp.float32),          # lns
            pltpu.VMEM((M, h), jnp.float32),          # ys
            pltpu.VMEM((M, 4 * h), jnp.float32),      # hs
            pltpu.VMEM((M, h), jnp.float32),          # accs
            pltpu.VMEM((2, B, chunk, h), k_cache.dtype),  # kbuf
            pltpu.VMEM((2, B, chunk, h), v_cache.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2, 2)),          # read sems
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off, sl, packed["w"], packed["s"], packed["ln"], x_pad,
      cross_k, cross_v, k_cache, v_cache)
    zero = jnp.int32(0)
    kn = store_kv_rows(kn, k_cache.dtype)
    vn = store_kv_rows(vn, v_cache.dtype)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, kn[:, :, None, :], (zero, zero, offset, zero))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, vn[:, :, None, :], (zero, zero, offset, zero))
    return y[0:B, :], k_cache, v_cache
