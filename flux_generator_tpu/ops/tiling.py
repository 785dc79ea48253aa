"""Overlap-tiled spatial decode — bound conv-decoder activation memory.

A VAE decoder at 2048² holds >1 GB per conv activation; next to a resident
12 GB model that OOMs. `tiled_decode_2d` runs the decoder once per
overlapping tile inside one `lax.scan` (single compile, sequential peak
memory = one tile) and cross-fades overlaps with a linear ramp. The final
division by the accumulated weight makes single-contributor pixels (image
borders) exact; interior seams blend over `overlap` latent pixels —
the standard big-image VAE technique.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def tiled_decode_2d(decode_fn: Callable, z, tile: int, overlap: int,
                    factor):
    """decode_fn: (B, t, t, C) tile → (B, t·factor, t·factor, out_ch).
    z: (B, H, W, C). Returns the blended (B, H·factor, W·factor, out) result
    in z.dtype. `factor` may be fractional (e.g. 1/8 for a VAE *encoder*
    mapping image tiles to latent tiles) as long as tile·factor,
    overlap·factor, and every tile offset·factor are integral. Degenerates
    to one plain call when z fits one tile."""
    b, h, w, _ = z.shape
    if h <= tile and w <= tile:
        return decode_fn(z)
    # Per-axis effective tile: a non-square input may be smaller than `tile`
    # on one axis (e.g. 64×192 latent with tile=96) — clamping per axis keeps
    # every offset non-negative and every slice full-sized.
    tile_h, tile_w = min(tile, h), min(tile, w)
    stride_h = max(tile_h - overlap, 1)
    stride_w = max(tile_w - overlap, 1)
    ys = sorted({max(0, min(y, h - tile_h)) for y in range(0, h, stride_h)})
    xs = sorted({max(0, min(x, w - tile_w)) for x in range(0, w, stride_w)})

    def scaled(v):
        s = v * factor
        assert abs(s - round(s)) < 1e-9, (v, factor)
        return int(round(s))

    tf_h, tf_w, of = scaled(tile_h), scaled(tile_w), scaled(overlap)
    positions = [(y, x) for y in ys for x in xs]
    out_hw = (scaled(h), scaled(w))

    tiles = jnp.stack(
        [z[:, y : y + tile_h, x : x + tile_w] for y, x in positions]
    )

    def dec(_, zt):
        return None, decode_fn(zt)

    _, imgs = jax.lax.scan(dec, None, tiles)  # (T, b, tf_h, tf_w, out)
    out_ch = imgs.shape[-1]

    def axis_ramp(n):
        r = jnp.minimum(jnp.arange(n, dtype=jnp.float32) + 1.0,
                        float(of)) / of
        return jnp.minimum(r, r[::-1])  # up-ramp, flat middle, down-ramp

    wt = (axis_ramp(tf_h)[:, None] * axis_ramp(tf_w)[None, :])[..., None]

    pos = jnp.asarray([(scaled(y), scaled(x)) for y, x in positions], jnp.int32)
    out0 = jnp.zeros((b, *out_hw, out_ch), jnp.float32)
    wsum0 = jnp.zeros((*out_hw, 1), jnp.float32)

    def blend(i, acc):
        out, wsum = acc
        y0, x0 = pos[i, 0], pos[i, 1]
        cur = jax.lax.dynamic_slice(out, (0, y0, x0, 0), (b, tf_h, tf_w, out_ch))
        out = jax.lax.dynamic_update_slice(
            out, cur + imgs[i].astype(jnp.float32) * wt, (0, y0, x0, 0)
        )
        curw = jax.lax.dynamic_slice(wsum, (y0, x0, 0), (tf_h, tf_w, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, curw + wt, (y0, x0, 0))
        return out, wsum

    out, wsum = jax.lax.fori_loop(0, len(positions), blend, (out0, wsum0))
    return (out / jnp.maximum(wsum, 1e-6)).astype(z.dtype)


def batched_apply(fn: Callable, z, pixel_limit: int):
    """Apply `fn` (itself possibly tiled) to a batch, sequentially per image
    when the whole batch's spatial footprint exceeds `pixel_limit` pixels.

    VAE conv activations scale with B·H·W: one 1024² flux decode fits next to
    the resident 12 GB flow, but batch 2 at the same size OOMs a 16 GB chip
    (measured: bench --size 1024 --batch 2 → RESOURCE_EXHAUSTED). Running the
    decoder once per image inside `lax.scan` keeps peak activation memory at
    the single-image level while staying one compiled program; outputs are
    bit-identical to the batched call because the decoder has no cross-batch
    ops. Below the limit the plain batched call is used (one kernel launch,
    better MXU utilisation for small images)."""
    b, h, w = z.shape[0], z.shape[1], z.shape[2]
    if b <= 1 or b * h * w <= pixel_limit:
        return fn(z)
    return jax.lax.map(lambda zi: fn(zi[None])[0], z)
