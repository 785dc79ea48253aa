"""LoRA adapters over plain-dict params.

Parity with flux/lora.py: lora_a ~ U(-1/√in, 1/√in) of shape (in, r), lora_b
zeros of shape (r, out), update y += (x@A)@B with scale 1, fusing returns the
base kernel + A@B. Injection targets every linear in the transformer blocks
(flux/flux.py:229-239); because blocks are *stacked* for `lax.scan`, adapters
are stacked too — one (L, in, r) / (L, r, out) pair per linear site — and
"last N blocks only" becomes a per-layer 0/1 mask on the stacked leading axis
rather than structural surgery.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _is_dense(p) -> bool:
    return isinstance(p, dict) and "kernel" in p and getattr(p["kernel"], "ndim", 0) >= 2


def _add_lora(p, key, rank: int, stacked: bool):
    """Add lora_a/lora_b to one dense param dict (possibly layer-stacked)."""
    kern = p["kernel"]
    if stacked:
        layers, d_in, d_out = kern.shape
        scale = 1 / math.sqrt(d_in)
        a = jax.random.uniform(key, (layers, d_in, rank), kern.dtype, -scale, scale)
        b = jnp.zeros((layers, rank, d_out), kern.dtype)
    else:
        d_in, d_out = kern.shape
        scale = 1 / math.sqrt(d_in)
        a = jax.random.uniform(key, (d_in, rank), kern.dtype, -scale, scale)
        b = jnp.zeros((rank, d_out), kern.dtype)
    return {**p, "lora_a": a, "lora_b": b}


def _map_dense(tree, fn, key, stacked: bool):
    """Apply fn to every dense param dict in tree, threading fresh keys."""
    counter = [0]

    def walk(node):
        if _is_dense(node):
            counter[0] += 1
            return fn(node, jax.random.fold_in(key, counter[0]), stacked)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(tree)


def apply_lora_to_flux(flow_params, rank: int = 8, key=None):
    """Inject LoRA into every linear of the double/single stream blocks
    (parity: flux/flux.py:229-239 targets all nn.Linear in the blocks)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    out = dict(flow_params)
    out["double_blocks"] = _map_dense(
        flow_params["double_blocks"],
        lambda p, k, s: _add_lora(p, k, rank, s),
        jax.random.fold_in(key, 0),
        stacked=True,
    )
    out["single_blocks"] = _map_dense(
        flow_params["single_blocks"],
        lambda p, k, s: _add_lora(p, k, rank, s),
        jax.random.fold_in(key, 1),
        stacked=True,
    )
    return out


def lora_only_filter(params):
    """Bool pytree: True on lora_a/lora_b leaves (the trainable set)."""

    def walk(node, under_lora=False):
        if isinstance(node, dict):
            return {k: walk(v, k in ("lora_a", "lora_b")) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return under_lora

    return walk(params)


def lora_block_mask(flow_params, num_blocks: int, depth: int, depth_single: int):
    """Per-leaf multiplier pytree: 1.0 where trainable. With num_blocks > 0
    only the LAST num_blocks of [double_blocks + single_blocks] train
    (reference reverses the concatenated list, flux/flux.py:231-234)."""
    total = depth + depth_single
    n = num_blocks if num_blocks > 0 else total
    # block index b (0..total-1) trains iff b >= total - n
    dbl_mask = jnp.arange(depth) >= (total - n)
    sgl_mask = jnp.arange(depth_single) >= (total - n - depth)

    def walk(node, mask):
        if isinstance(node, dict):
            return {
                k: (
                    mask.reshape((-1,) + (1,) * (v.ndim - 1)).astype(v.dtype)
                    if k in ("lora_a", "lora_b")
                    else walk(v, mask)
                )
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v, mask) for v in node]
        return jnp.zeros(())  # non-lora leaves get scalar 0 (unused)

    out = dict(flow_params)
    return {
        k: (
            walk(v, dbl_mask)
            if k == "double_blocks"
            else walk(v, sgl_mask) if k == "single_blocks" else jax.tree.map(lambda l: jnp.zeros(()), v)
        )
        for k, v in out.items()
    }


def extract_lora(tree):
    """Prune to only the lora_a/lora_b leaves (same nesting, empty branches
    dropped). Training takes gradients over THIS tree — differentiating the
    full 12B base wastes a backward pass's memory and FLOPs, and is
    impossible outright when the frozen base is int8-quantized."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("lora_a", "lora_b"):
                    out[k] = v
                else:
                    sub = walk(v)
                    if sub is not None:
                        out[k] = sub
            return out or None
        if isinstance(node, list):
            subs = [walk(v) for v in node]
            return subs if any(s is not None for s in subs) else None
        return None

    return walk(tree) or {}


def merge_lora(full, lora):
    """Overlay an extract_lora tree back onto the full param tree."""
    if lora is None:
        return full
    if isinstance(full, dict):
        out = dict(full)
        for k, v in lora.items():
            out[k] = merge_lora(full.get(k), v) if k not in ("lora_a", "lora_b") else v
        return out
    if isinstance(full, list):
        return [merge_lora(f, l) for f, l in zip(full, lora)]
    return lora


def fuse_lora(params):
    """Fold adapters into kernels: W += A@B (flux/lora.py:28-43, scale 1)."""

    def walk(node):
        if _is_dense(node) and "lora_a" in node:
            kern = node["kernel"] + jnp.einsum(
                "...ir,...ro->...io", node["lora_a"], node["lora_b"]
            ).astype(node["kernel"].dtype)
            return {k: v for k, v in {**node, "kernel": kern}.items()
                    if k not in ("lora_a", "lora_b")}
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
