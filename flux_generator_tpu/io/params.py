"""Checkpoint → param-pytree assembly.

Torch/HF checkpoints are flat name→tensor dicts. Our params are nested dicts
with (a) python lists for heterogeneous blocks (UNet/VAE levels) and (b)
layer-STACKED arrays for homogeneous transformer stacks (flux double/single
blocks, CLIP/T5/MusicGen layers) that run under `lax.scan`. This module turns
mapped flat paths into that structure.

Dtype transforms applied by mappers (io.sanitize), not here:
  linear (out,in)→(in,out); conv2d OIHW→HWIO; conv1d OIK→KIO;
  convtranspose1d IOK→KIO+time-flip (see models/musicgen/encodec.py).
"""

from __future__ import annotations

import numpy as np


def unflatten(flat: dict, stack_prefixes=()):
    """flat: {"a.0.b.kernel": arr} → nested dicts/lists; subtrees whose path
    matches an entry in stack_prefixes get their integer level stacked into a
    leading-axis array tree."""
    root = {}
    for path, value in flat.items():
        parts = path.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def is_int_keyed(d):
        return isinstance(d, dict) and d and all(k.isdigit() for k in d)

    def convert(node, path):
        if not isinstance(node, dict):
            return node
        if is_int_keyed(node):
            # fill index gaps with empty dicts — parameterless entries (e.g.
            # EnCodec's ELU slots) never appear in checkpoints
            n = max(int(i) for i in node) + 1
            items = [convert(node.get(str(i), {}), path + (str(i),)) for i in range(n)]
            if path and ".".join(p for p in path if not p.isdigit()) in stack_prefixes:
                return _stack_trees(items)
            return items
        return {k: convert(v, path + (k,)) for k, v in node.items()}

    return convert(root, ())


def _stack_trees(trees):
    """Stack a list of identical-structure trees into one tree of stacked
    leading-axis arrays."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in first}
    if isinstance(first, list):
        return [_stack_trees([t[i] for t in trees]) for i in range(len(first))]
    return np.stack(trees)


# ------------------------------------------------------------ transforms


def t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def t_conv2d(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def t_conv1d(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def t_convtr1d(w):
    # torch ConvTranspose1d (in, out, k) → lhs-dilated-conv kernel (k, in, out)
    # with time flip (see _dec_convtr)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 0, 1))[::-1])
