"""Sharding rules: map param-tree paths → PartitionSpecs.

Tensor parallelism for the transformer stacks follows the Megatron pattern
expressed as GSPMD annotations: column-shard the qkv/up projections on the
"model" axis (kernel (in, out) → P(None, "model")), row-shard the output/down
projections (P("model", None)); XLA inserts the all-reduce. Everything else is
replicated. Activations are sharded on "data" (batch).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# path-regex → PartitionSpec for the kernel; biases of column-parallel layers
# shard on the same axis.
_COL_PAT = re.compile(
    r"(qkv|linear1|to_q|to_k|to_v|query|key|value|q\b|k\b|v\b|wi|wi_0|wi_1|"
    r"in_layer|fc1|mlp/0|img_mlp/0|txt_mlp/0|lin\b|proj_in|up_proj|gate_proj)"
)
_ROW_PAT = re.compile(
    r"(proj\b|linear2|to_out|out\b|o\b|wo|out_layer|fc2|mlp/2|img_mlp/2|"
    r"txt_mlp/2|proj_out|down_proj)"
)


def _spec_for(path: str, leaf) -> P:
    if leaf.ndim < 2 or "kernel" not in path:
        # biases / norms / embeddings replicated (bias sharding done via path
        # of owning module if needed; replication is correct with all-reduce).
        return P()
    # layer-stacked kernels (scan) carry a leading depth axis: shard the
    # matmul dims, never the stack axis
    lead = (None,) * (leaf.ndim - 2)
    if _ROW_PAT.search(path):
        return P(*lead, MODEL_AXIS, None)
    if _COL_PAT.search(path):
        return P(*lead, None, MODEL_AXIS)
    return P()


def logical_sharding(params, mesh):
    """Compute a NamedSharding tree for a param tree under `mesh`."""

    def one(path, leaf):
        pstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        return NamedSharding(mesh, _spec_for(pstr, leaf))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh):
    """Device-put a param tree with TP sharding over `mesh`."""
    return jax.device_put(params, logical_sharding(params, mesh))


def replicate(tree, mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
