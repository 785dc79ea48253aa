"""Pipeline parallelism — GPipe-style microbatched layer-stage execution.

The reference has no pipeline parallelism (its largest model fits one Apple
unified-memory pool; SURVEY §2.6 marks PP absent). On TPU pods, PP is the
third axis of the standard sharding toolbox (dp x tp x pp): when a model's
layer stack does not fit one chip even tensor-sharded, consecutive layer
chunks live on different devices and microbatches stream through the stages.

This module implements it the TPU way, on top of the same layer-STACKED
parameter layout the rest of the repo scans over (models/flux/model.py): the
leading `depth` axis of every stacked kernel is sharded over a mesh axis, and
`pipeline_scan` replaces `lax.scan` over layers with a GPipe schedule inside
one `shard_map`:

  - the batch is split into M microbatches;
  - tick t: stage s runs its local layer chunk on microbatch (t - s), then
    activations hop one stage forward with `jax.lax.ppermute` (ICI
    neighbor exchange — the same collective ring attention uses);
  - M + S - 1 ticks drain the pipe; the bubble fraction is (S-1)/(M+S-1).

The tick loop is a `lax.scan` (not fori_loop), so the whole schedule is
REVERSE-DIFFERENTIABLE: `jax.grad` through `pipeline_scan` yields the classic
GPipe backward schedule automatically (XLA reverses the ppermute ring).
Training and inference share this one implementation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _leading_dim(tree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


def pipeline_scan(
    body: Callable,
    carry,
    stacked_params,
    mesh,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    extras=(),
):
    """Run `lax.scan(body over layers)` with the layer stack pipelined over
    `mesh.shape[axis]` stages.

    body(carry, layer_params, *extras) -> new carry. `carry` and every leaf
    of `extras` MUST have a leading batch dimension; it is split into
    `microbatches` microbatches (default: one per stage) and each stage
    receives the slice belonging to the microbatch it is currently
    processing. Broadcast a scalar to (batch, ...) before passing it.
    `stacked_params` leaves have a leading depth axis divisible by the stage
    count; each stage owns a contiguous chunk of layers.

    Returns the final carry, bit-equivalent to the plain sequential scan
    (same layer order, same microbatch-local math — batch-pointwise bodies
    only; anything that mixes examples across the batch, e.g. batch norm,
    would see microbatch statistics).
    """
    stages = int(mesh.shape[axis])
    if stages == 1:
        def seq(c, p):
            return body(c, p, *extras), None

        return jax.lax.scan(seq, carry, stacked_params)[0]

    depth = _leading_dim(stacked_params)
    if depth % stages:
        raise ValueError(f"depth {depth} not divisible by {stages} pipeline stages")
    batch = _leading_dim(carry)
    if microbatches is None:
        # largest divisor of the batch that fits the stage count (a prime
        # batch of 3 on 2 stages degrades to 1 microbatch rather than erroring)
        m = min(batch, stages)
        while batch % m:
            m -= 1
    else:
        m = microbatches
    if batch % m:
        raise ValueError(f"batch {batch} not divisible by {m} microbatches")

    def to_mb(t):
        return jax.tree.map(lambda x: x.reshape(m, batch // m, *x.shape[1:]), t)

    carry_mb, extras_mb = to_mb(carry), to_mb(tuple(extras))
    perm = [(j, (j + 1) % stages) for j in range(stages)]

    def stage_fn(params_local, carry_mb, extras_mb):
        s = jax.lax.axis_index(axis)

        def run_chunk(state, ex):
            return jax.lax.scan(
                lambda c, p: (body(c, p, *ex), None), state, params_local
            )[0]

        def tick(sc, t):
            state, outputs = sc
            # stage 0 ingests microbatch t (clamped index keeps shapes static
            # during the drain ticks; the value is masked out by `where`)
            mb_in = jnp.clip(t, 0, m - 1)
            inp = jax.tree.map(lambda c: c[mb_in], carry_mb)
            state = jax.tree.map(
                lambda i, st: jnp.where(s == 0, i, st), inp, state
            )
            # this stage is processing microbatch (t - s): pick its extras
            mb_here = jnp.clip(t - s, 0, m - 1)
            ex = jax.tree.map(lambda e: e[mb_here], extras_mb)
            # run the local layer chunk
            state = run_chunk(state, ex)
            # last stage emits microbatch t - (S-1)
            out_t = t - (stages - 1)
            idx = jnp.maximum(out_t, 0)
            emit = (out_t >= 0) & (s == stages - 1)

            def upd(o, st):
                cur = jax.lax.dynamic_index_in_dim(o, idx, 0, keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(emit, st, cur), idx, 0
                )

            outputs = jax.tree.map(upd, outputs, state)
            # activations hop one stage forward (ICI neighbor ring)
            state = jax.tree.map(
                lambda st: jax.lax.ppermute(st, axis, perm), state
            )
            return (state, outputs), None

        state0 = jax.tree.map(lambda c: jnp.zeros_like(c[0]), carry_mb)
        out0 = jax.tree.map(jnp.zeros_like, carry_mb)
        (_, outputs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(m + stages - 1)
        )
        # only the final stage holds real outputs (others zeros) — one psum
        # replicates the result everywhere
        return jax.tree.map(lambda o: jax.lax.psum(o, axis), outputs)

    params_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    rep = jax.tree.map(lambda _: P(), carry_mb)
    ex_spec = jax.tree.map(lambda _: P(), extras_mb)
    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(params_spec, rep, ex_spec),
        out_specs=jax.tree.map(lambda _: P(), carry_mb),
        check_vma=False,
        # manual ONLY over the pipe axis: any other mesh axes (e.g. a
        # "model" TP axis carried by the kernels' NamedShardings) stay
        # auto — GSPMD partitions the stage body over them, so tensor
        # parallelism composes INSIDE each pipeline stage
        axis_names={axis},
    )(stacked_params, carry_mb, extras_mb)
    return jax.tree.map(lambda o: o.reshape(batch, *o.shape[2:]), out)


def pad_stack(stacked_params, stages: int):
    """Zero-pad a layer stack's leading depth axis up to a multiple of
    `stages` so it splits evenly across pipeline stages.

    Zero parameters are IDENTITY layers for gated-residual blocks (both Flux
    block kinds: every contribution to the residual stream is multiplied by a
    modulation gate computed as dense(zeros) = 0), so padding preserves the
    function exactly. Flux's depth=19 double stack is prime — without padding
    it could only split 19 ways; padded to 20 it runs on 2/4/5/10 stages.
    Returns (padded_params, original_depth)."""
    depth = _leading_dim(stacked_params)
    pad = (-depth) % stages
    if pad == 0:
        return stacked_params, depth
    padded = jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0
        ),
        stacked_params,
    )
    return padded, depth


def pipeline_stage_sharding(stacked_params, mesh, axis: str = "pipe"):
    """NamedSharding tree placing each stage's layer chunk on its device:
    the leading depth axis of every stacked leaf is sharded over `axis`
    (weights for stage s live only on stage s — the memory win of PP)."""

    def one(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return NamedSharding(mesh, spec)

    return jax.tree.map(one, stacked_params)


def shard_pipeline_params(stacked_params, mesh, axis: str = "pipe"):
    return jax.device_put(
        stacked_params, pipeline_stage_sharding(stacked_params, mesh, axis)
    )


def pipeline_tp_sharding(stacked_params, mesh, pipe_axis: str = "pipe",
                         model_axis: str = "model"):
    """Combined PP × TP placement: the leading depth axis is staged over
    `pipe_axis` AND each kernel's matmul dims are Megatron col/row-sharded
    over `model_axis` (parallel/sharding.py rules). pipeline_scan is manual
    only over the pipe axis, so GSPMD partitions every stage's matmuls over
    the model axis and inserts the TP all-reduces inside the stage body."""
    import jax.tree_util as jtu

    from .sharding import _COL_PAT, _ROW_PAT

    def one(path, leaf):
        pstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        parts = [pipe_axis] + [None] * (leaf.ndim - 1)
        if leaf.ndim >= 3 and "kernel" in pstr:
            if _ROW_PAT.search(pstr):
                parts[-2] = model_axis
            elif _COL_PAT.search(pstr):
                parts[-1] = model_axis
        return NamedSharding(mesh, P(*parts))

    return jtu.tree_map_with_path(one, stacked_params)
