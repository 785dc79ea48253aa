"""Runtime feature switches.

FGT_PALLAS=auto|1|0 — use the Pallas flash-attention (+fused RoPE) kernel on
the Flux hot path. "auto" (default) enables it only on TPU backends; CPU
tests run the einsum path (the kernel itself is covered by interpret-mode
tests in tests/test_pallas_flash.py).
"""

from __future__ import annotations

import os


def _flag(name: str) -> bool:
    import jax

    v = os.environ.get(name, os.environ.get("FGT_PALLAS", "auto")).lower()
    if v == "auto":
        return jax.default_backend() == "tpu"
    return v not in ("0", "off", "false", "no")


def use_pallas_attention() -> bool:
    return _flag("FGT_PALLAS_ATTENTION")


# --------------------------------------------------------------- ring ctx
# Sequence/context parallelism switch (SURVEY §2.6): when set, model
# attention dispatches to parallel.ring_attention for sequences at or above
# the threshold (>2048² generation: 16k+ image tokens). Set via
# FluxPipeline.enable_ring_attention or set_ring_attention directly.
_RING_CTX: dict = {"mesh": None, "axis": "model", "threshold": 32768}


def set_ring_attention(mesh, axis: str = "model", threshold: int = 32768):
    """Enable (mesh != None) or disable (mesh=None) ring attention for
    sequences of length >= threshold."""
    _RING_CTX.update(mesh=mesh, axis=axis, threshold=threshold)


def ring_attention_params(seq_len: int):
    """Returns (mesh, axis) when ring attention should handle seq_len."""
    mesh = _RING_CTX["mesh"]
    if mesh is not None and seq_len >= _RING_CTX["threshold"] \
            and seq_len % mesh.shape[_RING_CTX["axis"]] == 0:
        return mesh, _RING_CTX["axis"]
    return None, None


def use_pallas_int4() -> bool:
    """Packed-int4 matmuls through the Pallas unpack-in-kernel path
    (ops/pallas/int4_matmul.py) — the nibble extraction never fuses as well
    in XLA as it does issued straight into the MXU feed. auto = on for TPU."""
    return _flag("FGT_PALLAS_INT4")


def use_pallas_lstm() -> bool:
    # default "auto" = ON for TPU backends (CPU uses the lax.scan LSTM; the
    # kernel is covered by interpret-mode tests). Round 1 shipped this
    # opt-in because kernel + full conv stack in one program blew XLA's
    # 128 MB vmem scheduling budget; EnCodec decode now runs as two jitted
    # programs split at the LSTM stage (models/musicgen/encodec.py), which
    # schedules cleanly.
    return _flag("FGT_PALLAS_LSTM")
