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


def use_pallas_lstm() -> bool:
    # default "auto" = ON for TPU backends (CPU uses the lax.scan LSTM; the
    # kernel is covered by interpret-mode tests). Round 1 shipped this
    # opt-in because kernel + full conv stack in one program blew XLA's
    # 128 MB vmem scheduling budget; EnCodec decode now runs as two jitted
    # programs split at the LSTM stage (models/musicgen/encodec.py), which
    # schedules cleanly.
    return _flag("FGT_PALLAS_LSTM")
