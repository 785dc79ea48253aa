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
    # opt-in (default off): the kernel is verified standalone on TPU but the
    # remote compiler currently rejects it embedded in the full EnCodec
    # decode program (see NOTES.md); scan-LSTM is within ~10 ms/generation
    v = os.environ.get("FGT_PALLAS_LSTM", "0").lower()
    return v not in ("0", "off", "false", "no", "auto")
