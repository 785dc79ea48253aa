"""Audio output helpers (parity: musicgen/utils.py:7-15)."""

from __future__ import annotations

import numpy as np


def save_audio(file: str, audio, sampling_rate: int):
    """Clip to [-1, 1], convert to int16, write WAV."""
    from scipy.io.wavfile import write

    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim > 1 and audio.shape[-1] == 1:
        audio = audio[..., 0]
    audio = np.clip(audio, -1.0, 1.0)
    write(file, sampling_rate, (audio * 32767).astype(np.int16))
