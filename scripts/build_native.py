#!/usr/bin/env python3
"""Build the native components (csrc/) into flux_generator_tpu/native/.

Currently: libfgt_tokenizer.so (CLIP BPE merge engine + SentencePiece
unigram Viterbi engine). Pure C ABI loaded via ctypes — no pybind11 needed.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).parent.parent
OUT_DIR = ROOT / "flux_generator_tpu" / "native"


def build() -> pathlib.Path:
    OUT_DIR.mkdir(exist_ok=True)
    (OUT_DIR / "__init__.py").touch()
    srcs = [ROOT / "csrc" / "clip_bpe.cpp", ROOT / "csrc" / "spm_unigram.cpp"]
    out = OUT_DIR / "libfgt_tokenizer.so"
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        *[str(s) for s in srcs], "-o", str(out),
    ]
    subprocess.run(cmd, check=True)
    print(f"built {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if build().exists() else 1)
