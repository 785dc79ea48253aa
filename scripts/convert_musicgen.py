#!/usr/bin/env python3
"""One-time MusicGen checkpoint conversion: torch state_dict.bin →
safetensors in our canonical layout (SURVEY §7: avoid the torch runtime
dependency the reference carries at load time, musicgen/musicgen.py:352).

python scripts/convert_musicgen.py [--repo facebook/musicgen-medium]
                                   [--out /path/musicgen-medium-fgt.safetensors]

Afterwards loaders pick the converted file up automatically when it sits next
to config.json as model.fgt.safetensors.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def convert(repo: str, out: str | None):
    import numpy as np
    import torch
    from safetensors.numpy import save_file

    from flux_generator_tpu.io import sanitize
    from flux_generator_tpu.io.loaders import hf_snapshot

    path = hf_snapshot(repo, ["*.json", "state_dict.bin"])
    weights = torch.load(
        path / "state_dict.bin", weights_only=True, map_location="cpu"
    )["best_state"]
    weights = {k: v.numpy() for k, v in weights.items()}
    flat = sanitize.sanitize_musicgen(weights)
    flat = {k: np.ascontiguousarray(v) for k, v in flat.items()}
    out = out or str(path / "model.fgt.safetensors")
    save_file(flat, out, metadata={"format": "flux_generator_tpu.musicgen.v1"})
    print(f"wrote {out} ({sum(v.nbytes for v in flat.values()) / 1e9:.2f} GB)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="facebook/musicgen-medium")
    ap.add_argument("--out")
    args = ap.parse_args()
    convert(args.repo, args.out)
