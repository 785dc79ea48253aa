#!/usr/bin/env python3
"""Serve the real web UI backed by tiny random-init pipelines — the target
for a browser-level smoke drive (VERDICT r3 next #9: the ~150 lines of
inline JS in server/ui.py ship with only fetch-level tests; this gives a
real browser something to click).

Usage: python scripts/drive_ui.py [--port 7861]
Prints `UI_READY http://...` when listening; serves until killed."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # tiny models; leave the TPU free

import jax.numpy as jnp  # noqa: E402

from flux_generator_tpu.pipelines.flux import FluxPipeline  # noqa: E402
from flux_generator_tpu.server.api import FluxAPI  # noqa: E402
from flux_generator_tpu.server.httpd import Server  # noqa: E402


class _TokStub:
    def encode(self, texts, **kw):
        if isinstance(texts, str):
            texts = [texts]
        return [[1, 2, 3, 0] for _ in texts]


def flux_factory(name):
    pipe = FluxPipeline.random_init(name, tiny=True, dtype=jnp.float32)
    pipe.clip_tokenizer = _TokStub()
    pipe.t5_tokenizer = _TokStub()
    return pipe


def music_factory():
    from flux_generator_tpu.pipelines.musicgen import MusicGenPipeline

    pipe = MusicGenPipeline.random_init()
    pipe.tokenizer = _TokStub()
    return pipe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=7861)
    args = ap.parse_args()

    api = FluxAPI(pipeline_factory=flux_factory)
    api._music_factory = music_factory
    srv = Server(api, "127.0.0.1", args.port)
    srv.start_background()
    print(f"UI_READY http://127.0.0.1:{srv.port}", flush=True)
    import time

    while True:
        time.sleep(60)


if __name__ == "__main__":
    main()
