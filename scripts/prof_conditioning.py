"""Profile the Flux conditioning phase on the real chip: T5-XXL int4-packed
encode (256 tokens) vs int8 vs CLIP-L, each timed with a forced fetch.
Usage: python scripts/prof_conditioning.py [--quick]
"""

import argparse
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _zeros_like_tree(tree_shape):
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree_shape)
    )()


def timed(fn, n=5, label=""):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts)) * 1000
    print(f"{label:48s} {p50:8.1f} ms  (min {min(ts)*1e3:.1f})", flush=True)
    return p50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="int4g128,int8,clip,fetch")
    args = ap.parse_args()
    modes = args.modes.split(",")

    from flux_generator_tpu.io.registry import flux_configs
    from flux_generator_tpu.models.t5.t5 import init_t5_encoder, t5_encode
    from flux_generator_tpu.models.clip.text import clip_text_forward, init_clip_text
    from flux_generator_tpu.ops.quant import quantize_tree

    cfg, ae_cfg, clip_cfg, t5_cfg = flux_configs("flux-schnell")
    dtype = jnp.bfloat16
    toks = jnp.ones((1, 256), jnp.int32)

    if "fetch" in modes:
        # time a FRESH output each call: repeated np.asarray on the same
        # array reads its cached host copy (measures 0.0 ms — wrong floor)
        x = jnp.zeros((1, 256, 4096), jnp.bfloat16)
        g = jax.jit(lambda x: x + 1)
        timed(lambda: np.asarray(g(x)),
              label="dispatch+fetch floor (1,256,4096) bf16")

    if "clip" in modes:
        clip = _zeros_like_tree(jax.eval_shape(
            lambda: init_clip_text(jax.random.PRNGKey(0), clip_cfg, dtype)))
        ctoks = jnp.ones((1, 77), jnp.int32)
        f = jax.jit(lambda p, t: clip_text_forward(p, clip_cfg, t)["pooled_output"])
        timed(lambda: np.asarray(f(clip, ctoks)), label="CLIP-L bf16 pooled (77 tok)")
        del clip

    for mode in modes:
        if mode in ("clip", "fetch"):
            continue
        if mode == "int4g128":
            kw = dict(bits=4, group_size=128, pack=True)
        elif mode == "int4pc":
            kw = dict(bits=4, pack=True)
        elif mode == "int8":
            kw = dict(bits=8)
        elif mode == "bf16":
            kw = None
        else:
            continue
        if kw is None:
            shape = jax.eval_shape(
                lambda: init_t5_encoder(jax.random.PRNGKey(0), t5_cfg, dtype))
        else:
            shape = jax.eval_shape(
                lambda: quantize_tree(
                    init_t5_encoder(jax.random.PRNGKey(0), t5_cfg, dtype), **kw))
        t5 = _zeros_like_tree(shape)
        nbytes = sum(l.nbytes for l in jax.tree.leaves(t5)) / 1e9
        f = jax.jit(lambda p, t: t5_encode(p, t5_cfg, t))
        timed(lambda: np.asarray(f(t5, toks)),
              label=f"T5-XXL {mode} encode 256 tok ({nbytes:.2f} GB)")
        del t5, f


if __name__ == "__main__":
    main()
