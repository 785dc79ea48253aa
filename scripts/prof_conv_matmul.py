#!/usr/bin/env python3
"""Probe: XLA's TPU 3x3-conv lowering vs the same math as 9 shifted matmuls.

prof_sd_mfu's microbench measured lax.conv_general_dilated at 12-41 TF/s
(6-21% of MXU peak) on SD UNet level shapes while plain matmuls of the same
K/N run at 150-200 TF/s — if the 9-matmul formulation recovers matmul-class
throughput, the UNet's conv-bound step time drops with it.

Protocol: one jitted lax.scan over N stacked DISTINCT weights (each conv
fetches its own kernel, like the real UNet), absolute time / N.

Usage: python scripts/prof_conv_matmul.py [--sdxl]
"""

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

V5E_BF16_PEAK = 197e12
N = 100


def _med(f, n=5):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def conv_9mm(x, w):
    """3x3 SAME conv as 9 shifted (BHW, C) @ (C, Co) matmuls, f32 accum."""
    b, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b * h * ww, co), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = xp[:, di : di + h, dj : dj + ww, :].reshape(b * h * ww, c)
            acc += jax.lax.dot(xs, w[di, dj], preferred_element_type=jnp.float32)
    return acc.astype(x.dtype).reshape(b, h, ww, co)


def conv_i2c(x, w):
    """im2col: one (BHW, 9C) @ (9C, Co) matmul."""
    b, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, di : di + h, dj : dj + ww, :]
         for di in range(3) for dj in range(3)], axis=-1,
    ).reshape(b * h * ww, 9 * c)
    y = jax.lax.dot(
        cols, w.reshape(9 * c, co), preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(b, h, ww, co)


def run(levels, nb):
    impls = {"xla-conv": conv_xla, "9-matmul": conv_9mm, "im2col": conv_i2c}
    for hw, c in levels:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (nb, hw, hw, c), jnp.bfloat16)
        ws = jax.random.normal(k, (N, 3, 3, c, c), jnp.bfloat16) * 0.02
        fl = 2 * nb * hw * hw * c * c * 9
        # parity first (same weights, tolerance for accum-order)
        ref = np.asarray(conv_xla(x, ws[0]), np.float32)
        row = [f"{hw:3d}² c={c:<5d}"]
        for name, impl in impls.items():
            got = np.asarray(impl(x, ws[0]), np.float32)
            err = np.abs(ref - got).max() / max(1e-3, np.abs(ref).max())
            assert err < 0.02, (name, hw, c, err)

            @jax.jit
            def chain(x, ws, impl=impl):
                def body(xc, w):
                    return impl(xc, w) * (1.0 / c), ()
                y, _ = jax.lax.scan(body, x, ws)
                return y

            t = _med(lambda: float(jnp.sum(chain(x, ws).astype(jnp.float32))))
            per = t / N
            row.append(f"{name} {per*1e3:7.3f} ms "
                       f"({100*fl/per/V5E_BF16_PEAK:4.1f}%)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    if "--sdxl" in sys.argv:
        print("== SDXL levels, batch 1 ==")
        run([(128, 320), (64, 640), (32, 1280)], 1)
    else:
        print("== SD2.1 levels, batch 2 ==")
        run([(64, 320), (32, 640), (16, 1280), (8, 1280)], 2)
