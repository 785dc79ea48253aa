"""Micro-profiling of T5-XXL encode components at real shapes (256 tokens).
Isolates: pure scanned matmul throughput, attention, rms/residual overhead.
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


def timed(fn, n=5, label=""):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts)) * 1000
    print(f"{label:56s} {p50:8.1f} ms", flush=True)
    return p50


def main():
    L, D, F, layers = 256, 4096, 10240, 24
    dt = jnp.bfloat16
    x = jnp.zeros((1, L, D), dt)

    # 1. pure ffn matmuls: wi_0, wi_1 (D->F), wo (F->D), scanned
    w_up = jnp.zeros((layers, 2, D, F), dt)
    w_dn = jnp.zeros((layers, F, D), dt)

    @jax.jit
    def ffn_only(x, w_up, w_dn):
        def step(c, ws):
            wu, wd = ws
            h = jax.nn.gelu(c @ wu[0], approximate=True) * (c @ wu[1])
            return c + h @ wd, None
        return jax.lax.scan(step, x, (w_up, w_dn))[0]

    timed(lambda: np.asarray(ffn_only(x, w_up, w_dn)),
          label=f"24x gated-FFN only ({2*3*L*D*F*layers/1e12:.2f} TFLOP)")

    # 2. + qkvo matmuls (no attention math)
    w_qkvo = jnp.zeros((layers, 4, D, D), dt)

    @jax.jit
    def ffn_qkvo(x, w_up, w_dn, w_qkvo):
        def step(c, ws):
            wu, wd, wq = ws
            c = c + (c @ wq[0]) + (c @ wq[1]) + (c @ wq[2]) + (c @ wq[3])
            h = jax.nn.gelu(c @ wu[0], approximate=True) * (c @ wu[1])
            return c + h @ wd, None
        return jax.lax.scan(step, x, (w_up, w_dn, w_qkvo))[0]

    timed(lambda: np.asarray(ffn_qkvo(x, w_up, w_dn, w_qkvo)),
          label="24x FFN + 4 DxD matmuls")
    del w_up, w_dn, w_qkvo

    # 4. attention-only at T5 shapes
    from flux_generator_tpu.ops.attention import dot_product_attention

    q = jnp.zeros((1, L, 64, 64), dt)
    bias = jnp.zeros((1, 64, L, L), dt)

    @jax.jit
    def attn_only(q, bias):
        def step(c, _):
            return c + dot_product_attention(c, c, c, bias=bias, scale=1.0), None
        return jax.lax.scan(step, q, None, length=layers)[0]

    timed(lambda: np.asarray(attn_only(q, bias)), label="24x attention core only")

    # 5. dispatch floor: trivial program + fetch
    g = jax.jit(lambda x: x + 1)
    timed(lambda: np.asarray(g(x)), label="dispatch+fetch floor (x+1)")


if __name__ == "__main__":
    main()
