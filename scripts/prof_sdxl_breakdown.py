#!/usr/bin/env python3
"""SDXL-Turbo 1024² per-component Δ-stub breakdown (NOTES round-5 item 2).

The MFU study left SDXL at 20.4% MFU / ~64 ms per UNet step with attention
Δ-stub = 20.4 ms and "uniform ~37 TF/s" as the open diagnosis. Standalone
microbenches are NOT representative here (a chained attention call floors
at ~0.6 ms of layout cost the real program fuses away — measured,
scripts/prof_sdxl_attn.py), so this measures IN-PROGRAM marginal cost of
each component class by stubbing it out of the real denoise step and
Δ-timing against base (same median-of-depth-Δs protocol as prof_sd_mfu).

Components:
  attn-math    self+cross attention math -> identity on q (projections stay)
  attn-block   whole attention sublayers (norm+qkvo+math) -> identity
  ffn          norm3 + GEGLU 3-matmul FFN -> identity
  transformer  whole _transformer2d (incl. proj_in/out, GN) -> identity
  resnet-convs the two 3x3 convs in every resnet -> identity (norms/temb stay)

Ref anchor: /root/reference/stable_diffusion/stable_diffusion/unet.py
(Transformer blocks 403-460, ResnetBlock2D 339-377).

Usage: python scripts/prof_sdxl_breakdown.py [--sd] [size]
"""

import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)

import prof_sd_mfu  # noqa: E402
from prof_sd_mfu import build_pipe, step_time  # noqa: E402

import flux_generator_tpu.models.sd.unet as unet_mod  # noqa: E402
from flux_generator_tpu.ops.linear import dense  # noqa: E402
from flux_generator_tpu.ops.norms import layer_norm  # noqa: E402

import jax.numpy as jnp  # noqa: E402

_REAL = {
    n: getattr(unet_mod, n)
    for n in ("_self_attention", "dot_product_attention",
              "_transformer_block", "_transformer2d", "_resnet")
}


def _restore():
    for n, f in _REAL.items():
        setattr(unet_mod, n, f)


def _tb_variant(stub_attn_block=False, stub_ffn=False):
    def _transformer_block(p, x, memory, num_heads):
        b, l, d = x.shape
        if not stub_attn_block:
            y = layer_norm(x, p["norm1"])
            q = dense(p["attn1"]["q"], y).reshape(b, l, num_heads, -1)
            k = dense(p["attn1"]["k"], y).reshape(b, l, num_heads, -1)
            v = dense(p["attn1"]["v"], y).reshape(b, l, num_heads, -1)
            x = x + dense(p["attn1"]["o"],
                          unet_mod._self_attention(q, k, v).reshape(b, l, d))
            y = layer_norm(x, p["norm2"])
            s = memory.shape[1]
            q = dense(p["attn2"]["q"], y).reshape(b, l, num_heads, -1)
            k = dense(p["attn2"]["k"], memory).reshape(b, s, num_heads, -1)
            v = dense(p["attn2"]["v"], memory).reshape(b, s, num_heads, -1)
            x = x + dense(
                p["attn2"]["o"],
                unet_mod.dot_product_attention(q, k, v).reshape(b, l, d))
        if not stub_ffn:
            y = layer_norm(x, p["norm3"])
            y = dense(p["linear1"], y) * jax.nn.gelu(
                dense(p["linear2"], y), approximate=False)
            x = x + dense(p["linear3"], y)
        return x
    return _transformer_block


def _resnet_convfree(p, x, temb, groups):
    # keep norms/act/temb (shape-preserving); drop ONLY the two 3x3 convs.
    # Channel-changing resnets still need the shortcut projection AND a
    # channel map for y — reuse conv_shortcut weights for both (the point
    # is removing the 3x3 conv FLOPs/weights, not numeric fidelity).
    from flux_generator_tpu.ops.norms import group_norm
    y = jax.nn.silu(group_norm(x, p["norm1"], groups))
    if "conv_shortcut" in p:
        y = dense(p["conv_shortcut"], y)
    if temb is not None and "time_emb_proj" in p:
        y = y + dense(p["time_emb_proj"], jax.nn.silu(temb))[:, None, None, :]
    y = jax.nn.silu(group_norm(y, p["norm2"], groups))
    if "conv_shortcut" in p:
        x = dense(p["conv_shortcut"], x)
    return x + y


VARIANTS = [
    ("attn-math", lambda: (
        setattr(unet_mod, "_self_attention", lambda q, k, v: q),
        setattr(unet_mod, "dot_product_attention", lambda q, k, v, **kw: q))),
    ("attn-block", lambda: setattr(
        unet_mod, "_transformer_block", _tb_variant(stub_attn_block=True))),
    ("ffn", lambda: setattr(
        unet_mod, "_transformer_block", _tb_variant(stub_ffn=True))),
    ("transformer", lambda: setattr(
        unet_mod, "_transformer2d", lambda p, x, m, nh, g: x)),
    ("resnet-convs", lambda: setattr(unet_mod, "_resnet", _resnet_convfree)),
]


def main():
    if "--sd" not in sys.argv:
        prof_sd_mfu.SDXL = True
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size = int(args[0]) if args else (512 if "--sd" in sys.argv else 1024)
    batch = 2 if "--sd" in sys.argv else 1
    label = "SD2.1 CFG-batch-2" if "--sd" in sys.argv else "SDXL-Turbo batch-1"
    print(f"== per-component Δ-stub, {label} {size}² ==")
    base = step_time(build_pipe(), size, batch)
    print(f"  base step: {base:7.2f} ms")
    for name, patch in VARIANTS:
        _restore()
        patch()
        t = step_time(build_pipe(), size, batch)
        print(f"  -{name:<13} {t:7.2f} ms  -> Δ {base - t:6.2f} ms "
              f"({100 * (base - t) / base:4.1f}% of step)", flush=True)
    _restore()


if __name__ == "__main__":
    main()
