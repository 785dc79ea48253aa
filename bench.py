"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol follows the reference's harness (musicgen/benchmarks/bench_mx.py:
warmup then timed steps). Current headline config: Stable-Diffusion-2.1-base
geometry txt2img, 256x256, 4 Euler steps, batch 1 (BASELINE.json configs[0])
with randomly initialized full-size weights — weight values don't affect
throughput. The reference publishes no numbers (BASELINE.md), so vs_baseline
is reported against the 1 image/sec anchor.

Run `python bench.py --config flux-schnell` for the Flux path (needs int8 or
a multi-chip mesh to fit the 12B model; falls back to a reduced-depth variant
that reports honest per-block step time — not the headline number).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compilation cache: first-compile of the big programs (12B
# flux denoise ~5 min, musicgen AR loop ~3 min through the tunnel) is paid
# once per workspace, not once per process (lives in-repo, gitignored, so it
# survives /tmp cleanup between driver rounds)
import pathlib as _pathlib

_cache = _pathlib.Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def bench_sd21(steps: int = 4, size: int = 256, batch: int = 1, repeats: int = 5):
    from flux_generator_tpu.models.clip.text import CLIPTextConfig, init_clip_text
    from flux_generator_tpu.models.sd.config import (
        AutoencoderConfig,
        DiffusionConfig,
        UNetConfig,
    )
    from flux_generator_tpu.models.sd.unet import init_unet
    from flux_generator_tpu.models.sd.vae import init_sd_vae
    from flux_generator_tpu.pipelines.sd import StableDiffusion

    # full-size SD 2.1-base geometry (sd/config.py defaults)
    unet_cfg = UNetConfig()
    ae_cfg = AutoencoderConfig()
    clip_cfg = CLIPTextConfig(num_layers=23, model_dims=1024, num_heads=16)
    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "unet": init_unet(ks[0], unet_cfg, dtype),
        "vae": init_sd_vae(ks[1], ae_cfg, dtype),
        "clip": init_clip_text(ks[2], clip_cfg, dtype),
    }
    pipe = StableDiffusion(
        "stable-diffusion-2-1-base", params, unet_cfg, ae_cfg, clip_cfg,
        DiffusionConfig(), dtype=dtype,
    )

    latent = size // 8
    cond = jax.random.normal(
        jax.random.PRNGKey(1), (2 * batch, 77, unet_cfg.cross_attention_dim[0]), dtype
    )
    from flux_generator_tpu.models.sd import sampler as smp

    key = jax.random.PRNGKey(2)
    x_T = smp.sample_prior(key, pipe.sigmas, (batch, latent, latent, 4), dtype)

    def one_image(seed_key):
        x = pipe.denoise(x_T, cond, steps, cfg_weight=7.5, seed_key=seed_key)
        # np.asarray forces a device→host fetch: on the axon tunnel
        # block_until_ready() returns before execution finishes, and the
        # serving path materializes pixels host-side anyway.
        return np.asarray(pipe.decode_u8(x))

    # warmup / compile
    one_image(jax.random.PRNGKey(3))

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        one_image(jax.random.PRNGKey(4 + i))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    ips = batch / p50

    # denoise-only MFU (VERDICT r3 #4: SD had raw numbers, no statement of
    # distance to the chip floor). FLOPs from XLA's own cost analysis of the
    # compiled CFG-batched denoise loop. Two accounting pitfalls fixed here
    # (both understated the r4 first-cut numbers by 4-6x):
    #   - XLA's cost_analysis() counts a lax.scan body ONCE regardless of
    #     trip count (verified empirically: 4- and 8-step scans report
    #     identical flops), so lower a 1-step program and multiply by steps;
    #   - a single depth's wall time includes dispatch + device->host fetch
    #     (tens of ms on the axon tunnel -- more than a whole SD step), so
    #     the honest per-step time is the marginal between two scan depths.
    def run_n(k, n):
        return np.asarray(pipe.denoise(x_T, cond, n, cfg_weight=7.5, seed_key=k))

    step_s, denoise_s = _marginal_step_s(run_n, steps, steps + 8, repeats)
    ts1 = jnp.asarray(smp.timesteps(pipe.sigmas, 1, None), jnp.float32)
    step_flops = _xla_flops(
        pipe._denoise, params["unet"], x_T, ts1, cond,
        jnp.asarray(7.5, jnp.float32), jax.random.PRNGKey(4),
        cfg_on=True,
    )
    out = {
        "metric": f"images/sec/chip (SD2.1-base {size}x{size}, {steps} steps, batch {batch})",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 1.0, 4),
        "p50_latency_s": round(p50, 4),
        "phase_denoise_s": round(denoise_s, 4),
    }
    if step_flops > 0:
        out["denoise_tflop"] = round(steps * step_flops / 1e12, 2)
        out["denoise_step_ms"] = round(step_s * 1e3, 2)
        out["denoise_mfu_pct"] = round(100 * step_flops / step_s / V5E_BF16_PEAK, 1)
        out["mfu_datapath"] = "bf16 (flops: xla 1-step cost analysis; time: marginal step)"
    return out


def _marginal_step_s(run_n, s1: int, s2: int, repeats: int):
    """(per-step seconds, wall time at s1 steps) by the delta-method: run the
    jitted denoise at two scan depths and take the marginal. The fixed
    dispatch + device->host fetch cost cancels between depths; dividing a
    single depth's wall time by its step count folds that fixed cost into
    every step and understates MFU (for SD-sized UNets the tunnel overhead
    exceeds a step)."""
    run_n(jax.random.PRNGKey(3), s1)
    run_n(jax.random.PRNGKey(3), s2)
    med = {}
    for n in (s1, s2):
        ts = []
        for i in range(repeats):
            t0 = time.perf_counter()
            run_n(jax.random.PRNGKey(4 + i), n)
            ts.append(time.perf_counter() - t0)
        med[n] = float(np.median(ts))
    return (med[s2] - med[s1]) / (s2 - s1), med[s1]


def _zeros_like_tree(tree_shape):
    # one jitted program for the whole tree: eager per-leaf zeros of int4
    # dtype trips a recursion bug in the axon plugin's scalar convert path
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree_shape)
    )()


def bench_flux_schnell(steps: int = 4, size: int = 512, batch: int = 1,
                       repeats: int = 3):
    """Full-geometry Flux-schnell (12B) with int8 weight-only quantization so
    it fits one 16 GB v5e chip; zero weights — TPU matmul timing is
    data-independent, so throughput is honest."""
    from flux_generator_tpu.models.flux.autoencoder import AutoEncoderConfig, init_autoencoder
    from flux_generator_tpu.models.flux.model import FluxConfig, init_flux
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import FluxPipeline

    cfg = FluxConfig()
    ae_cfg = AutoEncoderConfig()
    dtype = jnp.bfloat16

    # eval_shape THROUGH the quantizer so only int8 buffers ever materialize
    # (a bf16 zeros tree would transiently need 24 GB of HBM)
    flow_shape = jax.eval_shape(
        lambda: quantize_tree(init_flux(jax.random.PRNGKey(0), cfg, dtype))
    )
    flow = _zeros_like_tree(flow_shape)
    ae_shape = jax.eval_shape(
        lambda: init_autoencoder(jax.random.PRNGKey(0), ae_cfg, dtype)
    )
    ae = _zeros_like_tree(ae_shape)

    from flux_generator_tpu.models.clip.text import tiny_clip_config
    from flux_generator_tpu.models.t5.t5 import tiny_t5_config

    pipe = FluxPipeline(
        "flux-schnell", {"flow": flow, "ae": ae},
        cfg, ae_cfg, tiny_clip_config(), tiny_t5_config(), dtype=dtype,
    )

    h = w = size // 8
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, h, w, 16), dtype)
    x_t = pack_latents(x)
    x_ids = latent_ids(batch, h, w)
    txt = jax.random.normal(key, (batch, 256, cfg.context_in_dim), dtype)
    txt_ids = jnp.zeros((batch, 256, 3), jnp.int32)
    vec = jax.random.normal(key, (batch, cfg.vec_in_dim), dtype)

    def one_image():
        out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, steps, 4.0)
        return np.asarray(pipe.decode_u8(out, (h, w)))

    one_image()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        one_image()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    ips = batch / p50
    return {
        "metric": f"images/sec/chip (Flux-schnell int8 {size}x{size}, {steps} steps, batch {batch})",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        # north-star anchor: <1 s per 512^2 4-step image (BASELINE.md)
        "vs_baseline": round(ips / 1.0, 4),
        "p50_latency_s": round(p50, 4),
    }


V5E_BF16_PEAK = 197e12  # TPU v5e: ~197 TFLOP/s bf16 (394 TOPS int8)


def _xla_flops(jitted, *args, **kwargs) -> float:
    """Forward-pass FLOPs straight from XLA's cost analysis of the compiled
    executable — the honest accounting for conv-heavy models (SD/SDXL UNet)
    where hand-counting convs + attention at every resolution is error-prone.
    Slight over-count vs the analytic matmul-only numbers (elementwise FLOPs
    included), so MFU from this is a lower bound. Returns 0.0 when the
    backend exposes no cost model (MFU is then omitted, not faked).

    The lowering happens with the UNet's stacked-transformer-layer scan
    UNROLLED: cost_analysis counts a scan body once regardless of trip
    count, which under-counted SDXL (10 layers per scan at its deepest
    level) 2.4x — the r4 "20.4% MFU" was this artifact."""
    import flux_generator_tpu.models.sd.unet as _unet

    try:
        _unet._FLOP_COUNT_UNROLL = True
        # the jit trace cache may hold the ROLLED jaxpr from earlier timing
        # calls at these avals — drop it so the flag is read at a fresh trace
        if hasattr(jitted, "clear_cache"):
            jitted.clear_cache()
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0
    finally:
        _unet._FLOP_COUNT_UNROLL = False
        if hasattr(jitted, "clear_cache"):
            jitted.clear_cache()  # don't leave the unrolled trace behind


def _w8a8() -> bool:
    from flux_generator_tpu.ops.linear import w8a8_enabled

    return w8a8_enabled()


def flux_denoise_flops(cfg, l_img: int, l_txt: int) -> float:
    """Honest per-forward matmul FLOPs with per-matmul token counts
    (VERDICT r1 weak #3: 2·P·L over-counts — double-block txt matmuls see
    only l_txt tokens and img matmuls only l_img)."""
    h, mlp = cfg.hidden_size, cfg.mlp_hidden
    s = l_img + l_txt
    dbl = (
        2 * l_img * h * 3 * h + 2 * l_img * h * h + 4 * l_img * h * mlp
        + 2 * l_txt * h * 3 * h + 2 * l_txt * h * h + 4 * l_txt * h * mlp
        + 4 * s * s * h  # QK^T + AV over the concat sequence
    )
    sgl = 2 * s * h * (3 * h + mlp) + 2 * s * (h + mlp) * h + 4 * s * s * h
    return cfg.depth * dbl + cfg.depth_single_blocks * sgl


def _tunnel_floor_s(out_shape, out_dtype=jnp.uint8, repeats: int = 7):
    """Irreducible dispatch+fetch cost of one jitted call returning an array
    of the headline's output shape — the prof_t5_micro x+1 protocol. The
    axon tunnel adds ~30 ms dispatch + ~35 ms/MB fetch and VARIES between
    sessions (BENCH_RESULTS ±5% session drift); emitting this same-session
    floor next to the headline lets a real regression be told apart from a
    slow tunnel day: compare (p50 − tunnel_floor) across rounds, not p50."""
    x = jnp.zeros(out_shape, out_dtype)
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(x))  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _vs_prev_round(value: float):
    """Ratio of this run's headline value to the newest recorded
    BENCH_r{N}.json in the repo root (the driver writes one per round), so
    every headline line carries its own round-over-round delta."""
    import pathlib
    import re

    best = None
    for p in pathlib.Path(__file__).parent.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)", p.name)
        if not m:
            continue
        try:
            prev = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(prev, dict):
            continue
        # driver wrapper format: the result dict may be nested under
        # "parsed" (see PROGRESS.jsonl) or be the top-level object
        rec = prev.get("parsed", prev)
        v = rec.get("value")
        if isinstance(v, (int, float)) and v > 0:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, float(v))
    if best is None:
        return None, None
    return best[0], round(value / best[1], 4)


def bench_flux_e2e(steps: int = 4, size: int = 512, batch: int = 1,
                   repeats: int = 5, mesh: str = None):
    """FULL user path on one chip, everything the serving request does on
    device: T5-XXL (4.7B, int4 g=128) encode 256 tokens → CLIP-L (bf16)
    pooled → Flux-12B (int8 weight-only) 4-step denoise → VAE decode →
    host fetch. Round-1's headline excluded conditioning entirely
    (VERDICT.md weak #2); this is the honest number.

    Memory plan (16 GB v5e): flow int8 ≈ 12.0 GB + T5 int4 ≈ 2.5 GB +
    CLIP bf16 0.25 GB + VAE bf16 0.17 GB ≈ 14.9 GB resident; transient
    dequant buffers ≤ 90 MB. Host-side tokenization is synthetic fixed
    token arrays (no vocab files in this environment) — it is pure python
    dict lookups, well under 1 ms of the budget."""
    from flux_generator_tpu.io.registry import flux_configs
    from flux_generator_tpu.models.clip.text import init_clip_text
    from flux_generator_tpu.models.flux.autoencoder import init_autoencoder
    from flux_generator_tpu.models.flux.model import init_flux
    from flux_generator_tpu.models.t5.t5 import init_t5_encoder
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import FluxPipeline, latent_ids, pack_latents

    cfg, ae_cfg, clip_cfg, t5_cfg = flux_configs("flux-schnell")
    dtype = jnp.bfloat16

    # eval_shape THROUGH the quantizers so only the quantized buffers ever
    # materialize (bf16 trees would transiently need 24 + 9.5 GB)
    flow = _zeros_like_tree(jax.eval_shape(
        lambda: quantize_tree(init_flux(jax.random.PRNGKey(0), cfg, dtype))
    ))
    # nibble-packed int4 (uint8 buffers): native-S4 arrays cannot be
    # device_put by the axon plugin (relayout recursion bug)
    t5 = _zeros_like_tree(jax.eval_shape(
        lambda: quantize_tree(
            init_t5_encoder(jax.random.PRNGKey(0), t5_cfg, dtype),
            bits=4, group_size=128, pack=True,
        )
    ))
    clip = _zeros_like_tree(jax.eval_shape(
        lambda: init_clip_text(jax.random.PRNGKey(0), clip_cfg, dtype)
    ))
    ae = _zeros_like_tree(jax.eval_shape(
        lambda: init_autoencoder(jax.random.PRNGKey(0), ae_cfg, dtype)
    ))

    pipe = FluxPipeline(
        "flux-schnell", {"flow": flow, "ae": ae, "clip": clip, "t5": t5},
        cfg, ae_cfg, clip_cfg, t5_cfg, dtype=dtype,
    )

    n_chips = 1
    if mesh:
        # --mesh DxM: the exact multi-chip serving invocation — tensor-
        # parallel flow/T5 over "model", batch over "data". Validated on a
        # virtual CPU mesh by dryrun_multichip(_dryrun_tp_serving); runs
        # unchanged on a real v5e-8 (data=1, model=8 → `--mesh 1x8`).
        from flux_generator_tpu.parallel.mesh import create_mesh

        d, m = (int(x) for x in mesh.lower().split("x"))
        n_chips = d * m
        if n_chips > len(jax.devices()):
            raise SystemExit(
                f"--mesh {mesh} needs {n_chips} devices, "
                f"have {len(jax.devices())}"
            )
        pipe.shard(create_mesh(data=d, model=m))
        batch = max(batch, d)  # at least one image per data shard

    h = w = size // 8
    key = jax.random.PRNGKey(0)
    x_t = pack_latents(jax.random.normal(key, (batch, h, w, 16), dtype))
    x_ids = latent_ids(batch, h, w)
    t5_tokens = jnp.ones((1, 256), jnp.int32)   # schnell t5 padding 256
    clip_tokens = jnp.ones((1, 77), jnp.int32)

    def one_image():
        txt, txt_ids, vec = pipe.prepare_conditioning(batch, t5_tokens, clip_tokens)
        out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, steps, 4.0)
        return np.asarray(pipe.decode_u8(out, (h, w)))

    one_image()  # compile all three programs
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        one_image()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    # same-session tunnel calibration (see _tunnel_floor_s): one dispatch +
    # one fetch of exactly the headline's output array
    tunnel_s = _tunnel_floor_s((batch, size, size, 3))

    # phase itemization: each phase timed separately WITH its own device→host
    # fetch (block_until_ready does not sync through the axon tunnel), so the
    # itemized sum over-counts the e2e by ~2 extra fetches (~25-30 ms each)
    def timed(fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    cond_s = timed(lambda: [np.asarray(a) for a in
                            pipe.prepare_conditioning(batch, t5_tokens, clip_tokens)[::2]])
    txt, txt_ids, vec = pipe.prepare_conditioning(batch, t5_tokens, clip_tokens)
    denoise_s = timed(lambda: np.asarray(
        pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, steps, 4.0)))
    out = pipe.denoise_latents(x_t, x_ids, txt, txt_ids, vec, steps, 4.0)
    decode_s = timed(lambda: np.asarray(pipe.decode_u8(out, (h, w))))

    # ONE-program path: conditioning + denoise + uint8 decode fused into a
    # single executable (no inter-program dispatch through the tunnel)
    def one_fused():
        return np.asarray(pipe._e2e(
            pipe.params, (t5_tokens, clip_tokens), jax.random.PRNGKey(0),
            jnp.asarray(4.0, dtype), steps, h, w,
        ))

    one_fused()  # compile
    fused_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        one_fused()
        fused_times.append(time.perf_counter() - t0)
    fused_p50 = float(np.median(fused_times))

    from flux_generator_tpu.runtime.profiling import peak_memory_gb

    # headline = best serving path, and the metric string names which one
    # won (the per-phase numbers below describe the three-program path only)
    winner = "fused one-program" if fused_p50 < p50 else "three-program"
    p50 = min(p50, fused_p50)
    ips = batch / p50 / n_chips
    chips = f"mesh {mesh}" if mesh else "one chip"
    return {
        "metric": (
            f"images/sec/chip (Flux-schnell END-TO-END {size}x{size}, {steps} steps: "
            f"T5-XXL int4 + CLIP-L + 12B flow int8 + VAE, {chips}, {winner} path)"
        ),
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        # north-star anchor: < 1 s per 512^2 4-step image end-to-end
        "vs_baseline": round(ips / 1.0, 4),
        "p50_latency_s": round(p50, 4),
        "p50_fused_one_program_s": round(fused_p50, 4),
        # calibration block: raw repeat times (spread = session noise), the
        # same-shape dispatch+fetch floor, and the floor-subtracted latency —
        # the cross-round comparable number (tunnel cost varies ±5%/session)
        "e2e_runs_s": [round(t, 4) for t in sorted(times)],
        "fused_runs_s": [round(t, 4) for t in sorted(fused_times)],
        "tunnel_floor_s": round(tunnel_s, 4),
        "p50_minus_tunnel_s": round(p50 - tunnel_s, 4),
        "phase_conditioning_s": round(cond_s, 4),
        "phase_denoise_s": round(denoise_s, 4),
        "phase_decode_s": round(decode_s, 4),
        "resident_hbm_gb": round(peak_memory_gb(), 2),
        "denoise_tflop": round(
            batch * steps * flux_denoise_flops(cfg, (h // 2) * (w // 2), 256) / 1e12, 2
        ),
        # MFU against the peak of the datapath actually used: bf16 matmuls
        # (197 TFLOP/s) or, under FGT_W8A8, int8 MXU ops (394 TOPS)
        "denoise_mfu_pct": round(
            100 * batch * steps * flux_denoise_flops(cfg, (h // 2) * (w // 2), 256)
            / denoise_s / (2 * V5E_BF16_PEAK if _w8a8() else V5E_BF16_PEAK), 1,
        ),
        "mfu_datapath": "int8-mxu" if _w8a8() else "bf16",
    }


def bench_sdxl_turbo(size: int = 512, repeats: int = 5, batch: int = 1):
    """SDXL-Turbo geometry: 1 Euler-ancestral step, no CFG (BASELINE.json
    configs[1]). Full-size UNet (2.6B): block_out (320,640,1280),
    transformer_layers (1,2,10), cross-attn 2048, text_time conditioning.
    --batch N measures the coalesced-serving shape (N concurrent 1-step
    requests in one UNet batch — VERDICT r4 next #3: set the SDXL coalescer
    ladder from measurement, not the SD2.1 numbers)."""
    from flux_generator_tpu.models.sd import sampler as smp
    from flux_generator_tpu.models.sd.config import (
        AutoencoderConfig,
        DiffusionConfig,
        UNetConfig,
    )
    from flux_generator_tpu.models.sd.unet import init_unet
    from flux_generator_tpu.models.sd.vae import init_sd_vae
    from flux_generator_tpu.pipelines.sd import StableDiffusionXL

    unet_cfg = UNetConfig(
        block_out_channels=(320, 640, 1280),
        layers_per_block=(2, 2, 2),
        transformer_layers_per_block=(1, 2, 10),
        num_attention_heads=(5, 10, 20),
        cross_attention_dim=(2048, 2048, 2048),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        addition_embed_type="text_time",
        addition_time_embed_dim=256,
        projection_class_embeddings_input_dim=2816,
    )
    ae_cfg = AutoencoderConfig()
    dtype = jnp.bfloat16
    unet_shape = jax.eval_shape(lambda: init_unet(jax.random.PRNGKey(0), unet_cfg, dtype))
    vae_shape = jax.eval_shape(lambda: init_sd_vae(jax.random.PRNGKey(0), ae_cfg, dtype))
    params = {
        "unet": _zeros_like_tree(unet_shape),
        "vae": _zeros_like_tree(vae_shape),
    }
    from flux_generator_tpu.models.clip.text import tiny_clip_config

    pipe = StableDiffusionXL(
        "stabilityai/sdxl-turbo", params, unet_cfg, ae_cfg,
        [tiny_clip_config()], DiffusionConfig(), dtype=dtype,
    )
    latent = size // 8
    cond = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, 2048), dtype)
    pooled = jax.random.normal(jax.random.PRNGKey(2), (batch, 1280), dtype)
    text_time = (pooled, jnp.broadcast_to(
        jnp.array([[512, 512, 0, 0, 512, 512.0]]), (batch, 6)))
    x_T = smp.sample_prior(
        jax.random.PRNGKey(3), pipe.sigmas, (batch, latent, latent, 4), dtype)

    def one(key):
        x = pipe.denoise(x_T, cond, 1, cfg_weight=0.0, seed_key=key,
                         text_time=text_time)
        return np.asarray(pipe.decode_u8(x))

    one(jax.random.PRNGKey(4))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        one(jax.random.PRNGKey(5 + i))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    # per-step MFU: marginal step time between 1- and 9-step depths (the
    # fixed dispatch + tunnel-fetch cost cancels; see _marginal_step_s), and
    # per-step flops from a 1-step lowering (XLA cost_analysis counts a
    # lax.scan body once regardless of trip count).
    def run_n(k, n):
        return np.asarray(pipe.denoise(x_T, cond, n, cfg_weight=0.0, seed_key=k,
                                       text_time=text_time))

    step_s, denoise_s = _marginal_step_s(run_n, 1, 9, repeats)
    ts_arr = jnp.asarray(smp.timesteps(pipe.sigmas, 1, None), jnp.float32)
    flops = _xla_flops(
        pipe._denoise, params["unet"], x_T, ts_arr, cond,
        jnp.asarray(0.0, jnp.float32), jax.random.PRNGKey(5),
        cfg_on=False, text_time=text_time,
    )
    out = {
        "metric": (f"images/sec/chip (SDXL-Turbo {size}x{size}, 1 step, "
                   f"no CFG, batch {batch})"),
        "value": round(batch / p50, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(batch / p50, 4),
        "p50_latency_s": round(p50, 4),
        "phase_denoise_s": round(denoise_s, 4),
    }
    if flops > 0:
        out["denoise_tflop"] = round(flops / 1e12, 2)
        out["denoise_step_ms"] = round(step_s * 1e3, 2)
        out["denoise_step_ms_per_sample"] = round(step_s * 1e3 / batch, 2)
        out["denoise_mfu_pct"] = round(100 * flops / step_s / V5E_BF16_PEAK, 1)
        out["mfu_datapath"] = "bf16 (flops: xla 1-step cost analysis; time: marginal step)"
    return out


def bench_musicgen(max_steps: int = 50, repeats: int = 3, quantize: bool = False,
                   bits: int = 8, batch: int = 1):
    """MusicGen-medium geometry AR decode: audio-sec/sec (50 Hz frames) and
    ms/step (the reference's bench_mx.py protocol). Zero weights, honest
    shapes: 48 layers, hidden 1536, batch 2 (CFG). The AR loop is HBM-bound
    (every step re-reads all decoder weights), so quantize=True cuts step
    time roughly with the weight bytes: int8 halves bf16; bits=4 (nibble-
    packed, grouped scales) halves again."""
    from flux_generator_tpu.models.musicgen import model as mg
    from flux_generator_tpu.ops.quant import quantize_tree

    cfg = mg.MusicGenConfig()
    dtype = jnp.bfloat16
    if quantize:
        kw = dict(bits=bits, group_size=64, pack=True) if bits == 4 else dict(bits=8)
        shape = jax.eval_shape(
            lambda: quantize_tree(
                mg.init_musicgen(jax.random.PRNGKey(0), cfg, dtype), **kw
            )
        )
    else:
        shape = jax.eval_shape(
            lambda: mg.init_musicgen(jax.random.PRNGKey(0), cfg, dtype)
        )
    params = _zeros_like_tree(shape)
    cond = jnp.zeros((batch, 12, cfg.hidden_size), dtype)

    gen = jax.jit(
        lambda p, c, key: mg.generate(p, cfg, c, max_steps, 250, 1.0, 3.0, key)
    )
    np.asarray(gen(params, cond, jax.random.PRNGKey(0)))  # compile
    # the AR-only metric wants pure ms/step: subtract the tunnel's
    # device->host fetch cost (measured, VARIES per session — ~30 ms would
    # otherwise inflate a 50-step run by ~0.6 ms/step)
    fetch_fn = jax.jit(lambda v: v.astype(jnp.float32).sum())
    z = jnp.ones((8, 8), jnp.bfloat16)
    float(fetch_fn(z))
    fts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(fetch_fn(z))
        fts.append(time.perf_counter() - t0)
    fetch = float(np.median(fts))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        np.asarray(gen(params, cond, jax.random.PRNGKey(i)))
        times.append(time.perf_counter() - t0)
    p50 = max(float(np.median(times)) - fetch, 1e-6)
    audio_sec = batch * max_steps / 50.0  # 50 Hz frames (32kHz / hop 640)
    return {
        "metric": (f"MusicGen-medium audio-sec/sec ({max_steps} AR steps, "
                   f"{batch} sample(s) per loop, CFG batch {2 * batch})"),
        "value": round(audio_sec / p50, 4),
        "unit": "audio-sec/sec",
        "vs_baseline": round((audio_sec / p50) / 2.0, 4),  # ≥2x realtime target
        "ms_per_step": round(p50 * 1000 / max_steps, 3),
    }


def bench_musicgen_e2e(max_steps: int = 200, repeats: int = 3,
                       quantize: bool = True, bits: int = 8):
    """FULL MusicGen user path, everything a /api/music request runs:
    T5-base encode of the prompt tokens → projection into the decoder width →
    delay-pattern AR loop (CFG batch 2, int8 decoder weights by default — the
    serving quantize knob) → delay undo → EnCodec decode to a 32 kHz waveform
    → host fetch. The `musicgen` config times the AR loop only; this is the
    honest end-to-end audio-sec/sec."""
    from flux_generator_tpu.models.musicgen import model as mg
    from flux_generator_tpu.models.musicgen.encodec import (
        EncodecConfig, EncodecModel, init_encodec,
    )
    from flux_generator_tpu.models.t5.t5 import T5Config, init_t5_encoder, t5_encode
    from flux_generator_tpu.ops.quant import quantize_tree

    cfg = mg.MusicGenConfig()
    # musicgen-medium conditions on t5-base: relu FFN, tied embeddings
    t5_cfg = T5Config(num_layers=12, num_heads=12, d_kv=64, d_model=768,
                      d_ff=3072, feed_forward_proj="relu",
                      tie_word_embeddings=True)
    dtype = jnp.bfloat16

    if quantize:
        kw = dict(bits=bits, group_size=64, pack=True) if bits == 4 else dict(bits=8)
        dec_shape = jax.eval_shape(
            lambda: quantize_tree(mg.init_musicgen(jax.random.PRNGKey(0), cfg, dtype), **kw)
        )
    else:
        dec_shape = jax.eval_shape(lambda: mg.init_musicgen(jax.random.PRNGKey(0), cfg, dtype))
    params = _zeros_like_tree(dec_shape)
    t5 = _zeros_like_tree(jax.eval_shape(
        lambda: init_t5_encoder(jax.random.PRNGKey(1), t5_cfg, dtype)))
    enc_cfg = EncodecConfig()
    codec = EncodecModel(enc_cfg, _zeros_like_tree(jax.eval_shape(
        lambda: init_encodec(jax.random.PRNGKey(2), enc_cfg, jnp.float32))))

    toks = jnp.ones((1, 12), jnp.int32)
    cond_fn = jax.jit(lambda tp, p, t: mg.condition_text(
        p, t5_encode(tp, t5_cfg, t).astype(dtype)))
    gen = jax.jit(
        lambda p, c, key: mg.generate(p, cfg, c, max_steps, 250, 1.0, 3.0, key)
    )
    want = max_steps - cfg.num_codebooks + 1

    def one(i):
        cond = cond_fn(t5, params, toks)
        codes = gen(params, cond, jax.random.PRNGKey(i))
        audio = codec.decode(codes[:, :, :want][None], [None])
        return np.asarray(audio)

    one(0)  # compile
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        one(1 + i)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio_sec = want / float(enc_cfg.frame_rate)
    return {
        "metric": (
            f"MusicGen-medium END-TO-END audio-sec/sec ({max_steps} AR steps: "
            f"T5-base + decoder{' int8' if quantize else ''} + EnCodec decode + fetch)"
        ),
        "value": round(audio_sec / p50, 4),
        "unit": "audio-sec/sec",
        "vs_baseline": round((audio_sec / p50) / 2.0, 4),  # ≥2x realtime target
        "p50_latency_s": round(p50, 4),
        "audio_seconds": round(audio_sec, 2),
    }


def bench_musicgen_coalesced(max_steps: int = 200, repeats: int = 3,
                             quantize: bool = True, n_requests: int = 2):
    """Cross-user music coalescing (VERDICT r4 next #2): n concurrent
    requests with DIFFERENT prompt lengths run in ONE batched AR loop
    (per-request cross-attention length masks + per-sample seeds), timed
    against serving them sequentially — the reference's one-at-a-time loop
    (musicgen/musicgen.py:249-304) is the sequential shape. Reports the
    aggregate audio-sec/sec of the coalesced batch; the sequential baseline
    and speedup ride along in the JSON."""
    from flux_generator_tpu.models.musicgen import model as mg
    from flux_generator_tpu.models.musicgen.encodec import (
        EncodecConfig, EncodecModel, init_encodec,
    )
    from flux_generator_tpu.models.t5.t5 import T5Config, init_t5_encoder, t5_encode
    from flux_generator_tpu.ops.quant import quantize_tree

    cfg = mg.MusicGenConfig()
    t5_cfg = T5Config(num_layers=12, num_heads=12, d_kv=64, d_model=768,
                      d_ff=3072, feed_forward_proj="relu",
                      tie_word_embeddings=True)
    dtype = jnp.bfloat16
    if quantize:
        dec_shape = jax.eval_shape(lambda: quantize_tree(
            mg.init_musicgen(jax.random.PRNGKey(0), cfg, dtype), bits=8))
    else:
        dec_shape = jax.eval_shape(
            lambda: mg.init_musicgen(jax.random.PRNGKey(0), cfg, dtype))
    params = _zeros_like_tree(dec_shape)
    t5 = _zeros_like_tree(jax.eval_shape(
        lambda: init_t5_encoder(jax.random.PRNGKey(1), t5_cfg, dtype)))
    enc_cfg = EncodecConfig()
    codec = EncodecModel(enc_cfg, _zeros_like_tree(jax.eval_shape(
        lambda: init_encodec(jax.random.PRNGKey(2), enc_cfg, jnp.float32))))

    cond_fn = jax.jit(lambda tp, p, t: mg.condition_text(
        p, t5_encode(tp, t5_cfg, t).astype(dtype)))
    # heterogeneous prompts: 12- and 6-token conditioning, one 16-token
    # S bucket (the pipeline's _next_pow2_bucket ladder)
    tok_lens = [12, 6, 9, 4][:n_requests]
    s_bucket = 16
    conds = [cond_fn(t5, params, jnp.ones((1, s), jnp.int32))
             for s in tok_lens]
    cond = jnp.zeros((n_requests, s_bucket, cfg.hidden_size), dtype)
    for i, c in enumerate(conds):
        cond = cond.at[i, : c.shape[1]].set(c[0])
    cond_len = jnp.array(tok_lens, jnp.int32)
    keys = jnp.stack([jax.random.PRNGKey(10 + i) for i in range(n_requests)])
    live = jnp.full((n_requests,), max_steps, jnp.int32)

    gen_multi = jax.jit(lambda p, c, cl, ks, lv: mg.generate(
        p, cfg, c, max_steps, 250, 1.0, 3.0,
        live_steps=lv, cond_len=cl, keys=ks))
    gen_solo = jax.jit(lambda p, c, key: mg.generate(
        p, cfg, c, max_steps, 250, 1.0, 3.0, key))
    want = max_steps - cfg.num_codebooks + 1

    def coalesced():
        codes = gen_multi(params, cond, cond_len, keys, live)
        return [np.asarray(codec.decode(
            codes[i : i + 1, :, :want][None], [None]))
            for i in range(n_requests)]

    def sequential():
        outs = []
        for i, c in enumerate(conds):
            codes = gen_solo(params, c, jax.random.PRNGKey(10 + i))
            outs.append(np.asarray(codec.decode(
                codes[:, :, :want][None], [None])))
        return outs

    coalesced(), sequential()  # compile both
    co_ts, seq_ts = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        coalesced()
        co_ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sequential()
        seq_ts.append(time.perf_counter() - t0)
    co, seq = float(np.median(co_ts)), float(np.median(seq_ts))
    audio_sec = n_requests * want / float(enc_cfg.frame_rate)
    return {
        "metric": (
            f"aggregate audio-sec/sec ({n_requests} COALESCED user requests, "
            f"{max_steps} AR steps each, heterogeneous prompt lengths "
            f"{tok_lens}, decoder{' int8' if quantize else ''} + EnCodec)"
        ),
        "value": round(audio_sec / co, 4),
        "unit": "audio-sec/sec",
        "vs_baseline": round(seq / co, 4),  # speedup vs sequential serving
        "coalesced_s": round(co, 4),
        "sequential_s": round(seq, 4),
        "sequential_audio_sec_per_sec": round(audio_sec / seq, 4),
    }


def bench_dreambooth(size: int = 512, batch: int = 1, repeats: int = 5,
                     lora_rank: int = 8, grad_accumulate: int = 4):
    """Driver-visible TRAINING benchmark (VERDICT r3 #3): the real DreamBooth
    train step — full-geometry 12B flux-schnell, int8-quantized frozen base,
    bf16 LoRA rank-8 adapters, flow-matching loss with per-block remat,
    differentiable flash-attention — exactly what `fgt-dreambooth
    --quantize-base` runs per iteration (training/dreambooth.py
    make_train_step; ref protocol: dreambooth.py:271-279 prints it/s +
    peak-mem as first-class output). Times BOTH compiled variants: the
    optimizer step (is_first+should_step, what a grad_accumulate=1 run does
    every iteration) and the accumulate-only step."""
    from flux_generator_tpu.io.registry import flux_configs
    from flux_generator_tpu.models.flux.model import init_flux
    from flux_generator_tpu.ops.quant import quantize_tree
    from flux_generator_tpu.pipelines.flux import FluxPipeline
    from flux_generator_tpu.training.dreambooth import build_optimizer, make_train_step
    from flux_generator_tpu.training.lora import apply_lora_to_flux, extract_lora

    cfg, ae_cfg, clip_cfg, t5_cfg = flux_configs("flux-schnell")
    dtype = jnp.bfloat16
    # eval_shape through LoRA-inject + int8-quantize so only the quantized
    # base + bf16 adapters ever materialize (same order as dreambooth.train)
    flow = _zeros_like_tree(jax.eval_shape(
        lambda: quantize_tree(apply_lora_to_flux(
            init_flux(jax.random.PRNGKey(0), cfg, dtype),
            rank=lora_rank, key=jax.random.PRNGKey(1),
        ))
    ))
    pipe = FluxPipeline(
        "flux-schnell", {"flow": flow}, cfg, ae_cfg, clip_cfg, t5_cfg,
        dtype=dtype,
    )

    lora = extract_lora(flow)
    optimizer = build_optimizer(1e-4, 100, 600)
    opt_state = optimizer.init(lora)
    accum = jax.tree.map(jnp.zeros_like, lora)
    step_fn = make_train_step(pipe, optimizer, flow, grad_accumulate)

    h = w = size // 8
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (batch, h, w, 16), dtype)
    t5f = jax.random.normal(key, (batch, 256, cfg.context_in_dim), dtype)
    clipf = jax.random.normal(key, (batch, cfg.vec_in_dim), dtype)
    guidance = (jnp.full((batch,), 3.0, dtype) if cfg.guidance_embed else None)

    def one_step(i, is_first, should_step):
        loss, lora2, opt2, acc2 = step_fn(
            lora, opt_state, accum, jax.random.fold_in(key, i),
            x0, t5f, clipf, guidance,
            is_first=is_first, should_step=should_step,
        )
        return float(np.asarray(loss))

    def timed_variant(is_first, should_step):
        one_step(0, is_first, should_step)  # compile
        ts = []
        for i in range(repeats):
            t0 = time.perf_counter()
            one_step(1 + i, is_first, should_step)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    step_s = timed_variant(True, True)       # grad + adam update
    accum_s = timed_variant(False, False)    # grad + accumulate only

    from flux_generator_tpu.runtime.profiling import peak_memory_gb

    # training-step FLOP accounting (VERDICT r4 #6): hand count, same source
    # as the inference MFU (flux_denoise_flops = one model call per sample).
    # Convention: model flops = fwd + bwd = 3x fwd (bwd does 2 matmuls per
    # fwd matmul); the per-block remat policy re-executes each block's fwd
    # during bwd, so the HARDWARE executes ~4x fwd — both reported, MFU uses
    # the hardware count (that's what the MXU actually ran; matmuls are bf16
    # — int8 base is weight-only, dequant fuses into the read).
    fwd_tflop = batch * flux_denoise_flops(cfg, (h // 2) * (w // 2), 256) / 1e12
    model_tflop = 3.0 * fwd_tflop
    hw_tflop = 4.0 * fwd_tflop
    return {
        "metric": (f"train it/s (DreamBooth 12B flux-schnell LoRA r{lora_rank} "
                   f"{size}x{size} batch {batch}, int8 frozen base, one chip)"),
        "value": round(1.0 / step_s, 4),
        "unit": "iterations/sec",
        # north star: the r2-claimed 485 ms/step (BENCH_RESULTS.md)
        "vs_baseline": round((1.0 / step_s) / (1.0 / 0.485), 4),
        "step_ms": round(step_s * 1000, 1),
        "accum_only_step_ms": round(accum_s * 1000, 1),
        "peak_hbm_gb": round(peak_memory_gb(), 2),
        "step_tflop_model": round(model_tflop, 2),
        "step_tflop_hw": round(hw_tflop, 2),
        "step_mfu_pct": round(
            100 * hw_tflop * 1e12 / step_s / V5E_BF16_PEAK, 1),
        "step_mfu_model_pct": round(
            100 * model_tflop * 1e12 / step_s / V5E_BF16_PEAK, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flux-schnell",
                    choices=["sd21", "flux-schnell", "flux-denoise", "musicgen",
                             "musicgen-e2e", "musicgen-coalesce", "sdxl-turbo",
                             "dreambooth"])
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--mesh", default=None, metavar="DxM",
                    help="multi-chip serving mesh for the flux-schnell "
                         "config, e.g. 1x8 = tensor-parallel over 8 chips "
                         "(data axis x model axis); needs DxM real devices")
    args = ap.parse_args()

    def run(config):
        if config == "flux-schnell":
            # headline: the FULL user path incl. text conditioning
            return bench_flux_e2e(steps=args.steps, size=args.size or 512,
                                  batch=args.batch, mesh=args.mesh)
        if config == "flux-denoise":
            return bench_flux_schnell(steps=args.steps, size=args.size or 512,
                                      batch=args.batch)
        if config == "musicgen":
            import os

            return bench_musicgen(
                max_steps=args.steps if args.steps != 4 else 50,
                quantize=os.environ.get("FGT_QUANTIZE", "0") == "1",
                bits=int(os.environ.get("FGT_QUANTIZE_BITS", "8")),
                batch=args.batch,
            )
        if config == "musicgen-e2e":
            import os

            return bench_musicgen_e2e(
                max_steps=args.steps if args.steps != 4 else 200,
                quantize=os.environ.get("FGT_QUANTIZE", "1") == "1",
                bits=int(os.environ.get("FGT_QUANTIZE_BITS", "8")),
            )
        if config == "musicgen-coalesce":
            import os

            return bench_musicgen_coalesced(
                max_steps=args.steps if args.steps != 4 else 200,
                quantize=os.environ.get("FGT_QUANTIZE", "1") == "1",
                n_requests=max(2, args.batch),
            )
        if config == "sdxl-turbo":
            return bench_sdxl_turbo(size=args.size or 512, batch=args.batch)
        if config == "dreambooth":
            return bench_dreambooth(size=args.size or 512, batch=args.batch)
        return bench_sd21(steps=args.steps, size=args.size or 256,
                          batch=args.batch)

    # fallback chain so the driver always gets a line. Each attempt runs in a
    # fresh SUBPROCESS: an OOM'd attempt otherwise keeps its 12+ GB param tree
    # alive via the exception traceback, starving every later attempt.
    chain = {
        "flux-schnell": ["flux-denoise", "sd21"],
        "flux-denoise": ["sd21"],
    }.get(args.config, [])
    try:
        result = run(args.config)
    except Exception:
        import subprocess
        import sys
        import traceback

        traceback.print_exc()
        result = None
        for fb in chain:
            proc = subprocess.run(
                [sys.executable, __file__, "--config", fb],
                capture_output=True, text=True, timeout=3600,
            )
            sys.stderr.write(proc.stderr[-2000:])
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    result = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if result is not None:
                break
        if result is None:
            raise
    if args.config == "flux-schnell" and "vs_prev_round" not in result:
        prev_round, ratio = _vs_prev_round(result["value"])
        if ratio is not None:
            result["vs_prev_round"] = ratio
            result["prev_round"] = prev_round
    print(json.dumps(result))


if __name__ == "__main__":
    main()
