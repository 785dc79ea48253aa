import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.models.musicgen import model as mg
from flux_generator_tpu.models.musicgen.encodec import (
    EncodecModel,
    encoder_spec,
    decoder_spec,
    lstm_forward,
    preprocess_audio,
    rvq_decode,
    rvq_encode,
    tiny_encodec_config,
)
from flux_generator_tpu.pipelines.musicgen import MusicGenPipeline


# ------------------------------------------------------------ encodec


@pytest.fixture(scope="module")
def codec():
    return EncodecModel.random_init()


def test_encodec_specs_shapes():
    cfg = tiny_encodec_config()
    enc = encoder_spec(cfg)
    dec = decoder_spec(cfg)
    assert enc[0][0] == "conv" and dec[-1][0] == "conv"
    assert any(e[0] == "lstm" for e in enc)
    assert any(e[0] == "convtr" for e in dec)


def test_encodec_roundtrip_shapes(codec):
    cfg = codec.cfg
    t = cfg.hop_length * 10
    audio = jax.random.normal(jax.random.PRNGKey(0), (1, t, 1)) * 0.1
    frames, scales = codec.encode(audio)
    assert frames.shape[0] == 1  # one chunk
    nq = frames.shape[2]
    assert nq >= 1
    assert frames.shape[3] == 10  # t / hop
    out = codec.decode(frames, scales)
    assert out.shape[0] == 1 and out.shape[2] == 1
    assert abs(out.shape[1] - t) <= cfg.hop_length


def test_rvq_reduces_residual(codec):
    """Each RVQ stage must reduce reconstruction error."""
    q = codec.params["quantizer"]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 7, codec.cfg.codebook_dim))
    errs = []
    for nq in range(1, len(q) + 1):
        codes = rvq_encode(q, x, nq)
        rec = rvq_decode(q, codes)
        errs.append(float(jnp.mean((x - rec) ** 2)))
    assert all(b <= a + 1e-9 for a, b in zip(errs, errs[1:]))


def test_lstm_matches_manual():
    """lax.scan LSTM vs a hand-rolled python loop."""
    key = jax.random.PRNGKey(2)
    d = 4
    p = {
        "wx": jax.random.normal(key, (d, 4 * d)) * 0.3,
        "wh": jax.random.normal(jax.random.fold_in(key, 1), (d, 4 * d)) * 0.3,
        "bias": jax.random.normal(jax.random.fold_in(key, 2), (4 * d,)) * 0.1,
    }
    x = jax.random.normal(jax.random.fold_in(key, 3), (1, 5, d))
    out = lstm_forward(p, x)

    h = np.zeros((1, d)); c = np.zeros((1, d))
    xs = np.asarray(x); wx = np.asarray(p["wx"]); wh = np.asarray(p["wh"]); b = np.asarray(p["bias"])
    def sig(v): return 1 / (1 + np.exp(-v))
    outs = []
    for t in range(5):
        g = xs[:, t] @ wx + b + h @ wh
        i, f, gg, o = np.split(g, 4, axis=-1)
        c = sig(f) * c + sig(i) * np.tanh(gg)
        h = sig(o) * np.tanh(c)
        outs.append(h)
    np.testing.assert_allclose(np.asarray(out[0]), np.concatenate(outs), atol=1e-5)


def test_preprocess_audio_padding():
    x = np.ones(100, np.float32)
    inputs, mask = preprocess_audio([x], chunk_length=64, chunk_stride=32)
    assert inputs.shape[1] % 32 == 0
    assert mask[0, :100].all() and not mask[0, 100:].any()


# ------------------------------------------------------------ decoder


@pytest.fixture(scope="module")
def musicgen():
    return MusicGenPipeline.random_init()


def test_decode_step_shapes(musicgen):
    cfg = musicgen.cfg
    p = musicgen.params
    cond = jax.random.normal(jax.random.PRNGKey(0), (2, 3, cfg.hidden_size))
    cross_kv = mg.precompute_cross_kv(p, cfg, cond)
    kc, vc = mg.init_kv_cache(cfg, 2, 8, jnp.float32)
    toks = jnp.full((2, 1, cfg.num_codebooks), cfg.bos_token_id)
    logits, kc, vc = mg.decode_step(p, cfg, toks, cross_kv, kc, vc, jnp.asarray(0))
    assert logits.shape == (2, 1, cfg.codebook_size, cfg.num_codebooks)
    assert np.isfinite(np.asarray(logits)).all()


def test_generate_codes_no_bos_leak(musicgen):
    """After delay-undo every emitted code must be a sampled token, never BOS
    — this checks the delay-pattern index arithmetic end to end."""
    cfg = musicgen.cfg
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.hidden_size))
    max_steps = 12
    codes = mg.generate(musicgen.params, cfg, cond, max_steps=max_steps, top_k=4,
                        key=jax.random.PRNGKey(3))
    assert codes.shape == (1, cfg.num_codebooks, max_steps - cfg.num_codebooks + 1)
    arr = np.asarray(codes)
    assert (arr >= 0).all() and (arr < cfg.codebook_size).all()


def test_generate_batched(musicgen):
    """n samples in one AR loop; distinct per-sample keys → distinct codes."""
    cfg = musicgen.cfg
    cond = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cfg.hidden_size))
    codes = mg.generate(musicgen.params, cfg, cond, max_steps=10, top_k=8,
                        key=jax.random.PRNGKey(4))
    assert codes.shape == (3, cfg.num_codebooks, 10 - cfg.num_codebooks + 1)
    arr = np.asarray(codes)
    assert (arr < cfg.codebook_size).all()
    assert not np.array_equal(arr[0], arr[1])


def test_generate_bucket_padding_matches_unpadded(musicgen):
    """A padded compile bucket with live_steps=R must produce byte-identical
    codes to an unpadded max_steps=R run (ADVICE r1: the ramp-down window
    previously followed the bucket, diverging in the last K-1 frames)."""
    cfg = musicgen.cfg
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.hidden_size))
    R = 12
    direct = mg.generate(musicgen.params, cfg, cond, max_steps=R, top_k=4,
                         key=jax.random.PRNGKey(3))
    bucketed = mg.generate(musicgen.params, cfg, cond, max_steps=64, top_k=4,
                           key=jax.random.PRNGKey(3),
                           live_steps=jnp.int32(R))
    want = R - cfg.num_codebooks + 1
    np.testing.assert_array_equal(
        np.asarray(direct), np.asarray(bucketed)[:, :, :want]
    )
    # past the live window the ramp-down must have masked every codebook to
    # BOS — the sharp signal that live_steps (not the bucket) drives the ramp
    tail = np.asarray(bucketed)[:, :, want:]
    assert (tail == cfg.bos_token_id).all()


def test_chunked_cache_matches_full_cache(musicgen, monkeypatch):
    """Chunked-cache attention (FGT_CACHE_CHUNK) must produce identical codes
    across chunk boundaries — the growing static window + mask is exact."""
    cfg = musicgen.cfg
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.hidden_size))
    full = mg.generate(musicgen.params, cfg, cond, max_steps=20, top_k=4,
                       key=jax.random.PRNGKey(9))
    monkeypatch.setenv("FGT_CACHE_CHUNK", "8")  # 3 chunks over 20 steps
    chunked = mg.generate(musicgen.params, cfg, cond, max_steps=20, top_k=4,
                          key=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_layer_loop_modes_bit_identical(musicgen):
    """decode_step's fori/scan/unroll layer-loop structures (FGT_MG_LAYER_LOOP)
    are the same math in different loop forms — logits and cache writes must
    be bit-identical."""
    from flux_generator_tpu.runtime.config import set_musicgen_layer_loop

    cfg = musicgen.cfg
    p = musicgen.params
    cond = jax.random.normal(jax.random.PRNGKey(0), (2, 3, cfg.hidden_size))
    cross_kv = mg.precompute_cross_kv(p, cfg, cond)
    toks = jnp.full((2, 1, cfg.num_codebooks), cfg.bos_token_id)
    outs = {}
    try:
        for mode in ("fori", "scan", "unroll"):
            set_musicgen_layer_loop(mode)
            kc, vc = mg.init_kv_cache(cfg, 2, 8, jnp.float32)
            outs[mode] = mg.decode_step(
                p, cfg, toks, cross_kv, kc, vc, jnp.asarray(0)
            )
    finally:
        set_musicgen_layer_loop(None)
    for a, b, name in zip(outs["fori"], outs["scan"], ("logits", "k", "v")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"scan {name}"
        )
    # unroll's static indexing lets XLA fuse/reassociate differently —
    # ulp-level drift is expected (measured 6e-8); it's a profiling variant
    for a, b, name in zip(outs["fori"], outs["unroll"], ("logits", "k", "v")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=0,
            err_msg=f"unroll {name}"
        )


def test_generate_deterministic_per_seed(musicgen):
    cfg = musicgen.cfg
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.hidden_size))
    a = mg.generate(musicgen.params, cfg, cond, 8, 4, key=jax.random.PRNGKey(5))
    b = mg.generate(musicgen.params, cfg, cond, 8, 4, key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_generate_waveform(musicgen):
    cfg = musicgen.cfg
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.hidden_size))
    audio = musicgen.generate("", max_steps=10, top_k=4, seed=0, conditioning=cond)
    n_frames = 10 - cfg.num_codebooks + 1
    assert audio.shape[0] == n_frames * musicgen.audio_decoder.cfg.hop_length
    assert np.isfinite(np.asarray(audio)).all()


def test_top_k_sample_respects_k():
    logits = jnp.array([[10.0, 5.0, 1.0, -3.0]] * 2).T  # (V=4, K=2)
    for seed in range(10):
        s = mg.top_k_sample(jax.random.PRNGKey(seed), logits, top_k=2, temperature=1.0)
        assert (np.asarray(s) < 2).all()


def test_kv_cache_f8_close_to_bf16(musicgen):
    """FGT_MG_KV=f8 stores the self-attention KV caches as float8_e4m3fn
    (half the growing window traffic). The math stays in the activation
    dtype — rows round to f8 on insert, widen on read — so multi-step
    logits must track the bf16-cache run within e4m3 rounding noise."""
    cfg = musicgen.cfg
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if jnp.issubdtype(a.dtype, jnp.floating) else a,
                     musicgen.params)
    cond = (jax.random.normal(jax.random.PRNGKey(0), (2, 3, cfg.hidden_size))
            * 0.3).astype(jnp.bfloat16)
    cross_kv = mg.precompute_cross_kv(p, cfg, cond)

    assert mg.kv_cache_dtype(jnp.bfloat16) == jnp.bfloat16  # default off
    from flux_generator_tpu.runtime.config import set_musicgen_kv_dtype
    set_musicgen_kv_dtype("f8")
    try:
        assert mg.kv_cache_dtype(jnp.bfloat16) == jnp.int8  # e4m3 bytes
    finally:
        set_musicgen_kv_dtype(None)

    w = 8
    kc_b, vc_b = mg.init_kv_cache(cfg, 2, w, jnp.bfloat16)
    kc_8, vc_8 = mg.init_kv_cache(cfg, 2, w, jnp.int8)
    for off in range(4):
        toks = jax.random.randint(
            jax.random.PRNGKey(10 + off), (2, 1, cfg.num_codebooks), 0,
            cfg.codebook_size)
        lg_b, kc_b, vc_b = mg.decode_step(
            p, cfg, toks, cross_kv, kc_b, vc_b, jnp.asarray(off))
        lg_8, kc_8, vc_8 = mg.decode_step(
            p, cfg, toks, cross_kv, kc_8, vc_8, jnp.asarray(off))
        a, b = np.asarray(lg_b, np.float32), np.asarray(lg_8, np.float32)
        denom = max(1e-3, float(np.abs(a).max()))
        assert np.abs(a - b).max() / denom < 0.06, np.abs(a - b).max() / denom
    assert kc_8.dtype == jnp.int8


def test_generate_with_f8_kv_runs(musicgen):
    """generate() under the knob: the whole jitted AR loop (cache alloc,
    in-place updates, chunked windows) compiles and emits valid codes."""
    from flux_generator_tpu.runtime.config import set_musicgen_kv_dtype
    cfg = musicgen.cfg
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.hidden_size))
    set_musicgen_kv_dtype("f8")
    try:
        codes = mg.generate(musicgen.params, cfg, cond, max_steps=10,
                            top_k=4, key=jax.random.PRNGKey(3))
    finally:
        set_musicgen_kv_dtype(None)
    arr = np.asarray(codes)
    assert codes.shape == (1, cfg.num_codebooks, 10 - cfg.num_codebooks + 1)
    assert (arr >= 0).all() and (arr < cfg.codebook_size).all()
