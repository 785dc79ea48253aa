"""Cross-user music coalescing (VERDICT r4 next #2): several users' requests
— DIFFERENT prompts (lengths), durations and seeds — run in ONE batched AR
loop. Parity contract: at top_k=1 every coalesced request's codes equal a
solo run of that request at its own true conditioning length (the reference
serves music strictly one request at a time, musicgen/musicgen.py:249-304).

Masking lives in three places, all covered here: the XLA decode_step
cross-attention mask, the fused megakernels' sl_ref operand (interpret mode
on CPU; hardware path identical code), and the pipeline's S-bucket padding.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.models.musicgen import model as mg
from flux_generator_tpu.runtime.config import set_musicgen_fused

pytestmark = pytest.mark.slow


def tiny_cfg():
    return mg.tiny_musicgen_config(hidden_size=32, ffn_dim=128,
                                   num_attention_heads=4, num_hidden_layers=2)


def _setup(s1=5, s2=9):
    cfg = tiny_cfg()
    params = mg.init_musicgen(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    h = cfg.hidden_size
    c1 = (jax.random.normal(jax.random.PRNGKey(1), (1, s1, h)) * 0.3
          ).astype(jnp.bfloat16)
    c2 = (jax.random.normal(jax.random.PRNGKey(2), (1, s2, h)) * 0.3
          ).astype(jnp.bfloat16)
    return cfg, params, c1, c2


def _pad_to(c, s_bucket):
    out = jnp.zeros((1, s_bucket, c.shape[2]), c.dtype)
    return out.at[:, : c.shape[1]].set(c)


@pytest.mark.parametrize("fused", [False, True])
def test_batched_masked_equals_sequential(fused):
    """The VERDICT-prescribed parity: masked batched == sequential
    per-request codes at top_k=1, for both the XLA loop and the fused
    megakernel (interpret mode), with per-request durations."""
    cfg, params, c1, c2 = _setup()
    steps_bucket, live1, live2 = 16, 12, 16
    kw = dict(top_k=1, temperature=1.0, guidance_coef=3.0)

    set_musicgen_fused(fused)
    try:
        # solo runs at each request's own length / duration; same per-sample
        # key STREAMS as the batched run (top_k=1 is argmax, but bf16 logits
        # can tie exactly — categorical then resolves by key)
        solo1 = mg.generate(params, cfg, c1, max_steps=steps_bucket,
                            live_steps=jnp.int32(live1),
                            keys=jnp.stack([jax.random.PRNGKey(7)]), **kw)
        solo2 = mg.generate(params, cfg, c2, max_steps=steps_bucket,
                            live_steps=jnp.int32(live2),
                            keys=jnp.stack([jax.random.PRNGKey(8)]), **kw)

        # coalesced: prompts padded to one S bucket + cond_len masks,
        # per-sample live_steps and keys
        s_bucket = 16
        cond = jnp.concatenate(
            [_pad_to(c1, s_bucket), _pad_to(c2, s_bucket)], axis=0)
        batched = mg.generate(
            params, cfg, cond, max_steps=steps_bucket,
            live_steps=jnp.array([live1, live2], jnp.int32),
            cond_len=jnp.array([c1.shape[1], c2.shape[1]], jnp.int32),
            keys=jnp.stack(
                [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]),
            **kw,
        )
    finally:
        set_musicgen_fused(None)

    np.testing.assert_array_equal(np.asarray(batched[0]), np.asarray(solo1[0]))
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(solo2[0]))


@pytest.mark.parametrize("fused", [False, True])
def test_solo_keys_path_matches_padded_masked(fused):
    """cond_len masking is exact: a solo run with the prompt padded +
    masked to a bigger S bucket produces the same codes as the unpadded
    run (same keys path both sides isolates the mask itself)."""
    cfg, params, c1, _ = _setup()
    keys = jnp.stack([jax.random.PRNGKey(3)])
    kw = dict(max_steps=16, top_k=1, temperature=1.0, guidance_coef=3.0,
              keys=keys)
    set_musicgen_fused(fused)
    try:
        plain = mg.generate(params, cfg, c1,
                            cond_len=jnp.array([c1.shape[1]], jnp.int32),
                            **kw)
        padded = mg.generate(params, cfg, _pad_to(c1, 16),
                             cond_len=jnp.array([c1.shape[1]], jnp.int32),
                             **kw)
    finally:
        set_musicgen_fused(None)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(padded))


def test_unmasked_default_unchanged():
    """cond_len=None keeps the original single-prompt behavior bit-exact
    (regression pin for every existing caller)."""
    cfg, params, c1, _ = _setup()
    a = mg.generate(params, cfg, c1, max_steps=12, top_k=2,
                    key=jax.random.PRNGKey(5))
    b = mg.generate(params, cfg, c1, max_steps=12, top_k=2,
                    key=jax.random.PRNGKey(5),
                    cond_len=jnp.array([c1.shape[1]], jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_generate_requests_parity():
    """Pipeline level: generate_requests([r1, r2]) waveforms equal the solo
    generate_requests of each request (S-bucket padding + per-request
    truncation + per-request EnCodec decode)."""
    from flux_generator_tpu.pipelines.musicgen import MusicGenPipeline

    class _Tok:
        def __init__(self):
            self.lens = {"short prompt": 3, "a much longer prompt text": 9}

        def encode(self, text, **kw):
            return [list(range(1, self.lens.get(text, 4) + 1))]

    pipe = MusicGenPipeline.random_init()
    pipe.tokenizer = _Tok()
    r1 = {"text": "short prompt", "max_steps": 10, "seed": 11}
    r2 = {"text": "a much longer prompt text", "max_steps": 14, "seed": 22}

    both = pipe.generate_requests([r1, r2], top_k=1)
    solo1 = pipe.generate_requests([r1], top_k=1)[0]
    solo2 = pipe.generate_requests([r2], top_k=1)[0]

    assert len(both) == 2
    np.testing.assert_array_equal(np.asarray(both[0]), np.asarray(solo1))
    np.testing.assert_array_equal(np.asarray(both[1]), np.asarray(solo2))
    # durations differ: 10- vs 14-step requests decode different lengths
    assert np.asarray(both[0]).shape[0] < np.asarray(both[1]).shape[0]


def test_server_music_requests_coalesce():
    """Two users' /api/music requests with DIFFERENT prompts and durations
    merge into one batched AR loop (deterministic overlap: the generation
    lock is held while both enqueue), and each gets its own audio back."""
    from flux_generator_tpu.pipelines.musicgen import MusicGenPipeline
    from flux_generator_tpu.server.api import FluxAPI
    from flux_generator_tpu.server.httpd import Server

    class _Tok:
        def encode(self, text, **kw):
            return [[1, 2, 3, 0] if "piano" in text else [4, 5]]

    batch_sizes = []

    def music_factory():
        pipe = MusicGenPipeline.random_init()
        pipe.tokenizer = _Tok()
        orig = pipe.generate_requests

        def spy(requests, **kw):
            batch_sizes.append(len(requests))
            return orig(requests, **kw)

        pipe.generate_requests = spy
        return pipe

    api = FluxAPI()
    api._music_factory = music_factory
    srv = Server(api, "127.0.0.1", 0)
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"
    results = {}

    def fire(prompt, steps, seed):
        req = urllib.request.Request(
            base + "/api/music",
            json.dumps({"prompt": prompt, "max_steps": steps, "top_k": 4,
                        "seed": seed}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            results[prompt] = json.loads(r.read())

    try:
        api._gen_lock.acquire()  # stall generation while requests pile up
        threads = [
            threading.Thread(target=fire, args=("piano solo", 10, 1)),
            threading.Thread(target=fire, args=("drum beat", 14, 2)),
        ]
        for t in threads:
            t.start()
        for _ in range(200):
            with api._batch_lock:
                n_pending = sum(len(v) for v in api._pending.values())
            if n_pending == 2:
                break
            time.sleep(0.05)
        assert n_pending == 2, f"only {n_pending} pending"
        api._gen_lock.release()
        for t in threads:
            t.join()
    finally:
        srv.shutdown()

    assert set(results) == {"piano solo", "drum beat"}
    for r in results.values():
        assert r["audio"].startswith("data:audio/wav;base64,")
    assert results["piano solo"]["audio"] != results["drum beat"]["audio"]
    assert 2 in batch_sizes, batch_sizes  # the two requests shared one loop
