"""Concurrent mixed-traffic load test against ONE real tiny-model server
(VERDICT r3 weak #6): image + music + progress polls in flight together.

The reference's REST path mutates shared pipeline state with no lock
(flux_app.py:64-88, SURVEY §5) — the class of race this repo's generation
lock / bounded queue / coalescer claim to fix. Unit tests cover each guard
alone; this drives them together and asserts:
  - no deadlock (every request completes within the timeout)
  - no cross-request bleed (same seed+params → identical image; distinct
    seeds → distinct images/audio, even when coalesced into one batch)
  - content-type isolation (image requests get PNGs, music requests WAVs)
  - progress polls stay well-formed throughout and never take queue slots
  - 429 only beyond capacity: a max_queue=N server admits exactly N
    concurrent requests and rejects the rest
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import pytest

from flux_generator_tpu.pipelines.flux import FluxPipeline
from flux_generator_tpu.server.api import FluxAPI
from flux_generator_tpu.server.httpd import Server


class _TokStub:
    def encode(self, texts, **kw):
        if isinstance(texts, str):
            texts = [texts]
        return [[1, 2, 3, 0] for _ in texts]


def _flux_factory(name):
    pipe = FluxPipeline.random_init(name, tiny=True, dtype=jnp.float32)
    pipe.clip_tokenizer = _TokStub()
    pipe.t5_tokenizer = _TokStub()
    return pipe


def _music_factory():
    from flux_generator_tpu.pipelines.musicgen import MusicGenPipeline

    pipe = MusicGenPipeline.random_init()
    pipe.tokenizer = _TokStub()
    return pipe


def _post(base, path, payload, timeout=600):
    req = urllib.request.Request(
        base + path, json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def load_server():
    api = FluxAPI(pipeline_factory=_flux_factory)
    api._music_factory = _music_factory
    srv = Server(api, "127.0.0.1", 0)
    srv.start_background()
    yield api, f"http://127.0.0.1:{srv.port}"
    srv.shutdown()


@pytest.mark.slow
def test_mixed_concurrent_traffic(load_server):
    api, base = load_server
    # warm the compile caches sequentially first: the race under test is the
    # steady-state serving path, not five cold XLA compiles stampeding one
    # CPU (which only measures compiler contention)
    _post(base, "/sdapi/v1/txt2img", {
        "prompt": "warmup", "model": "flux-schnell",
        "width": 64, "height": 64, "steps": 2, "seed": 1,
    })
    _post(base, "/api/music", {
        "prompt": "warmup", "max_steps": 8, "top_k": 4, "seed": 1,
    })
    results = {}
    errors = []
    stop_polls = threading.Event()
    poll_snapshots = []

    def fire_image(tag, seed, prompt):
        try:
            status, data = _post(base, "/sdapi/v1/txt2img", {
                "prompt": prompt, "model": "flux-schnell",
                "width": 64, "height": 64, "steps": 2, "seed": seed,
            }, timeout=900)
            results[tag] = (status, data)
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    def fire_music(tag, seed):
        try:
            status, data = _post(base, "/api/music", {
                "prompt": "piano", "max_steps": 8, "top_k": 4, "seed": seed,
            }, timeout=900)
            results[tag] = (status, data)
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    def poll_progress():
        while not stop_polls.is_set():
            try:
                req = urllib.request.Request(base + "/sdapi/v1/progress")
                with urllib.request.urlopen(req, timeout=60) as r:
                    poll_snapshots.append(json.loads(r.read()))
            except Exception as e:  # noqa: BLE001
                errors.append(("progress", repr(e)))
                return

    threads = [
        threading.Thread(target=fire_image, args=("img_a", 11, "a cat")),
        threading.Thread(target=fire_image, args=("img_b", 22, "a dog")),
        threading.Thread(target=fire_image, args=("img_a2", 11, "a cat")),
        threading.Thread(target=fire_music, args=("mus_a", 5)),
        threading.Thread(target=fire_music, args=("mus_b", 6)),
    ]
    pollers = [threading.Thread(target=poll_progress, daemon=True)
               for _ in range(2)]
    for t in pollers:
        t.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    stop_polls.set()
    for t in pollers:
        t.join(timeout=60)

    assert not errors, errors
    assert all(not t.is_alive() for t in threads), "deadlocked request thread"
    assert set(results) == {"img_a", "img_b", "img_a2", "mus_a", "mus_b"}
    assert all(status == 200 for status, _ in results.values())

    # image isolation: identical request → same image; distinct seeds →
    # distinct images (catches cross-request state bleed through the slot
    # cache / coalescer). Same-seed requests may land in different-size
    # coalesced batches — different compiled programs whose float reductions
    # associate differently — so compare PIXELS with a tight tolerance, not
    # PNG bytes (bit-identity for sequential requests is covered by
    # test_integration_server.test_same_seed_same_image).
    import io

    import numpy as np
    from PIL import Image

    def pixels(tag):
        url = results[tag][1]["images"][0]
        assert url.startswith("data:image/png;base64,")
        raw = base64.b64decode(url.split(",", 1)[1])
        return np.asarray(Image.open(io.BytesIO(raw)), dtype=np.float32)

    img_a, img_a2, img_b = pixels("img_a"), pixels("img_a2"), pixels("img_b")
    assert np.mean(np.abs(img_a - img_a2)) <= 2.0, \
        "same seed+params must reproduce the same image"
    assert np.mean(np.abs(img_a - img_b)) > 2.0, \
        "distinct seeds must give distinct images"

    # music isolation + content type
    wav_a = results["mus_a"][1]["audio"]
    wav_b = results["mus_b"][1]["audio"]
    assert wav_a.startswith("data:audio/wav;base64,")
    assert wav_a != wav_b, "distinct seeds must give distinct audio"
    # WAV payloads must be decodable (no truncated/interleaved writes)
    import io
    import wave

    for url in (wav_a, wav_b):
        with wave.open(io.BytesIO(base64.b64decode(url.split(",", 1)[1]))) as w:
            assert w.getnframes() > 0

    # progress endpoint stayed live and well-formed under load
    assert poll_snapshots, "progress pollers never completed a request"
    for snap in poll_snapshots:
        assert "progress" in snap
        assert 0.0 <= snap["progress"] <= 1.0


@pytest.mark.slow
def test_429_only_beyond_capacity():
    """With the generation lock held, a max_queue=2 server must admit exactly
    2 concurrent requests and 429 the rest — queue fairness, not starvation."""
    api = FluxAPI(pipeline_factory=_flux_factory, max_queue=2)
    srv = Server(api, "127.0.0.1", 0)
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"
    statuses = []
    lock_acquired = api._gen_lock.acquire()
    assert lock_acquired

    def fire(seed):
        try:
            status, _ = _post(base, "/sdapi/v1/txt2img", {
                "prompt": "x", "model": "flux-schnell",
                "width": 64, "height": 64, "steps": 1, "seed": seed,
            })
            statuses.append(status)
        except urllib.error.HTTPError as e:
            statuses.append(e.code)

    try:
        threads = [threading.Thread(target=fire, args=(s,)) for s in range(4)]
        for t in threads:
            t.start()
        # wait until the rejected ones have answered (the admitted two block
        # on the held lock)
        import time

        for _ in range(200):
            if statuses.count(429) >= 2:
                break
            time.sleep(0.05)
    finally:
        api._gen_lock.release()
    for t in threads:
        t.join(timeout=600)
    srv.shutdown()

    assert sorted(statuses) == [200, 200, 429, 429], statuses
