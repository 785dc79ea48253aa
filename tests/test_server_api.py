"""API-layer tests following the reference's strategy (test/test_api.py:
mocked pipelines behind the real HTTP surface)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from flux_generator_tpu.server.api import FluxAPI, to_latent_size
from flux_generator_tpu.server.schemas import SDAPIRequest
from flux_generator_tpu.server.app import check_port_available, find_available_port
from flux_generator_tpu.server.httpd import Server
from flux_generator_tpu.server.schemas import SDAPIRequest


class _MockFluxPipeline:
    """Mimics FluxPipeline.generate_latents' conditioning-first protocol."""

    def generate_latents(self, text, n_images=1, num_steps=2, latent_size=(64, 64),
                         guidance=4.0, seed=None):
        yield ("cond",)
        import jax.numpy as jnp

        for _ in range(num_steps):
            yield jnp.zeros((n_images, latent_size[0] * latent_size[1] // 4, 64))

    def decode(self, x, latent_size):
        import jax.numpy as jnp

        return jnp.full((1, latent_size[0] * 8, latent_size[1] * 8, 3), 0.5)


class _MockSDPipeline:
    def generate_latents(self, text, n_images=1, cfg_weight=7.5, num_steps=2,
                         negative_text="", latent_size=(64, 64), seed=None):
        import jax.numpy as jnp

        for _ in range(num_steps):
            yield jnp.zeros((n_images, *latent_size, 4))

    def generate_latents_from_image(self, image, text, n_images=1, strength=0.8,
                                    num_steps=2, cfg_weight=7.5, negative_text="",
                                    seed=None):
        import jax.numpy as jnp

        for _ in range(max(1, int(num_steps * strength))):
            yield jnp.zeros((n_images, image.shape[0] // 8, image.shape[1] // 8, 4))

    def decode(self, x):
        import jax.numpy as jnp

        return jnp.full((1, x.shape[1] * 8, x.shape[2] * 8, 3), 0.25)


@pytest.fixture(scope="module")
def api():
    return FluxAPI(
        pipeline_factory=lambda name: _MockFluxPipeline(),
        sd_factory=lambda name: _MockSDPipeline(),
    )


@pytest.fixture(scope="module")
def server(api):
    srv = Server(api, "127.0.0.1", 0)
    srv.start_background()
    yield f"http://127.0.0.1:{srv.port}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def test_to_latent_size_rounds_to_16():
    assert to_latent_size((512, 512)) == (64, 64)
    assert to_latent_size((500, 500)) == (64, 64)
    assert to_latent_size((513, 520)) == (66, 66)


def test_request_defaults():
    req = SDAPIRequest(prompt="hi")
    assert req.width == 512 and req.height == 512
    assert req.seed == -1 and req.model == "schnell"


def test_txt2img_endpoint(server):
    status, data = _post(
        server + "/sdapi/v1/txt2img",
        {"prompt": "a cat", "width": 128, "height": 128, "steps": 2},
    )
    assert status == 200
    assert len(data["images"]) == 1
    assert data["images"][0].startswith("data:image/png;base64,")
    assert data["parameters"]["prompt"] == "a cat"
    assert "info" in data


def test_txt2img_sd_model(server):
    status, data = _post(
        server + "/sdapi/v1/txt2img",
        {"prompt": "x", "model": "stabilityai/sdxl-turbo", "width": 64, "height": 64},
    )
    assert status == 200
    assert data["images"][0].startswith("data:image/png;base64,")


def test_img2img_endpoint(server):
    import base64
    import io

    import numpy as _np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_np.zeros((64, 64, 3), _np.uint8)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    status, data = _post(
        server + "/sdapi/v1/img2img",
        {"prompt": "x", "init_images": [b64], "width": 64, "height": 64,
         "steps": 2, "model": "stabilityai/stable-diffusion-2-1-base"},
    )
    assert status == 200
    assert data["images"][0].startswith("data:image/png;base64,")


def test_sd_models_endpoint(server):
    status, models = _get(server + "/sdapi/v1/sd-models")
    assert status == 200
    assert len(models) == 4
    titles = {m["title"] for m in models}
    assert titles == {
        "flux-schnell", "flux-dev",
        "stabilityai/stable-diffusion-2-1-base", "stabilityai/sdxl-turbo",
    }
    for m in models:
        for key in ("title", "name", "model_name", "hash", "sha256", "filename", "config"):
            assert key in m


def test_options_endpoints(server):
    status, opts = _get(server + "/sdapi/v1/options")
    assert status == 200
    assert "sd_model_checkpoint" in opts
    assert len(opts["sd_model_list"]) == 4
    status, res = _post(server + "/sdapi/v1/options", {"sd_model_checkpoint": "flux-dev"})
    assert status == 200 and res["success"] is True


def test_progress_endpoint(server):
    status, prog = _get(server + "/sdapi/v1/progress")
    assert status == 200
    for key in ("progress", "eta_relative", "state", "current_image", "textinfo"):
        assert key in prog
    assert prog["textinfo"] == "Idle"


def test_progress_tracks_steps(api):
    api.progress.start("job", 4)
    api.progress.step(2)
    snap = api.progress.snapshot()
    assert snap["progress"] == 0.5
    assert "2/4" in snap["textinfo"]
    api.progress.start("", 0)


def test_ui_and_docs_served(server):
    with urllib.request.urlopen(server + "/") as r:
        body = r.read().decode()
    assert "Flux Generator" in body and "Music Generation" in body
    with urllib.request.urlopen(server + "/docs") as r:
        assert "txt2img" in r.read().decode()


def test_error_returns_500():
    """Pipeline exceptions surface as HTTP 500 with detail (parity:
    flux_app.py:120-121)."""

    def boom(name):
        raise RuntimeError("model load exploded")

    api = FluxAPI(pipeline_factory=boom)
    srv = Server(api, "127.0.0.1", 0)
    srv.start_background()
    try:
        _post(f"http://127.0.0.1:{srv.port}/sdapi/v1/txt2img", {"prompt": "x"})
        raise AssertionError("expected 500")
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "exploded" in json.loads(e.read())["detail"]
    finally:
        srv.shutdown()


def test_422_on_bad_request(server):
    try:
        _post(server + "/sdapi/v1/txt2img", {"no_prompt": True})
        raise AssertionError("expected 422")
    except urllib.error.HTTPError as e:
        assert e.code == 422


def test_404(server):
    try:
        urllib.request.urlopen(server + "/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_concurrent_requests_serialized(server):
    """Two concurrent generations must both succeed — the generation lock
    serializes them (the reference's REST path is unguarded, SURVEY §5)."""
    results = []

    def go():
        results.append(
            _post(server + "/sdapi/v1/txt2img",
                  {"prompt": "x", "width": 64, "height": 64, "steps": 1})[0]
        )

    threads = [threading.Thread(target=go) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert results == [200, 200]


def test_port_probing():
    port = find_available_port("127.0.0.1", 49500)
    assert check_port_available("127.0.0.1", port)


def test_oversize_request_rejected(server):
    import urllib.error

    try:
        _post(
            server + "/sdapi/v1/txt2img",
            {"prompt": "x", "model": "flux-schnell", "width": 8192, "height": 8192},
        )
        raise AssertionError("oversize request was not rejected")
    except urllib.error.HTTPError as e:
        assert e.code == 422
        assert "exceeds" in json.loads(e.read())["detail"]


def test_seedless_requests_get_fresh_random_seeds():
    """A1111 seed=-1 semantics: every seedless request must reach the
    pipeline with a fresh CONCRETE seed — the batched pipelines map
    seed=None to a fixed key, which would make seedless generation
    deterministic across requests."""
    seen = []

    class _Recorder(_MockFluxPipeline):
        def generate_latents(self, text, seed=None, **kw):
            seen.append(seed)
            return super().generate_latents(text, seed=seed, **kw)

    api = FluxAPI(pipeline_factory=lambda name: _Recorder(),
                  sd_factory=lambda name: _MockSDPipeline())
    for _ in range(2):
        api.txt2img(SDAPIRequest(prompt="x", model="flux-schnell",
                                 width=64, height=64, steps=1))
    assert len(seen) == 2
    assert all(s is not None for s in seen), seen
    assert seen[0] != seen[1], seen
