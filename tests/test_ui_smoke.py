"""UI smoke automation (VERDICT r2 #10): server/ui.py is ~270 lines of
HTML/JS with no browser automation in CI, so a renamed element or a broken
fetch path could ship silently. These tests parse the shipped page and
(a) verify every endpoint the JS fetches round-trips against a live test
server with a payload mirroring what the JS builds, and (b) verify every
getElementById target exists as an id= in the HTML. A new fetch() in the
UI without a matching entry here fails loudly."""

import json
import re
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from flux_generator_tpu.server import ui
from flux_generator_tpu.server.api import FluxAPI
from flux_generator_tpu.server.httpd import Server


class _MockFluxPipeline:
    def generate_latents(self, text, n_images=1, num_steps=2, latent_size=(64, 64),
                         guidance=4.0, seed=None):
        import jax.numpy as jnp

        yield ("cond",)
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


class _MockMusicPipeline:
    sampling_rate = 32000

    def generate(self, prompt, max_steps=500, top_k=250, temp=1.0,
                 guidance_coef=3.0, seed=None):
        return np.zeros(max_steps * 640, np.float32)


@pytest.fixture(scope="module")
def server():
    api = FluxAPI(
        pipeline_factory=lambda name: _MockFluxPipeline(),
        sd_factory=lambda name: _MockSDPipeline(),
    )
    api._music_factory = _MockMusicPipeline
    srv = Server(api, "127.0.0.1", 0)
    srv.start_background()
    yield f"http://127.0.0.1:{srv.port}"
    srv.shutdown()


def _request(url, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    headers = {"Content-Type": "application/json"} if payload is not None else {}
    req = urllib.request.Request(url, data, headers)
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


# Payloads mirroring EXACTLY what the UI's JS builds for each fetch()
# (server/ui.py img-go / i2i-go / mus-go onclick bodies). A 1×1 gray PNG
# stands in for the FileReader result on the img2img path.
_TINY_PNG_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAAAAAA6fptVAAAACklEQVR4nGNiAAAABgADNjd8qAAA"
    "AABJRU5ErkJggg=="
)

UI_FETCH_PAYLOADS = {
    "/sdapi/v1/progress": None,  # GET poller
    "/sdapi/v1/txt2img": {
        "prompt": "A majestic mountain at sunset", "model": "flux-schnell",
        "width": 128, "height": 128, "steps": 2, "cfg_scale": 4.0, "seed": -1,
    },
    "/sdapi/v1/img2img": {
        "prompt": "a watercolor painting", "init_images": [_TINY_PNG_B64],
        "model": "stabilityai/stable-diffusion-2-1-base",
        "denoising_strength": 0.75, "steps": 2, "cfg_scale": 7.5,
        "width": 512, "height": 512,
    },
    "/api/music": {
        "prompt": "happy rock with electric guitar", "max_steps": 8,
        "top_k": 4, "temperature": 1.0, "guidance": 3.0,
    },
}


def test_every_ui_fetch_round_trips(server):
    fetched = set(re.findall(r"fetch\('([^']+)'", ui.INDEX_HTML))
    assert fetched, "no fetch() calls found — UI parsing broke"
    unknown = fetched - set(UI_FETCH_PAYLOADS)
    assert not unknown, (
        f"UI fetches {unknown} with no smoke-test payload — add one to "
        "UI_FETCH_PAYLOADS so the endpoint is covered"
    )
    for path in sorted(fetched):
        status, data = _request(server + path, UI_FETCH_PAYLOADS[path])
        assert status == 200, f"{path} -> {status}"
        # shape checks matching what the JS reads off each response
        if path.endswith("txt2img") or path.endswith("img2img"):
            assert data["images"] and isinstance(data["images"][0], str)
        elif path.endswith("music"):
            assert data["audio"].startswith("data:audio/wav;base64,")
            assert "duration_s" in data and "sampling_rate" in data
        elif path.endswith("progress"):
            assert "progress" in data


def test_every_js_element_id_exists_in_html():
    used = set(re.findall(r"getElementById\('([^']+)'\)", ui.INDEX_HTML))
    # dynamic panel ids: 'panel-' + t.dataset.tab
    tabs = set(re.findall(r'data-tab="([^"]+)"', ui.INDEX_HTML))
    used |= {f"panel-{t}" for t in tabs}
    declared = set(re.findall(r'id="([^"]+)"', ui.INDEX_HTML))
    missing = used - declared
    assert not missing, f"JS references missing element ids: {sorted(missing)}"


def test_ui_model_options_are_valid_server_models(server):
    """Every <option value> in the image model dropdowns must be a model the
    server actually accepts (drift check against list_models / txt2img)."""
    selects = re.findall(r"<select[^>]*id=\"(img-model|i2i-model)\"(.*?)</select>",
                         ui.INDEX_HTML, re.S)
    assert selects
    _, models = _request(server + "/sdapi/v1/sd-models")
    server_titles = {m["title"] for m in models}
    for sel_id, body in selects:
        options = re.findall(r'<option value="([^"]+)"', body)
        assert options, f"no options in {sel_id}"
        for model in options:
            assert model in server_titles, (
                f"{sel_id} offers '{model}' which /sdapi/v1/sd-models "
                f"does not list ({sorted(server_titles)})"
            )


def test_preset_models_match_dropdown():
    """The JS PRESETS table keys must stay in sync with the dropdown."""
    presets = set(re.findall(r"^  '([^']+)': \{steps:", ui.INDEX_HTML, re.M))
    options = set(re.findall(r'<option value="([^"]+)"', ui.INDEX_HTML))
    assert presets <= options, f"PRESETS keys not in any dropdown: {presets - options}"


# ------------------------------------------------- JS contract (no engine)
# There is no JS engine or browser in this environment (no node, no
# chromium), so the inline JS cannot be EXECUTED in CI. These tests instead
# mechanically extract the JS's data flow — the request payload it builds
# and every field it reads off each parsed response — and replay that
# contract against a live server. A renamed response field, a removed
# endpoint, or structurally broken JS (unbalanced braces/parens/strings)
# fails loudly; only pure logic typos remain uncovered.


def _script_block() -> str:
    m = re.search(r"<script>(.*)</script>", ui.INDEX_HTML, re.S)
    assert m, "no <script> block in the UI page"
    return m.group(1)


def test_js_structural_sanity():
    """Balanced braces/brackets/parens outside string literals, and every
    string/template literal closed — the typo classes that silently kill the
    whole script at parse time in a real browser."""
    js = _script_block()
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(js)
    in_str = None  # current quote char or None
    while i < n:
        ch = js[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == in_str:
                in_str = None
            elif in_str != "`" and ch == "\n":
                raise AssertionError(f"unterminated {in_str}-string near char {i}")
        elif ch in "'\"`":
            in_str = ch
        elif ch == "/" and i + 1 < n and js[i + 1] == "/":
            i = js.find("\n", i)
            if i == -1:
                break
            continue
        elif ch in "([{":
            stack.append(ch)
        elif ch in ")]}":
            assert stack and stack[-1] == pairs[ch], \
                f"unbalanced {ch!r} near char {i}: ...{js[max(0,i-60):i+1]!r}"
            stack.pop()
        i += 1
    assert in_str is None, "unterminated string at end of script"
    assert not stack, f"unclosed {stack!r} at end of script"


def _fetch_segments():
    """Split the JS at each fetch('<path>') and pair every segment with the
    variable its response JSON is bound to plus all fields read off it."""
    js = _script_block()
    out = []
    sites = [(m.start(), m.group(1)) for m in re.finditer(r"fetch\('([^']+)'", js)]
    for idx, (pos, path) in enumerate(sites):
        end = sites[idx + 1][0] if idx + 1 < len(sites) else len(js)
        seg = js[pos:end]
        m = re.search(r"(?:const|let)\s+(\w+)\s*=\s*await\s*(?:r\.json\(\)|\(await\s*fetch[^;]*\.json\(\))", seg)
        if not m:  # fetch whose body is never parsed (none today)
            continue
        var = m.group(1)
        fields = set(re.findall(rf"\b{var}\.(\w+)", seg))
        # any-of pairs: `X.a || <expr with X.b>` — JS falls back, so the
        # server may return either
        anyof = set()
        for a, b in re.findall(rf"{var}\.(\w+)\s*\|\|\s*\[?\s*{var}\.(\w+)", seg):
            anyof |= {a, b}
        # fields only read on the error path are not part of the 200 contract
        err = set(re.findall(rf"throw new Error\({var}\.(\w+)", seg))
        err |= set(re.findall(rf"!r\.ok[^;]*{var}\.(\w+)", seg))
        out.append((path, fields - err, anyof))
    return out


def test_js_response_field_contract(server):
    """Every field the JS reads off a 200 response must exist in the live
    server's response to the JS-shaped payload (self-updating: a new
    `data.foo` read in the UI adds itself to this contract)."""
    segments = _fetch_segments()
    assert segments, "no parsed fetch segments — extraction broke"
    for path, fields, anyof in segments:
        status, data = _request(server + path, UI_FETCH_PAYLOADS[path])
        assert status == 200, f"{path} -> {status}"
        required = fields - anyof
        missing = {f for f in required if f not in data}
        assert not missing, f"{path}: JS reads {missing} but response has {sorted(data)}"
        if anyof:
            assert anyof & set(data), \
                f"{path}: JS falls back across {anyof}, none present"
