"""End-to-end tiny DreamBooth run on a fake 8-device CPU mesh + adapter
save/load roundtrip + quantization checks."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_generator_tpu.ops.linear import dense, init_dense
from flux_generator_tpu.ops.quant import quantize_dense, quantize_tree
from flux_generator_tpu.pipelines.flux import FluxPipeline
from flux_generator_tpu.training.checkpoints import (
    load_adapter_file,
    save_adapter,
    save_config,
)
from flux_generator_tpu.training.datasets import LegacyDataset, LocalDataset, load_dataset
from flux_generator_tpu.training.dreambooth import build_parser, train
from flux_generator_tpu.training.lora import apply_lora_to_flux

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def _make_dataset(tmp_path, n=2):
    from PIL import Image

    for i in range(n):
        arr = (np.random.RandomState(i).rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")
    with open(tmp_path / "train.jsonl", "w") as f:
        for i in range(n):
            f.write(json.dumps({"image": f"img{i}.png", "prompt": f"a photo {i}"}) + "\n")
    return tmp_path


def test_load_dataset_local(tmp_path):
    _make_dataset(tmp_path)
    ds = load_dataset(str(tmp_path))
    assert isinstance(ds, LocalDataset)
    assert len(ds) == 2
    img, prompt = ds[0]
    assert prompt == "a photo 0"


def test_load_dataset_legacy(tmp_path):
    with open(tmp_path / "index.json", "w") as f:
        json.dump({"data": [{"image": "x.png", "text": "t"}]}, f)
    ds = load_dataset(str(tmp_path))
    assert isinstance(ds, LegacyDataset)


class _TokStub:
    def encode(self, texts, **kw):
        if isinstance(texts, str):
            texts = [texts]
        return [[1, 2, 3, 0] for _ in texts]


@pytest.mark.slow
def test_dreambooth_tiny_end_to_end(tmp_path):
    """3 optimizer steps with grad accumulation 2 on the fake mesh; loss
    finite, adapter file written, adapter loads back and changes outputs."""
    _make_dataset(tmp_path)
    pipe = FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)
    pipe.clip_tokenizer = _TokStub()
    pipe.t5_tokenizer = _TokStub()

    args = build_parser().parse_args([
        str(tmp_path), "--model", "schnell", "--iterations", "3",
        "--batch-size", "2", "--resolution", "32x32", "--num-augmentations", "2",
        "--grad-accumulate", "2", "--lora-rank", "2", "--progress-every", "0",
        "--checkpoint-every", "0", "--warmup-steps", "1",
        "--output-dir", str(tmp_path / "out"),
    ])
    ds = load_dataset(str(tmp_path))
    trained = train(args, pipeline=pipe, dataset=ds)

    out = Path(tmp_path / "out")
    assert (out / "adapter_config.json").exists()
    assert (out / "final_adapters.safetensors").exists()

    # adapter roundtrip into a fresh pipeline
    fresh = FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)
    load_adapter_file(fresh, out / "final_adapters.safetensors")
    flat = jax.tree_util.tree_leaves_with_path(fresh.params["flow"])
    lora_keys = [p for p, _ in flat if "lora" in "/".join(str(k) for k in p)]
    assert lora_keys


@pytest.mark.slow
def test_dreambooth_freeze_and_block_mask(tmp_path):
    """Base weights must stay exactly frozen (optax.masked alone leaks raw
    grads into unmasked leaves — regression for ADVICE r1 medium), and
    --lora-blocks N must restrict training to the LAST N blocks (tiny config:
    2 double + 2 single, so blocks=2 trains only the single blocks)."""
    _make_dataset(tmp_path)
    pipe = FluxPipeline.random_init("flux-schnell", tiny=True, dtype=jnp.float32)
    pipe.clip_tokenizer = _TokStub()
    pipe.t5_tokenizer = _TokStub()
    base_before = jax.tree.map(np.asarray, pipe.params["flow"])

    args = build_parser().parse_args([
        str(tmp_path), "--model", "schnell", "--iterations", "2",
        "--batch-size", "2", "--resolution", "32x32", "--num-augmentations", "2",
        "--grad-accumulate", "1", "--lora-rank", "2", "--lora-blocks", "2",
        "--progress-every", "0", "--checkpoint-every", "0", "--warmup-steps", "1",
        "--output-dir", str(tmp_path / "out"),
    ])
    ds = load_dataset(str(tmp_path))
    trained = train(args, pipeline=pipe, dataset=ds)
    flow = trained.params["flow"]

    # every non-lora leaf is bit-identical to its pre-training value
    def _paths(t):
        return {
            "/".join(str(k) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(t)
        }

    before, after = _paths(base_before), _paths(flow)
    checked_frozen = 0
    for path, val in after.items():
        if "lora" in path:
            continue
        np.testing.assert_array_equal(val, before[path], err_msg=path)
        checked_frozen += 1
    assert checked_frozen > 10

    # masked-out double blocks: lora_b still exactly zero; trained single
    # blocks: lora_b has moved
    dbl_b = [np.asarray(v) for p, v in jax.tree_util.tree_leaves_with_path(flow["double_blocks"])
             if "lora_b" in "/".join(str(k) for k in p)]
    sgl_b = [np.asarray(v) for p, v in jax.tree_util.tree_leaves_with_path(flow["single_blocks"])
             if "lora_b" in "/".join(str(k) for k in p)]
    assert dbl_b and sgl_b
    assert all(not a.any() for a in dbl_b), "masked-out double blocks trained"
    assert any(a.any() for a in sgl_b), "unmasked single blocks did not train"


@pytest.mark.slow
def test_dreambooth_quantize_base(tmp_path):
    """--quantize-base: the frozen base is int8 (kernel_q), gradients flow
    only through the bf16 LoRA tree, and training still learns — the
    mechanism that fits full 12B LoRA fine-tuning on one 16 GB chip."""
    _make_dataset(tmp_path)
    # hidden 512 so the reference quantize predicate (input % 512 == 0,
    # txt2image.py:28-29) actually fires at tiny depth
    pipe = FluxPipeline.random_init(
        "flux-schnell", tiny=True, dtype=jnp.float32,
        hidden_size=512, num_heads=4, axes_dim=(16, 56, 56),
    )
    pipe.clip_tokenizer = _TokStub()
    pipe.t5_tokenizer = _TokStub()

    args = build_parser().parse_args([
        str(tmp_path), "--model", "schnell", "--iterations", "2",
        "--batch-size", "2", "--resolution", "32x32", "--num-augmentations", "2",
        "--grad-accumulate", "1", "--lora-rank", "2", "--progress-every", "0",
        "--checkpoint-every", "0", "--warmup-steps", "1", "--quantize-base",
        "--output-dir", str(tmp_path / "out"),
    ])
    trained = train(args, pipeline=pipe, dataset=load_dataset(str(tmp_path)))
    flow = trained.params["flow"]
    leaves = {
        "/".join(str(k) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(flow)
    }
    assert any("kernel_q" in k for k in leaves), "base was not quantized"
    lora_b = [v for k, v in leaves.items() if "lora_b" in k]
    assert any(v.any() for v in lora_b), "LoRA did not train on int8 base"
    assert (tmp_path / "out" / "final_adapters.safetensors").exists()


def test_save_config_sorted(tmp_path):
    save_config(tmp_path / "c.json", {"b": 2, "a": 1, "fn": lambda: 0})
    with open(tmp_path / "c.json") as f:
        data = json.load(f)
    assert list(data) == ["a", "b"]


def test_quantize_dense_roundtrip():
    p = init_dense(jax.random.PRNGKey(0), 512, 64)
    q = quantize_dense(p)
    assert q["kernel_q"].dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 512))
    y_full = dense(p, x)
    y_q = dense(q, x)
    rel = float(jnp.linalg.norm(y_full - y_q) / jnp.linalg.norm(y_full))
    assert rel < 0.05


def test_w8a8_compute_path():
    from flux_generator_tpu.ops.linear import set_w8a8

    set_w8a8(True)
    try:
        _check_w8a8_compute()
    finally:
        set_w8a8(None)


def _check_w8a8_compute():
    p = init_dense(jax.random.PRNGKey(0), 512, 128)
    q = quantize_dense(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512))
    rel = float(
        jnp.linalg.norm(dense(p, x) - dense(q, x)) / jnp.linalg.norm(dense(p, x))
    )
    assert rel < 0.03


def test_quantize_int4():
    p = init_dense(jax.random.PRNGKey(0), 512, 64)
    q = quantize_dense(p, bits=4)
    assert str(q["kernel_q"].dtype) == "int4"
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 512))
    rel = float(
        jnp.linalg.norm(dense(p, x) - dense(q, x)) / jnp.linalg.norm(dense(p, x))
    )
    assert rel < 0.15


def test_groupwise_quant_beats_per_channel_with_outliers():
    """Real checkpoints have outlier input rows; per-group scales isolate
    them (uniform random weights show no difference, so inject outliers)."""
    key = jax.random.PRNGKey(0)
    kern = jax.random.normal(key, (512, 64)) * 0.02
    kern = kern.at[7].set(kern[7] * 50)  # one outlier input row
    p = {"kernel": kern}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512)) * 0.1
    y = dense(p, x)

    def err(q):
        return float(jnp.linalg.norm(y - dense(q, x)) / jnp.linalg.norm(y))

    per_channel = err(quantize_dense(p, bits=4))
    grouped = err(quantize_dense(p, bits=4, group_size=64))
    assert grouped < per_channel * 0.5


def test_grouped_quant_stacked_kernels():
    p = {"kernel": jax.random.normal(jax.random.PRNGKey(2), (3, 128, 32))}
    q = quantize_dense(p, bits=8, group_size=64)
    assert q["kernel_scale"].shape == (3, 2, 32)
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 128))
    y_full = x @ p["kernel"][1]
    y_q = dense({k: v[1] for k, v in q.items()}, x)
    rel = float(jnp.linalg.norm(y_full - y_q) / jnp.linalg.norm(y_full))
    assert rel < 0.02


def test_grouped_quant_ignores_w8a8():
    """Grouped scales take the dequant path even with W8A8 on (the int8
    MXU path only supports per-channel scales)."""
    from flux_generator_tpu.ops.linear import set_w8a8

    set_w8a8(True)
    try:
        _check_grouped_ignores_w8a8()
    finally:
        set_w8a8(None)


def _check_grouped_ignores_w8a8():
    p = init_dense(jax.random.PRNGKey(0), 512, 64)
    q = quantize_dense(p, bits=8, group_size=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 512))
    rel = float(
        jnp.linalg.norm(dense(p, x) - dense(q, x)) / jnp.linalg.norm(dense(p, x))
    )
    assert rel < 0.01


def test_packed_int4_roundtrip_exact():
    """pack_int4/unpack_int4 must be bit-exact inverses over [-8, 7]."""
    from flux_generator_tpu.ops.quant import pack_int4, unpack_int4

    q = jax.random.randint(jax.random.PRNGKey(0), (3, 64, 10), -8, 8)
    packed = pack_int4(q)
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 32, 10)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(q))


def test_packed_int4_dense_matches_native_int4():
    """dense() through kernel_q4 (nibble-packed uint8, split layout) must
    equal the native int4 path up to fp summation order — the split path
    contracts the two input halves as separate matmuls."""
    p = init_dense(jax.random.PRNGKey(0), 512, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 512))
    for gs in (None, 128):
        native = quantize_dense(p, bits=4, group_size=gs)
        packed = quantize_dense(p, bits=4, group_size=gs, pack=True)
        assert "kernel_q4" in packed and packed["kernel_q4"].dtype == jnp.uint8
        np.testing.assert_allclose(
            np.asarray(dense(native, x)), np.asarray(dense(packed, x)),
            atol=1e-5, rtol=1e-5,
        )


def test_quantize_tree_predicate():
    tree = {
        "big": init_dense(jax.random.PRNGKey(0), 512, 8),
        "small": init_dense(jax.random.PRNGKey(1), 8, 8),
    }
    q = quantize_tree(tree)
    assert "kernel_q" in q["big"] and "kernel" in q["small"]


def test_remat_dots_policy_same_loss_and_grads():
    """FGT_REMAT_POLICY=dots (save matmul outputs, recompute elementwise)
    must be a pure scheduling change: loss and grads identical to the
    full per-block remat it trades memory against (r5 training lever)."""
    from flux_generator_tpu.models.flux.model import (
        flux_forward, init_flux, tiny_flux_config,
    )
    from flux_generator_tpu.pipelines.flux import latent_ids, pack_latents
    from flux_generator_tpu.runtime.config import set_remat_policy

    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, h, w = 1, 4, 4
    img = pack_latents(
        jax.random.normal(jax.random.PRNGKey(1), (b, h, w, cfg.in_channels // 4)))
    ids = latent_ids(b, h, w)
    txt = jax.random.normal(jax.random.PRNGKey(2), (b, 3, cfg.context_in_dim))
    vec = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.vec_in_dim))

    def loss(p):
        out = flux_forward(p, cfg, img, ids, txt, jnp.zeros((b, 3, 3), jnp.int32),
                           jnp.full((b,), 0.5), vec, remat=True)
        return jnp.mean(out ** 2)

    results = {}
    for pol in ("block", "dots"):
        set_remat_policy(pol)
        try:
            results[pol] = jax.jit(jax.value_and_grad(loss))(params)
        finally:
            set_remat_policy(None)
    l_b, g_b = results["block"]
    l_d, g_d = results["dots"]
    assert float(l_b) == float(l_d)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7),
        g_b, g_d,
    )
