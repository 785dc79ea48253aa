import jax
import jax.numpy as jnp
import numpy as np

from flux_generator_tpu.models.flux.model import flux_forward, init_flux, tiny_flux_config
from flux_generator_tpu.training.lora import (

    apply_lora_to_flux,
    fuse_lora,
    lora_block_mask,
    lora_only_filter,
)
import pytest

# full-matrix tier: wall time exceeds the quick-tier budget
pytestmark = pytest.mark.slow


def _inputs(cfg, b=1, l_img=4, l_txt=2):
    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 3)
    return (
        jax.random.normal(ks[0], (b, l_img, cfg.in_channels)),
        jnp.zeros((b, l_img, 3), jnp.int32),
        jax.random.normal(ks[1], (b, l_txt, cfg.context_in_dim)),
        jnp.zeros((b, l_txt, 3), jnp.int32),
        jnp.full((b,), 0.5),
        jax.random.normal(ks[2], (b, cfg.vec_in_dim)),
    )


def test_lora_zero_b_is_identity():
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    lp = apply_lora_to_flux(params, rank=2)
    inputs = _inputs(cfg)
    base = flux_forward(params, cfg, *inputs)
    with_lora = flux_forward(lp, cfg, *inputs)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_fuse_matches_unfused():
    cfg = tiny_flux_config()
    params = init_flux(jax.random.PRNGKey(0), cfg)
    lp = apply_lora_to_flux(params, rank=2)
    # make lora_b nonzero so the adapter actually does something
    lp = jax.tree.map(lambda x: x, lp)
    def bump(node):
        if isinstance(node, dict):
            return {
                k: (v + 0.05 if k == "lora_b" else bump(v)) for k, v in node.items()
            }
        return node
    lp = bump(lp)
    inputs = _inputs(cfg)
    unfused = flux_forward(lp, cfg, *inputs)
    fused = fuse_lora(lp)
    # fused tree must contain no lora keys
    leaves_with_lora = [
        p for p in jax.tree_util.tree_leaves_with_path(fused)
        if "lora" in "/".join(str(k) for k in p[0])
    ]
    assert not leaves_with_lora
    fused_out = flux_forward(fused, cfg, *inputs)
    np.testing.assert_allclose(np.asarray(unfused), np.asarray(fused_out), atol=1e-4)
    base_out = flux_forward(params, cfg, *inputs)
    assert np.abs(np.asarray(fused_out) - np.asarray(base_out)).max() > 1e-5


def test_lora_filter_marks_only_lora():
    cfg = tiny_flux_config()
    params = apply_lora_to_flux(init_flux(jax.random.PRNGKey(0), cfg), rank=2)
    filt = lora_only_filter(params)
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_f = jax.tree_util.tree_leaves(filt)
    n_true = sum(bool(f) for f in flat_f)
    n_lora = sum(
        1 for p, _ in flat_p if "lora" in "/".join(str(k) for k in p)
    )
    assert n_true == n_lora > 0


def test_lora_block_mask_last_n():
    cfg = tiny_flux_config(depth=2, depth_single_blocks=2)
    params = apply_lora_to_flux(init_flux(jax.random.PRNGKey(0), cfg), rank=2)
    mask = lora_block_mask(params, num_blocks=1, depth=2, depth_single=2)
    # only the LAST single block trains
    sgl = mask["single_blocks"]["linear1"]["lora_a"]
    np.testing.assert_array_equal(np.asarray(sgl).reshape(2), [0.0, 1.0])
    dbl = mask["double_blocks"]["img_attn"]["qkv"]["lora_a"]
    np.testing.assert_array_equal(np.asarray(dbl).reshape(2), [0.0, 0.0])
