"""Orbax train-state checkpointing + UI static checks (reference test_ui.py
analog: the UI must be self-contained HTML, no Gradio)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_orbax_train_state_roundtrip(tmp_path):
    import optax

    from flux_generator_tpu.training.checkpoints import (
        load_train_state,
        save_train_state,
    )

    params = {"a": {"kernel": jnp.ones((4, 4)), "lora_a": jnp.full((4, 2), 0.5)}}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    save_train_state(tmp_path / "ckpt", 7, params, opt_state)
    restored = load_train_state(tmp_path / "ckpt", params, opt_state)
    assert restored is not None
    step, p2, os2 = restored
    assert step == 7
    np.testing.assert_array_equal(np.asarray(p2["a"]["lora_a"]), 0.5)


def test_load_train_state_missing_dir(tmp_path):
    from flux_generator_tpu.training.checkpoints import load_train_state

    assert load_train_state(tmp_path / "nope", {}, {}) is None


def test_ui_is_self_contained():
    from flux_generator_tpu.server import ui

    assert "gradio" not in ui.INDEX_HTML.lower()
    assert "<style>" in ui.INDEX_HTML  # has CSS (reference test_ui.py:47-52)
    assert "/sdapi/v1/txt2img" in ui.INDEX_HTML
    assert "/api/music" in ui.INDEX_HTML
    # no external asset loads — works offline
    assert "http://" not in ui.INDEX_HTML and "https://" not in ui.INDEX_HTML
