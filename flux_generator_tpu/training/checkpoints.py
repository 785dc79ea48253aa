"""Adapter + train-state checkpointing.

Adapter files: safetensors holding the stacked LoRA tensors under their
canonical dotted paths, with lora_rank / lora_blocks metadata — same
metadata contract as the reference (dreambooth.py:46-59), different (stacked)
tensor layout, documented in the file's "format" metadata.

Train-state checkpoints (orbax): full optimizer state + step — the resume
path the reference lacks (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def extract_lora_flat(flow_params) -> dict:
    flat = _flatten(flow_params)
    return {k: v for k, v in flat.items() if k.endswith((".lora_a", ".lora_b"))}


def save_adapter(path, flow_params, rank: int, num_blocks: int):
    """Write LoRA adapter safetensors with metadata (dreambooth.py:46-59)."""
    from safetensors.numpy import save_file

    flat = extract_lora_flat(flow_params)
    flat = {k: np.asarray(v, np.float32) for k, v in flat.items()}
    save_file(
        flat,
        str(path),
        metadata={
            "lora_rank": str(rank),
            "lora_blocks": str(num_blocks),
            "format": "flux_generator_tpu.stacked.v1",
        },
    )


def load_adapter_file(pipeline, path, fuse: bool = False):
    """Load an adapter into a FluxPipeline: inject LoRA at the recorded rank,
    overwrite lora tensors, optionally fuse (parity: txt2image.py:32-39)."""
    from safetensors import safe_open

    from .lora import apply_lora_to_flux, fuse_lora

    with safe_open(str(path), framework="np") as f:
        meta = f.metadata() or {}
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    rank = int(meta.get("lora_rank", 8))

    flow = pipeline.params["flow"]
    if "lora_a" not in str(jax.tree_util.tree_structure(flow)):
        flow = apply_lora_to_flux(flow, rank=rank)

    def walk(node, prefix=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                full = f"{prefix}{k}"
                if k in ("lora_a", "lora_b") and full in tensors:
                    out[k] = jnp.asarray(tensors[full], node[k].dtype)
                else:
                    out[k] = walk(v, full + ".")
            return out
        if isinstance(node, list):
            return [walk(v, f"{prefix}{i}.") for i, v in enumerate(node)]
        return node

    flow = walk(flow)
    if fuse:
        flow = fuse_lora(flow)
    pipeline.params["flow"] = flow
    return pipeline


def save_config(path, config: dict):
    """Sorted-JSON training config (parity: flux/utils.py:213-230)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    to_save = {k: config[k] for k in sorted(config) if isinstance(
        config[k], (bool, int, float, str, list, tuple, type(None))
    )}
    with open(path, "w") as f:
        json.dump(to_save, f, indent=2, sort_keys=True)


# ------------------------------------------------------------ orbax resume


def save_train_state(ckpt_dir, step: int, flow_params, opt_state):
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        mngr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(flow_params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )


def load_train_state(ckpt_dir, flow_template, opt_template):
    """Returns (step, params, opt_state) from the latest checkpoint, or None."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    if not ckpt_dir.exists():
        return None
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step()
        if step is None:
            return None
        restored = mngr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(flow_template),
                opt_state=ocp.args.StandardRestore(opt_template),
            ),
        )
    return step, restored["params"], restored["opt_state"]
