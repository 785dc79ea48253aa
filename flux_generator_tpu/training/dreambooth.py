"""DreamBooth LoRA fine-tuning driver (parity: dreambooth.py in the
reference; flag-compatible CLI).

TPU-native execution model:
  - data parallelism via a ("data", "model") mesh + NamedSharding'd batches;
    GSPMD inserts the gradient all-reduce (the reference calls MPI
    average_gradients explicitly, dreambooth.py:227);
  - optax Adam with linear-warmup→cosine schedule (parity dreambooth.py:185-190),
    masked to LoRA params only;
  - gradient accumulation via the same jitted step with a static
    (is_first, should_step) pair — the functional equivalent of the
    reference's 4 mx.compile'd variants (dreambooth.py:193-252);
  - orbax train-state checkpoints + resume (the reference has none).

python -m flux_generator_tpu.training.dreambooth --model schnell ... DATASET
"""

from __future__ import annotations

import argparse
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_optimizer(learning_rate: float, warmup: int, total: int):
    import optax

    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup),
            optax.cosine_decay_schedule(learning_rate, max(total - warmup, 1)),
        ],
        [warmup],
    )
    # the optimizer sees ONLY the extracted LoRA tree — base weights never
    # enter the optimizer (frozen by construction, not by masking)
    return optax.adam(schedule)


def make_train_step(pipeline, optimizer, base_params, grad_accumulate: int,
                    block_mask=None):
    """Returns a jitted step over the extracted LoRA tree ONLY — gradients
    are never materialized for the (possibly int8-quantized) 12B base, which
    is what lets full-size LoRA fine-tuning fit a single 16 GB chip.
    block_mask (per-leaf 0/1 multipliers over the stacked layer axis)
    restricts LoRA training to the last N blocks — the GSPMD equivalent of
    the reference's linear_to_lora_layers block cut."""
    from .lora import merge_lora

    # base params enter as a jit ARGUMENT (12 GB of closure constants would
    # otherwise be embedded in the lowered program and shipped through the
    # compile path)
    @partial(jax.jit, static_argnames=("is_first", "should_step"))
    def _step(base, lora_params, opt_state, accum, key, x0, t5f, clipf,
              guidance, is_first: bool, should_step: bool):
        def loss_fn(lp):
            return pipeline.training_loss(
                merge_lora(base, lp), key, x0, t5f, clipf, guidance
            )

        loss, grads = jax.value_and_grad(loss_fn)(lora_params)
        if block_mask is not None:
            grads = jax.tree.map(
                lambda g, m: (g * m).astype(g.dtype), grads, block_mask
            )
        if is_first:
            accum = grads
        else:
            accum = jax.tree.map(lambda a, g: a + g, accum, grads)
        if should_step:
            import optax

            mean_grads = jax.tree.map(lambda g: g / grad_accumulate, accum)
            updates, opt_state = optimizer.update(mean_grads, opt_state, lora_params)
            lora_params = optax.apply_updates(lora_params, updates)
            accum = jax.tree.map(jnp.zeros_like, accum)
        return loss, lora_params, opt_state, accum

    def step(lora_params, opt_state, accum, key, x0, t5f, clipf, guidance,
             is_first: bool, should_step: bool):
        return _step(base_params, lora_params, opt_state, accum, key,
                     x0, t5f, clipf, guidance,
                     is_first=is_first, should_step=should_step)

    return step


def generate_progress_images(pipeline, prompt: str, out_dir: Path, step: int,
                             n_images: int = 4, latent_size=(32, 32)):
    """Parity: dreambooth.py:19-43."""
    from ..utils.images import save_image_grid

    images = pipeline.generate_images(
        prompt, n_images=n_images, num_steps=2 if pipeline.schnell else 35,
        latent_size=latent_size, seed=42,
    )
    out_file = out_dir / f"{step:07d}_progress.png"
    save_image_grid(str(out_file), np.asarray(images), rows=1)
    print(f"Saved {out_file}", flush=True)


def train(args, pipeline=None, dataset=None):
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import create_mesh
    from ..parallel.sharding import logical_sharding
    from .checkpoints import save_adapter, save_config
    from .datasets import load_dataset
    from .lora import apply_lora_to_flux, lora_block_mask
    from .trainer import Trainer

    from ..parallel.distributed import initialize_multihost, process_info

    # multi-host: wire the slice together BEFORE any device queries (no-op
    # for single-process). The GSPMD replacement for the reference's MPI
    # init + per-rank seeding (dreambooth.py:175).
    initialize_multihost()
    pinfo = process_info()
    if pinfo["process_count"] > 1:
        print(f"multi-host training: {pinfo}", flush=True)

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if pinfo["process_index"] == 0:
        save_config(output_dir / "adapter_config.json", vars(args))

    if pipeline is None:
        from ..pipelines.flux import FluxPipeline

        pipeline = FluxPipeline.from_pretrained("flux-" + args.model)
    if dataset is None:
        dataset = load_dataset(args.dataset)

    # deterministic LoRA init (parity: dreambooth.py:164-170 seeds before
    # injection so all workers agree)
    flow = apply_lora_to_flux(
        pipeline.params["flow"], rank=args.lora_rank,
        key=jax.random.PRNGKey(0x0F0F0F0F),
    )
    if getattr(args, "quantize_base", False):
        # int8-quantize the FROZEN base so full-size 12B LoRA training fits
        # one 16 GB chip (base 12 GB + bf16 LoRA + remat activations); the
        # adapters stay bf16 and gradients never touch the base
        from ..ops.quant import quantize_tree

        flow = quantize_tree(flow)
        print("quantized frozen base weights to int8", flush=True)
    cfg = pipeline.flow_cfg
    block_mask = lora_block_mask(flow, args.lora_blocks, cfg.depth, cfg.depth_single_blocks)

    # data axis must divide the global batch; drop devices that don't fit
    # (the reference requires the same: one batch shard per MPI rank)
    import math

    n_data = math.gcd(args.batch_size, len(jax.devices()))
    if n_data < len(jax.devices()):
        print(
            f"WARNING: batch size {args.batch_size} not divisible by "
            f"{len(jax.devices())} devices; training on {n_data} device(s)",
            flush=True,
        )
    mesh = create_mesh(data=n_data, model=1,
                       devices=jax.devices()[:n_data])
    flow = jax.device_put(flow, logical_sharding(flow, mesh))
    data_sharding = NamedSharding(mesh, P("data"))
    pipeline.params["flow"] = flow

    # gradients flow ONLY through the extracted LoRA tree; the base (bf16 or
    # int8) is closed over as a constant of the step function
    from .lora import extract_lora, merge_lora

    lora = extract_lora(flow)
    optimizer = build_optimizer(args.learning_rate, args.warmup_steps,
                                args.iterations)
    opt_state = optimizer.init(lora)
    start_iter = 0
    if getattr(args, "resume", False):
        from .checkpoints import load_train_state

        restored = load_train_state(output_dir / "ckpt", lora, opt_state)
        if restored is not None:
            start_iter, lora, opt_state = restored
            print(f"Resumed from step {start_iter}", flush=True)
    step_fn = make_train_step(
        pipeline, optimizer, flow, args.grad_accumulate,
        block_mask=extract_lora(block_mask) if args.lora_blocks > 0 else None,
    )

    trainer = Trainer(
        pipeline, dataset, resolution=args.resolution,
        num_augmentations=args.num_augmentations,
    )
    trainer.encode_dataset()

    guidance = jnp.full((args.batch_size,), args.guidance, pipeline.dtype) \
        if cfg.guidance_embed else None
    accum = jax.tree.map(jnp.zeros_like, lora)
    key = jax.random.PRNGKey(0xF0F0F0F0)

    def put(x):
        """Global-batch placement. Single process: plain device_put. Multi
        host: every process iterates the SAME global batch (shared shuffle
        seed) and contributes its process-local rows — GSPMD then treats the
        result as one global array; gradients all-reduce through the mesh."""
        if pinfo["process_count"] == 1:
            return jax.device_put(x, data_sharding)
        n = pinfo["process_count"]
        per = x.shape[0] // n
        lo = pinfo["process_index"] * per
        return jax.make_array_from_process_local_data(
            data_sharding, np.asarray(x[lo:lo + per]), tuple(x.shape)
        )

    losses, tic = [], time.time()
    for i, (x0, t5f, clipf) in zip(
        range(start_iter * args.grad_accumulate, args.iterations * args.grad_accumulate),
        trainer.iterate(args.batch_size),
    ):
        x0 = put(x0)
        t5f = put(t5f)
        clipf = put(clipf)
        is_first = (i % args.grad_accumulate) == 0
        should_step = (i % args.grad_accumulate) == (args.grad_accumulate - 1)
        loss, lora, opt_state, accum = step_fn(
            lora, opt_state, accum, jax.random.fold_in(key, i),
            x0, t5f, clipf, guidance,
            is_first=is_first, should_step=should_step,
        )
        pipeline.params["flow"] = merge_lora(flow, lora)
        losses.append(float(loss))

        opt_step = (i + 1) // args.grad_accumulate
        if should_step and opt_step % 10 == 0:
            toc = time.time()
            print(
                f"Iter: {opt_step} Loss: {np.mean(losses):.5f} "
                f"It/s: {10 * args.grad_accumulate / (toc - tic):.3f}",
                flush=True,
            )
            losses, tic = [], toc
        is_main = pinfo["process_index"] == 0  # host 0 owns all file output
        if is_main and should_step and args.progress_every > 0 and opt_step % args.progress_every == 0:
            generate_progress_images(pipeline, args.progress_prompt, output_dir, opt_step)
        if is_main and should_step and args.checkpoint_every > 0 and opt_step % args.checkpoint_every == 0:
            save_adapter(
                output_dir / f"{opt_step:07d}_adapters.safetensors",
                merge_lora(flow, lora), args.lora_rank, args.lora_blocks,
            )
            if getattr(args, "resume", False) or getattr(args, "save_state", False):
                from .checkpoints import save_train_state

                save_train_state(output_dir / "ckpt", opt_step, lora, opt_state)
    # final adapter
    if pinfo["process_index"] == 0:
        save_adapter(output_dir / "final_adapters.safetensors",
                     merge_lora(flow, lora), args.lora_rank, args.lora_blocks)
    return pipeline


def build_parser():
    parser = argparse.ArgumentParser(
        description="Finetune Flux with LoRA (DreamBooth-style)"
    )
    parser.add_argument("dataset")
    parser.add_argument("--model", default="dev", choices=["dev", "schnell"])
    parser.add_argument("--guidance", type=float, default=3.0)
    parser.add_argument("--iterations", type=int, default=600)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--resolution", type=lambda x: tuple(map(int, x.split("x"))),
                        default=(512, 512))
    parser.add_argument("--num-augmentations", type=int, default=5)
    parser.add_argument("--progress-prompt", default="")
    parser.add_argument("--progress-every", type=int, default=50)
    parser.add_argument("--checkpoint-every", type=int, default=50)
    parser.add_argument("--lora-rank", type=int, default=8)
    parser.add_argument("--lora-blocks", type=int, default=-1)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--warmup-steps", type=int, default=100)
    parser.add_argument("--grad-accumulate", type=int, default=4)
    parser.add_argument("--output-dir", default="tpu_output")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest orbax train-state checkpoint")
    parser.add_argument("--save-state", action="store_true",
                        help="write orbax train-state checkpoints alongside adapters")
    parser.add_argument("--quantize-base", action="store_true",
                        help="int8-quantize the frozen base weights — fits "
                             "full 12B LoRA training on one 16 GB chip")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.progress_prompt:
        args.progress_prompt = "photo"
    train(args)


if __name__ == "__main__":
    main()
