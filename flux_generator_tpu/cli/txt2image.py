"""Flux CLI (flag parity: txt2image.py in the reference).

python -m flux_generator_tpu.cli.txt2image "PROMPT" [--model schnell|dev]
  [--n-images N] [--image-size WxH] [--steps N] [--guidance G] [--seed S]
  [--adapter FILE [--fuse-adapter]] [--quantize] [--no-t5-padding]
  [--output out.png] [--save-raw] [--verbose]
"""

from __future__ import annotations

import argparse

import numpy as np


def load_adapter(pipeline, adapter_file: str, fuse: bool = False):
    """Load a DreamBooth LoRA adapter safetensors (with lora_rank metadata)
    into the pipeline (parity: txt2image.py:32-39)."""
    from ..training.checkpoints import load_adapter_file

    load_adapter_file(pipeline, adapter_file, fuse=fuse)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate images from a textual prompt using Flux"
    )
    parser.add_argument("prompt")
    parser.add_argument("--model", choices=["schnell", "dev"], default="schnell")
    parser.add_argument("--n-images", type=int, default=4)
    parser.add_argument("--image-size", type=lambda x: tuple(map(int, x.split("x"))),
                        default=(512, 512))
    parser.add_argument("--steps", type=int)
    parser.add_argument("--guidance", type=float, default=4.0)
    parser.add_argument("--n-rows", type=int, default=1)
    parser.add_argument("--decoding-batch-size", type=int, default=1)
    parser.add_argument("--quantize", "-q", action="store_true")
    parser.add_argument("--no-t5-padding", dest="t5_padding", action="store_false")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--adapter")
    parser.add_argument("--fuse-adapter", action="store_true")
    parser.add_argument("--output", default="out.png")
    parser.add_argument("--save-raw", action="store_true")
    parser.add_argument("--verbose", "-v", action="store_true")
    args = parser.parse_args(argv)

    from ..pipelines.flux import FluxPipeline
    from ..utils.images import save_image_grid, to_pil

    pipeline = FluxPipeline.from_pretrained("flux-" + args.model)
    if args.adapter:
        load_adapter(pipeline, args.adapter, fuse=args.fuse_adapter)
    if args.quantize:
        from ..ops.quant import quantize_pipeline

        quantize_pipeline(pipeline)

    steps = args.steps or (50 if args.model == "dev" else 2)
    w, h = args.image_size
    latent_size = (h // 8, w // 8)

    images = []
    for i in range(0, args.n_images, args.decoding_batch_size):
        n = min(args.decoding_batch_size, args.n_images - i)
        batch = pipeline.generate_images(
            args.prompt, n_images=n, num_steps=steps, guidance=args.guidance,
            latent_size=latent_size,
            seed=None if args.seed is None else args.seed + i,
            as_uint8=True,  # pixels quantize on device; 4x smaller fetch
        )
        images.append(np.asarray(batch))
        if args.verbose:
            print(f"generated {i + n}/{args.n_images}", flush=True)
    images = np.concatenate(images, axis=0)

    if args.save_raw:
        pils = to_pil(images)
        stem = args.output.rsplit(".", 1)[0]
        for i, im in enumerate(pils):
            im.save(f"{stem}_{i}.png")
    else:
        save_image_grid(args.output, images, rows=args.n_rows)
    print(f"Saved {args.n_images} image(s) to {args.output}")


if __name__ == "__main__":
    main()
