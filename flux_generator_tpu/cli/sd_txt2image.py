"""SD/SDXL CLI (flag parity: stable_diffusion/txt2image.py)."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate images from a textual prompt using stable diffusion"
    )
    parser.add_argument("prompt")
    parser.add_argument("--model", choices=["sd", "sdxl"], default="sdxl")
    parser.add_argument("--n_images", type=int, default=4)
    parser.add_argument("--steps", type=int)
    parser.add_argument("--cfg", type=float)
    parser.add_argument("--negative_prompt", default="")
    parser.add_argument("--n_rows", type=int, default=1)
    parser.add_argument("--decoding_batch_size", type=int, default=1)
    parser.add_argument("--quantize", "-q", action="store_true")
    parser.add_argument("--preload-models", action="store_true")
    parser.add_argument("--output", default="out.png")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--verbose", "-v", action="store_true")
    args = parser.parse_args(argv)

    from ..pipelines.sd import StableDiffusion, StableDiffusionXL
    from ..utils.images import save_image_grid

    if args.model == "sdxl":
        pipe = StableDiffusionXL.from_pretrained("stabilityai/sdxl-turbo")
        steps = args.steps or 2
        cfg = args.cfg if args.cfg is not None else 0.0
    else:
        pipe = StableDiffusion.from_pretrained("stabilityai/stable-diffusion-2-1-base")
        steps = args.steps or 50
        cfg = args.cfg if args.cfg is not None else 7.5
    if args.quantize:
        from ..ops.quant import quantize_pipeline

        quantize_pipeline(pipe)

    x_t = None
    for x_t in pipe.generate_latents(
        args.prompt, n_images=args.n_images, num_steps=steps, cfg_weight=cfg,
        negative_text=args.negative_prompt, seed=args.seed,
    ):
        pass
    images = []
    for i in range(0, args.n_images, args.decoding_batch_size):
        images.append(np.asarray(pipe.decode_u8(x_t[i : i + args.decoding_batch_size])))
    images = np.concatenate(images, axis=0)
    save_image_grid(args.output, images, rows=args.n_rows)
    print(f"Saved {args.n_images} image(s) to {args.output}")


if __name__ == "__main__":
    main()
