"""img2img CLI (flag parity: stable_diffusion/image2image.py)."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Modify an image given a prompt (img2img)"
    )
    parser.add_argument("image")
    parser.add_argument("prompt")
    parser.add_argument("--model", choices=["sd", "sdxl"], default="sdxl")
    parser.add_argument("--strength", type=float, default=0.9)
    parser.add_argument("--n_images", type=int, default=4)
    parser.add_argument("--steps", type=int)
    parser.add_argument("--cfg", type=float)
    parser.add_argument("--negative_prompt", default="")
    parser.add_argument("--n_rows", type=int, default=1)
    parser.add_argument("--output", default="out.png")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--verbose", "-v", action="store_true")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from ..pipelines.sd import StableDiffusion, StableDiffusionXL
    from ..utils.images import save_image_grid

    img = Image.open(args.image)
    # snap to 64px like the reference (image2image.py:80-84)
    w, h = img.size
    w = 64 * (w // 64)
    h = 64 * (h // 64)
    img = img.resize((w, h))
    arr = jnp.asarray(np.array(img.convert("RGB")), jnp.float32) / 255 * 2 - 1

    if args.model == "sdxl":
        pipe = StableDiffusionXL.from_pretrained("stabilityai/sdxl-turbo")
        steps = args.steps or 2
        cfg = args.cfg if args.cfg is not None else 0.0
    else:
        pipe = StableDiffusion.from_pretrained("stabilityai/stable-diffusion-2-1-base")
        steps = args.steps or 50
        cfg = args.cfg if args.cfg is not None else 7.5

    x_t = None
    for x_t in pipe.generate_latents_from_image(
        arr, args.prompt, n_images=args.n_images, strength=args.strength,
        num_steps=steps, cfg_weight=cfg, negative_text=args.negative_prompt,
        seed=args.seed,
    ):
        pass
    images = np.concatenate(
        [np.asarray(pipe.decode_u8(x_t[i : i + 1])) for i in range(args.n_images)], axis=0
    )
    save_image_grid(args.output, images, rows=args.n_rows)
    print(f"Saved to {args.output}")


if __name__ == "__main__":
    main()
