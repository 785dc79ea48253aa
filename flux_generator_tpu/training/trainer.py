"""Dataset pre-encoding + batch iteration (parity: flux/trainer.py).

Pre-encodes every image (with N random crop/pan augmentations in [0.8, 1.0]
scale) to VAE latents and every prompt to T5/CLIP features, then serves an
infinite shuffled batch stream mapping augmentation index → caption index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Trainer:
    def __init__(self, flux, dataset, resolution=(512, 512), num_augmentations: int = 5,
                 seed: int = 0):
        self.flux = flux
        self.dataset = dataset
        self.resolution = tuple(resolution)
        self.num_augmentations = num_augmentations
        self.rng = np.random.RandomState(seed)
        self.latents = []
        self.t5_features = []
        self.clip_features = []

    def _random_crop_resize(self, img):
        from PIL import Image

        resolution = self.resolution
        width, height = img.size
        a, b, c, d = self.rng.uniform(size=4)

        crop_size = (
            max((0.8 + 0.2 * a) * width, resolution[0]),
            max((0.8 + 0.2 * b) * height, resolution[1]),
        )
        pan = (width - crop_size[0], height - crop_size[1])
        img = img.crop(
            (pan[0] * c, pan[1] * d, crop_size[0] + pan[0] * c, crop_size[1] + pan[1] * d)
        )

        width, height = crop_size
        ratio = resolution[0] / resolution[1]
        r1 = (height * ratio, height)
        r2 = (width, width / ratio)
        r = r1 if r1[0] <= width else r2
        img = img.crop(
            (
                (width - r[0]) / 2,
                (height - r[1]) / 2,
                (width + r[0]) / 2,
                (height + r[1]) / 2,
            )
        )
        return np.array(img.resize(resolution, Image.LANCZOS))

    def _encode_image(self, input_img, num_augmentations: int):
        for _ in range(num_augmentations):
            img = self._random_crop_resize(input_img)
            img = jnp.asarray(img[:, :, :3], self.flux.dtype) / 255 * 2 - 1
            x_0 = self.flux._encode_image(self.flux.params, img[None])
            self.latents.append(np.asarray(x_0.astype(self.flux.dtype)))

    def _encode_prompt(self, prompt: str):
        t5_tok, clip_tok = self.flux.tokenize([prompt])
        txt, _, vec = self.flux.prepare_conditioning(1, t5_tok, clip_tok)
        self.t5_features.append(np.asarray(txt))
        self.clip_features.append(np.asarray(vec))

    def encode_dataset(self):
        from tqdm import tqdm

        for image, prompt in tqdm(self.dataset, desc="encode dataset"):
            self._encode_image(image, self.num_augmentations)
            self._encode_prompt(prompt)

    def iterate(self, batch_size: int):
        xs = np.concatenate(self.latents)
        t5 = np.concatenate(self.t5_features)
        clip = np.concatenate(self.clip_features)
        n_aug = self.num_augmentations
        while True:
            x_indices = self.rng.permutation(len(self.latents))
            c_indices = x_indices // n_aug
            for i in range(0, len(self.latents), batch_size):
                x_i = x_indices[i : i + batch_size]
                c_i = c_indices[i : i + batch_size]
                yield (
                    jnp.asarray(xs[x_i]),
                    jnp.asarray(t5[c_i]),
                    jnp.asarray(clip[c_i]),
                )
