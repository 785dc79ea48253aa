"""Image output helpers (grid save parity: txt2image.py:129-148)."""

from __future__ import annotations

import numpy as np


def to_pil(images):
    """(B, H, W, 3) float [0,1] → list of PIL Images."""
    from PIL import Image

    arr = np.asarray(images, dtype=np.float32)
    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return [Image.fromarray(a) for a in arr]


def save_image_grid(path: str, images, rows: int = 1):
    """Assemble a rows×cols grid PNG from (B, H, W, 3) float images."""
    from PIL import Image

    arr = np.asarray(images, dtype=np.float32)
    b, h, w, c = arr.shape
    cols = (b + rows - 1) // rows
    grid = np.zeros((rows * h, cols * w, c), np.float32)
    for i in range(b):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = arr[i]
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(path)
