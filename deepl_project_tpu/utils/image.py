"""Image/layout helpers: NCHW↔NHWC interop with reference-formatted data,
grid assembly and PNG saving for eval/generation outputs."""

from __future__ import annotations

import numpy as np


def nchw_to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[0,1] float → uint8 with round-half-away like PIL expects."""
    return np.clip(np.asarray(img, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2,
              pad_value: float = 1.0) -> np.ndarray:
    """Tile [N, H, W, C] images into one [gh, gw, C] grid (torchvision-style)."""
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.full((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    return grid


def save_image(img: np.ndarray, path: str) -> None:
    """Save [H,W,C] float [0,1] (or uint8) to disk."""
    from PIL import Image

    arr = img if img.dtype == np.uint8 else to_uint8(img)
    Image.fromarray(arr).save(path)


def save_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    save_image(make_grid(np.asarray(images), nrow=nrow), path)
