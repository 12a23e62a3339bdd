"""Host-side image transforms (PIL/numpy — no torch).

Matches the reference pipeline Resize(res) → CenterCrop(res) → ToTensor() → [0,1]
(ref: train.py:396-400; the patched/working pipeline keeps [0,1] targets with
sigmoid-in-loss, ref: train_working.py:246-250). Output is NHWC float32 — the
TPU-native layout.
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def resize_shorter_side(img: "Image.Image", size: int) -> "Image.Image":
    """torchvision.Resize(int) semantics: shorter side → size, keep aspect."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def center_crop(img: "Image.Image", size: int) -> "Image.Image":
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def to_array(img: "Image.Image") -> np.ndarray:
    """RGB uint8 → float32 [0,1], HWC."""
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.uint8).astype(np.float32) / 255.0


def preprocess_image(img: "Image.Image", resolution: int = 256) -> np.ndarray:
    """Full reference transform: resize → center crop → [0,1] float HWC."""
    img = resize_shorter_side(img, resolution)
    img = center_crop(img, resolution)
    return to_array(img)


def preprocess_file(path: str, resolution: int = 256) -> np.ndarray:
    with Image.open(path) as img:
        return preprocess_image(img, resolution)
