"""Frozen teacher networks for the VF alignment loss.

The reference uses a frozen DINOv2 reached through torch.hub/transformers
(ref: patched vae_loss.py:143-147: resize target to 224, extract features).
Here the teacher is any callable ``images_nhwc[0,1] -> features_nhwc`` so the
loss stays pure; this module provides:

- ``DinoV2Teacher``: HF-transformers FlaxDinov2 wrapper (needs local weights —
  zero-egress environments must pre-download; gated).
- ``make_resize_teacher``: adapts any backbone fn by adding the 224-resize.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_resize_teacher(backbone: Callable, size: int = 224) -> Callable:
    """Wrap a feature fn with the reference's bilinear resize-to-224."""

    def teacher(images: jax.Array) -> jax.Array:
        b, h, w, c = images.shape
        x = jax.image.resize(images.astype(jnp.float32), (b, size, size, c),
                             method="bilinear")
        return backbone(x)

    return teacher


def dinov2_available(model_name: str = "facebook/dinov2-base") -> bool:
    try:
        from transformers import AutoConfig

        AutoConfig.from_pretrained(model_name, local_files_only=True)
        return True
    except Exception:
        return False


class DinoV2Teacher:
    """Frozen DINOv2 feature-map extractor (patch tokens reshaped to a grid).

    feature_dim is exposed for the eager VF projection
    (training.make_vf_proj_params).
    """

    def __init__(self, model_name: str = "facebook/dinov2-base"):
        from transformers import FlaxAutoModel

        self.model = FlaxAutoModel.from_pretrained(model_name,
                                                   local_files_only=True)
        self.feature_dim = self.model.config.hidden_size
        self.patch = self.model.config.patch_size
        # ImageNet normalization (DINOv2 preprocessing).
        self._mean = jnp.asarray([0.485, 0.456, 0.406])
        self._std = jnp.asarray([0.229, 0.224, 0.225])

    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] in [0,1] → [B, H/p, W/p, hidden] patch grid."""
        b, h, w, _ = images.shape
        x = (images.astype(jnp.float32) - self._mean) / self._std
        out = self.model(pixel_values=x.transpose(0, 3, 1, 2))
        tokens = out.last_hidden_state[:, 1:, :]  # drop CLS
        gh, gw = h // self.patch, w // self.patch
        return jax.lax.stop_gradient(
            tokens.reshape(b, gh, gw, self.feature_dim))


def make_dino_teacher(model_name: str = "facebook/dinov2-base",
                      resize: int = 224) -> Callable | None:
    """Build the reference's VF teacher (resize→DINOv2) or None when the
    pretrained weights aren't locally available."""
    if not dinov2_available(model_name):
        return None
    teacher = DinoV2Teacher(model_name)
    fn = make_resize_teacher(teacher, resize)
    fn.feature_dim = teacher.feature_dim  # type: ignore[attr-defined]
    return fn
