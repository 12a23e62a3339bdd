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


def make_stub_teacher(feature_dim: int = 768, patch: int = 14,
                      resize: int = 224, seed: int = 0) -> Callable:
    """Deterministic weight-free VF teacher: fixed random patch projection.

    Keeps the VF path (eager projection, cosine-margin loss, optimizer
    updates of vf_proj) runnable and testable end-to-end in zero-egress
    environments where DINOv2 weights can't be fetched. It is a *stand-in
    feature extractor*, not a semantic teacher — quality parity still needs
    real DINOv2 — but the training graph is identical: same shapes
    ([B, 224/p, 224/p, feature_dim] patch grid), same stop-gradient, same
    projection geometry. Ref: patched vae_loss.py:119-196."""
    key = jax.random.PRNGKey(seed)
    proj = jax.random.normal(
        key, (patch * patch * 3, feature_dim), jnp.float32)
    proj = proj / jnp.sqrt(patch * patch * 3)

    def backbone(x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        gh, gw = h // patch, w // patch
        patches = x[:, : gh * patch, : gw * patch, :].reshape(
            b, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh, gw, patch * patch * c)
        return jax.lax.stop_gradient(patches @ proj)

    fn = make_resize_teacher(backbone, resize)
    fn.feature_dim = feature_dim  # type: ignore[attr-defined]
    return fn


def make_vf_teacher(model_name: str = "facebook/dinov2-base",
                    allow_stub: bool = True) -> Callable | None:
    """The teacher the training CLI uses: DINOv2 when locally available,
    otherwise the deterministic stub (with a warning) so --vf_weight > 0
    always constructs a working VF path."""
    fn = make_dino_teacher(model_name)
    if fn is not None:
        return fn
    if not allow_stub:
        return None
    print("[teachers] WARNING: DINOv2 weights not locally available; using "
          "the deterministic stub teacher (VF path exercised, semantics "
          "need real weights)")
    return make_stub_teacher()
