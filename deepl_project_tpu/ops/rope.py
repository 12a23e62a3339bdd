"""Axial 2D rotary position embeddings (shape-polymorphic).

This is what enables train@256 → infer@512/1024 resolution extrapolation
(ref: transvae/modules/attention.py:107-199, SURVEY.md §5 "long-context").

Design for TPU/XLA: the sin/cos tables are a pure function of the *static*
(H, W, head_dim) trace-time shapes, so under ``jit`` they are computed once at
trace time and constant-folded — the runtime cost is only the fused multiply-adds
of the rotation, which XLA folds into the surrounding projection matmuls. No
caching machinery is needed (the reference recomputed them per call at runtime;
ref: attention.py:149-174, defect SURVEY.md §2.9.7).

Rotation map — two selectable pairings:

- ``pairing='reference'`` (default): replicates the reference exactly — the
  second output of each pair takes its sin/cos from the *odd* table entries
  (out2 = x1*sin_b + x2*cos_b; ref: attention.py:176-198). Because the frequency
  layout is [y_freqs, y_freqs, x_freqs, x_freqs], adjacent pair entries hold
  *different* frequencies, so this is not a pure rotation and does NOT exactly
  preserve the relative-position property — but it is what reference checkpoints
  were trained with, so it is required for weight-level parity.
- ``pairing='standard'``: a proper rotation (both outputs of a pair share the
  even-entry angle), which exactly preserves the relative-position property —
  the better choice for models trained from scratch in this framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _rope2d_tables_np(head_dim: int, height: int, width: int):
    """Build (cos_a, sin_a, cos_b, sin_b), each [H*W, head_dim//2], as numpy.

    Cached per static shape so repeated traces (e.g. multiple resolutions in one
    process) don't rebuild. a/b are the even/odd entries of the interleaved
    frequency embedding (ref: attention.py:157-174).
    """
    import numpy as np

    assert head_dim % 4 == 0, "head_dim must be divisible by 4 for axial 2D RoPE"
    dim_axis = head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim_axis, 2, dtype=np.float64) / dim_axis))
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    y = yy.reshape(-1).astype(np.float64)  # [N]
    x = xx.reshape(-1).astype(np.float64)
    y_freqs = np.outer(y, inv_freq)  # [N, dim_axis//2]
    x_freqs = np.outer(x, inv_freq)
    # emb layout: [y_freqs, y_freqs, x_freqs, x_freqs]  -> [N, head_dim]
    emb = np.concatenate([y_freqs, y_freqs, x_freqs, x_freqs], axis=-1)
    a = emb[:, 0::2]  # even-index entries  [N, head_dim//2]
    b = emb[:, 1::2]  # odd-index entries
    f32 = np.float32
    return (np.cos(a).astype(f32), np.sin(a).astype(f32),
            np.cos(b).astype(f32), np.sin(b).astype(f32))


def rope2d_tables(head_dim: int, height: int, width: int):
    """Return (cos_a, sin_a, cos_b, sin_b) as jnp arrays, each [H*W, head_dim//2]."""
    return tuple(jnp.asarray(t) for t in _rope2d_tables_np(head_dim, height, width))


def apply_rope2d(x: jax.Array, height: int, width: int,
                 pairing: str = "reference") -> jax.Array:
    """Apply the 2D rotary map.

    Args:
      x: [B, N, num_heads, head_dim] with N = height*width.
      pairing: 'reference' (exact reference semantics) or 'standard' (true
        rotation; exact relative-position property).
    Returns: same shape/dtype.
    """
    head_dim = x.shape[-1]
    cos_a, sin_a, cos_b, sin_b = rope2d_tables(head_dim, height, width)
    if pairing == "standard":
        cos_b, sin_b = cos_a, sin_a
    elif pairing != "reference":
        raise ValueError(f"Unknown rope pairing: {pairing!r}")
    # Broadcast tables over batch and heads: [N, 1, hd//2] against [B, N, nh, hd//2].
    cos_a = cos_a[:, None, :]
    sin_a = sin_a[:, None, :]
    cos_b = cos_b[:, None, :]
    sin_b = sin_b[:, None, :]
    x32 = x.astype(jnp.float32)
    x1 = x32[..., 0::2]
    x2 = x32[..., 1::2]
    out1 = x1 * cos_a - x2 * sin_a
    out2 = x1 * sin_b + x2 * cos_b
    out = jnp.stack([out1, out2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
