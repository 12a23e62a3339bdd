"""Latent-space diagnostics (paper Table 2(b): Density CV / Normalized
Entropy / Gini) and a linear-probe harness (Table 2(a) linear-probe accuracy).

The reference repo has no code for these (they come from the paper's private
eval pipeline; SURVEY.md §6); implementations here use the standard
definitions: statistics of the latent-value histogram mass for the
distribution metrics, and a single linear layer trained on spatially-pooled
latents for the probe.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax


def latent_histogram(latents: np.ndarray, bins: int = 256,
                     value_range: tuple = (-5.0, 5.0)) -> np.ndarray:
    """Normalized histogram of latent values (all dims pooled)."""
    hist, _ = np.histogram(np.asarray(latents).ravel(), bins=bins,
                           range=value_range)
    p = hist.astype(np.float64)
    return p / max(p.sum(), 1)


def density_cv(latents: np.ndarray, bins: int = 256) -> float:
    """Coefficient of variation of occupied histogram mass — 0 for a uniform
    occupancy, larger = peakier/clumpier latent density."""
    p = latent_histogram(latents, bins)
    occupied = p[p > 0]
    return float(occupied.std() / max(occupied.mean(), 1e-12))

def normalized_entropy(latents: np.ndarray, bins: int = 256) -> float:
    """Shannon entropy of the value histogram / log(bins) ∈ [0, 1]."""
    p = latent_histogram(latents, bins)
    nz = p[p > 0]
    return float(-(nz * np.log(nz)).sum() / np.log(bins))


def gini(latents: np.ndarray, bins: int = 256) -> float:
    """Gini coefficient of histogram mass ∈ [0, 1]; 0 = perfectly uniform."""
    p = np.sort(latent_histogram(latents, bins))
    n = len(p)
    cum = np.cumsum(p)
    return float((n + 1 - 2 * (cum / cum[-1]).sum()) / n)


def latent_diagnostics(latents: np.ndarray, bins: int = 256) -> dict:
    return {"density_cv": density_cv(latents, bins),
            "normalized_entropy": normalized_entropy(latents, bins),
            "gini": gini(latents, bins)}


def linear_probe(features: np.ndarray, labels: np.ndarray,
                 num_classes: int, steps: int = 500, lr: float = 1e-2,
                 val_fraction: float = 0.2, seed: int = 0) -> dict:
    """Train a linear classifier on [N, D] features; returns train/val accuracy.

    The TPU analogue of the paper's linear-probe protocol: features are
    typically spatially-mean-pooled latents (use ``pool_latents``).
    """
    rng = np.random.default_rng(seed)
    n = len(features)
    order = rng.permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, train_idx = order[:n_val], order[n_val:]
    xtr = jnp.asarray(features[train_idx], jnp.float32)
    ytr = jnp.asarray(labels[train_idx])
    xva = jnp.asarray(features[val_idx], jnp.float32)
    yva = jnp.asarray(labels[val_idx])

    d = features.shape[1]
    params = {"w": jnp.zeros((d, num_classes), jnp.float32),
              "b": jnp.zeros((num_classes,), jnp.float32)}
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = xtr @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, ytr).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)

    def acc(x, y):
        pred = jnp.argmax(x @ params["w"] + params["b"], axis=-1)
        return float(jnp.mean((pred == y).astype(jnp.float32)))

    return {"train_acc": acc(xtr, ytr), "val_acc": acc(xva, yva),
            "final_loss": float(loss)}


def pool_latents(model, params, batches: Iterator[np.ndarray]) -> np.ndarray:
    """Spatially-mean-pooled mu latents for probing: [N, latent_dim]."""
    model_params = params["model"] if isinstance(params, dict) and "model" in params else params

    @jax.jit
    def encode(p, x):
        mu, _ = model.apply({"params": p}, x, method="encode")
        return jnp.mean(mu.astype(jnp.float32), axis=(1, 2))

    feats = [np.asarray(encode(model_params, jnp.asarray(b))) for b in batches]
    return np.concatenate(feats)
