"""rFID (reconstruction FID) machinery.

The reference reports rFID from the paper's eval pipeline (SURVEY.md §6);
computing it requires a pretrained InceptionV3. This module implements the
statistics + Fréchet distance natively (numpy/JAX) with a pluggable feature
extractor; the Inception weights are converter-gated like LPIPS (zero-egress
environments can't download them — convert once with
scripts/convert_inception_weights.py on any machine with torchvision).

With no weights present, ``fid_from_features`` still serves latent-space FID
between arbitrary feature sets (useful for latent-distribution diagnostics,
paper Table 2(b)).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import scipy.linalg


def feature_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of [N, D] features."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """FID = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))."""
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    return frechet_distance(*feature_statistics(real),
                            *feature_statistics(fake))


def rfid(real_batches: Iterator[np.ndarray], recon_batches: Iterator[np.ndarray],
         feature_fn: Callable[[np.ndarray], np.ndarray]) -> float:
    """Reconstruction FID over paired batch streams using ``feature_fn``
    (e.g. an InceptionV3 pool3 extractor, or any perceptual embedding)."""
    real_feats, fake_feats = [], []
    for r, f in zip(real_batches, recon_batches):
        real_feats.append(np.asarray(feature_fn(r)))
        fake_feats.append(np.asarray(feature_fn(f)))
    return fid_from_features(np.concatenate(real_feats),
                             np.concatenate(fake_feats))
