"""Latent diagnostics, linear probe, and FID machinery tests."""

import numpy as np
import pytest

from deepl_project_tpu.utils.fid import (feature_statistics, fid_from_features,
                                         frechet_distance)
from deepl_project_tpu.utils.latent_metrics import (density_cv, gini,
                                                    latent_diagnostics,
                                                    linear_probe,
                                                    normalized_entropy,
                                                    pool_latents)


def test_fid_identical_distributions():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 16))
    assert fid_from_features(x, x) == pytest.approx(0.0, abs=1e-6)


def test_fid_shifted_distribution():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 16))
    y = x + 2.0
    # Mean shift of 2 in 16 dims → |mu1-mu2|^2 = 64.
    assert fid_from_features(x, y) == pytest.approx(64.0, rel=0.05)


def test_frechet_known_value():
    mu1, mu2 = np.zeros(4), np.ones(4)
    s = np.eye(4)
    assert frechet_distance(mu1, s, mu2, s) == pytest.approx(4.0, abs=1e-6)


def test_latent_diagnostics_gaussian_vs_degenerate():
    rng = np.random.default_rng(0)
    gauss = rng.normal(size=(10000,))
    point = np.zeros((10000,))  # fully collapsed latent
    dg = latent_diagnostics(gauss)
    dp = latent_diagnostics(point)
    # Collapsed latents: minimal entropy, maximal gini.
    assert dp["normalized_entropy"] < dg["normalized_entropy"]
    assert dp["gini"] > dg["gini"]
    assert 0 <= dg["normalized_entropy"] <= 1
    assert 0 <= dg["gini"] <= 1


def test_linear_probe_separable():
    rng = np.random.default_rng(0)
    n, d = 400, 8
    labels = rng.integers(0, 2, n)
    feats = rng.normal(size=(n, d)) + labels[:, None] * 3.0
    out = linear_probe(feats, labels, num_classes=2, steps=300)
    assert out["val_acc"] > 0.9


def test_pool_latents(rng):
    import jax

    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.models.transvae import init_params

    cfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla").replace(
        depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4, head_dim=16)
    model = TransVAE(cfg)
    params = {"model": init_params(model, jax.random.PRNGKey(0), image_size=16)}
    batches = [np.random.rand(2, 16, 16, 3).astype(np.float32)] * 2
    feats = pool_latents(model, params, iter(batches))
    assert feats.shape == (4, 4)


def test_metric_writer_and_step_timer(tmp_path):
    from deepl_project_tpu.utils.logging import MetricWriter, StepTimer

    w = MetricWriter(str(tmp_path))
    w.scalars(1, {"loss": 0.5, "lr": 1e-4})
    import numpy as np

    w.image(1, "recon", np.zeros((8, 8, 3), np.float32))
    w.flush()
    w.close()
    try:
        import tensorboardX  # noqa: F401

        import os

        assert any(f.startswith("events") for f in os.listdir(tmp_path)), \
            os.listdir(tmp_path)
    except ImportError:
        pass  # writer no-ops gracefully without tensorboardX
    # None log_dir = no-op writer (non-primary ranks).
    MetricWriter(None).scalars(1, {"x": 1.0})

    t = StepTimer(warmup=1)
    for _ in range(3):
        t.tick(4)
    assert t.images_per_sec > 0.0


def test_reference_flops_table():
    # The pinned reference-FLOPs table (bench denominator): resolution
    # scaling is superlinear (attention) and variants grow monotonically.
    from deepl_project_tpu.utils.flops import reference_flops_per_image

    f256 = reference_flops_per_image("large", res=256)
    f512 = reference_flops_per_image("large", res=512)
    assert f256 > 1e12  # ~2.06e12 pinned from the torch reference
    assert 3.0 < f512 / f256 < 7.0
    assert (reference_flops_per_image("tiny", res=256)
            < reference_flops_per_image("base", res=256) < f256)
    import pytest

    with pytest.raises(KeyError):
        reference_flops_per_image("large", res=333)  # unpinned point


def test_step_timer_windowed_rate_recovers_from_stall():
    """images_per_sec is a trailing-window rate: a one-off stall (validation,
    checkpoint save) outside the window does not depress it; window=0 keeps
    the cumulative behavior."""
    import time as _time

    from deepl_project_tpu.utils.logging import StepTimer

    t = StepTimer(warmup=1, window=5)
    t.tick(4)
    for _ in range(3):
        t.tick(4)
        _time.sleep(0.02)
    _time.sleep(0.4)  # stall, then 6 fast ticks push it out of the window
    for _ in range(6):
        t.tick(4)
        _time.sleep(0.02)
    assert t.images_per_sec > 100  # ~4/0.02 = 200; stall would give ~40

    t_cum = StepTimer(warmup=1, window=0)
    t_cum.tick(4)
    for _ in range(3):
        t_cum.tick(4)
        _time.sleep(0.02)
    _time.sleep(0.4)
    t_cum.tick(4)
    assert t_cum.images_per_sec < 100  # cumulative sees the stall
