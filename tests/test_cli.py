"""End-to-end CLI tests on tiny synthetic runs: train → checkpoint → evaluate →
generate, plus the smoke-test runner and evaluation harness functions."""

import json
import os

import jax
import numpy as np
import pytest

from deepl_project_tpu import TransVAE, get_config
from deepl_project_tpu.evaluation import (evaluate_model, extrapolation_sweep,
                                          generate_interpolation,
                                          generate_random, reconstruct)
from deepl_project_tpu.models.transvae import init_params


def micro_cfg():
    return get_config("tiny_f16d32", dtype="float32", attention_impl="xla").replace(
        depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4, head_dim=16)


@pytest.fixture(scope="module")
def model_and_params():
    model = TransVAE(micro_cfg())
    params = {"model": init_params(model, jax.random.PRNGKey(0), image_size=16)}
    return model, params


def test_evaluate_model_harness(tmp_path, model_and_params):
    model, params = model_and_params
    batches = [np.random.rand(2, 16, 16, 3).astype(np.float32)
               for _ in range(2)]
    results = evaluate_model(model, params, iter(batches), use_lpips=False,
                             output_dir=str(tmp_path), save_grids=1)
    assert "psnr" in results and "ssim" in results
    assert results["num_images"] == 4
    assert os.path.exists(tmp_path / "metrics.json")
    assert os.path.exists(tmp_path / "comparison_000.png")
    with open(tmp_path / "metrics.json") as f:
        saved = json.load(f)
    assert saved["psnr"]["mean"] == results["psnr"]["mean"]


def test_extrapolation_sweep(model_and_params):
    model, params = model_and_params
    images = np.random.rand(1, 32, 32, 3).astype(np.float32)
    res = extrapolation_sweep(model, params, images, resolutions=(16, 32))
    assert set(res.keys()) == {16, 32}
    assert np.isfinite(res[32]["mean"])


def test_generate_random(model_and_params):
    model, params = model_and_params
    imgs = generate_random(model, params, jax.random.PRNGKey(0),
                           num_samples=2, latent_hw=2)
    # 3-stage micro config → f=4: latent 2x2 decodes to 8x8.
    assert imgs.shape == (2, 8, 8, 3)
    assert imgs.min() >= 0 and imgs.max() <= 1


def test_generate_interpolation(model_and_params):
    model, params = model_and_params
    a = np.random.rand(16, 16, 3).astype(np.float32)
    b = np.random.rand(16, 16, 3).astype(np.float32)
    imgs = generate_interpolation(model, params, a, b, steps=3)
    assert imgs.shape == (3, 16, 16, 3)


def test_reconstruct(model_and_params):
    model, params = model_and_params
    x = np.random.rand(1, 16, 16, 3).astype(np.float32)
    out = reconstruct(model, params, x)
    assert out.shape == x.shape


def test_train_cli_end_to_end(tmp_path):
    from deepl_project_tpu.cli.train import main

    out = str(tmp_path / "run")
    main(["--variant", "tiny", "--data", "synthetic", "--resolution", "32",
          "--batch_size", "2", "--num_epochs", "1", "--steps_per_epoch", "3",
          "--lpips_weight", "0", "--vf_weight", "0", "--warmup_steps", "0",
          "--save_every_epochs", "1", "--log_every", "1",
          "--output_dir", out])
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    # Resume path: evaluate from the saved checkpoint.
    from deepl_project_tpu.cli.evaluate import main as eval_main

    eval_main(["--checkpoint", os.path.join(out, "checkpoints"),
               "--data", "synthetic", "--resolution", "32",
               "--batch_size", "2", "--num_batches", "1", "--no_lpips",
               "--output_dir", str(tmp_path / "eval")])
    assert os.path.exists(tmp_path / "eval" / "metrics.json")


def test_yaml_config_precedence(tmp_path):
    import argparse

    import yaml

    from deepl_project_tpu.cli.train import build_parser, load_yaml_config

    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": {"variant": "base"},
                        "training": {"learning_rate": 5e-5},
                        "losses": {"kl": 1e-6}}, f)
    args = build_parser().parse_args(["--variant", "tiny", "--lr", "1e-4"])
    load_yaml_config(str(cfg_path), args)
    # model section wins over CLI (ref: train.py:116-124)
    assert args.variant == "base"
    assert args.lr == 5e-5
    assert args.kl_weight == 1e-6


def test_smoke_runner():
    from deepl_project_tpu.cli.smoke_test import main

    assert main() == 0


def test_trainer_gan_stage2(tmp_path):
    # --use_gan builds the PatchGAN discriminator path end-to-end.
    from deepl_project_tpu.cli.train import main

    out = str(tmp_path / "gan_run")
    main(["--variant", "tiny", "--data", "synthetic", "--resolution", "32",
          "--batch_size", "2", "--num_epochs", "1", "--steps_per_epoch", "2",
          "--lpips_weight", "0", "--vf_weight", "0", "--warmup_steps", "0",
          "--use_gan", "--gan_weight", "0.05", "--freeze_encoder",
          "--save_every_epochs", "1", "--log_every", "1",
          "--output_dir", out])
    assert os.path.isdir(os.path.join(out, "checkpoints"))


def test_evaluate_with_rfid(model_and_params):
    # No Inception weights file in-repo → VGG-feature fallback; with a
    # converted weights file present the key becomes 'rfid' (InceptionV3).
    model, params = model_and_params
    batches = [np.random.rand(4, 16, 16, 3).astype(np.float32)
               for _ in range(2)]
    results = evaluate_model(model, params, iter(batches), use_lpips=False,
                             compute_rfid=True)
    from deepl_project_tpu.utils.inception import inception_params_available

    key = "rfid" if inception_params_available() else "vgg_rfid"
    assert key in results
    assert np.isfinite(results[key])


def test_stub_teacher_deterministic():
    from deepl_project_tpu.losses.teachers import make_stub_teacher

    t = make_stub_teacher(feature_dim=32, patch=8, resize=32)
    assert t.feature_dim == 32
    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    f1 = np.asarray(t(x))
    f2 = np.asarray(make_stub_teacher(feature_dim=32, patch=8, resize=32)(x))
    assert f1.shape == (2, 4, 4, 32)
    np.testing.assert_array_equal(f1, f2)  # deterministic across builds


def test_train_cli_vf_end_to_end(tmp_path):
    # --vf_weight > 0 with no local DINOv2 → stub teacher; the eager vf_proj
    # must exist in the checkpoint AND have been updated by the optimizer
    # (reference defect §2.9.4: lazy projection never trained).
    from deepl_project_tpu.cli.train import main

    out = str(tmp_path / "vf_run")
    main(["--variant", "tiny", "--data", "shapes", "--resolution", "32",
          "--batch_size", "2", "--num_epochs", "1", "--steps_per_epoch", "2",
          "--lpips_weight", "0", "--vf_weight", "0.1", "--warmup_steps", "0",
          "--eval_every_steps", "2", "--val_batches", "1",
          "--save_every_epochs", "1", "--log_every", "1",
          "--output_dir", out])
    from deepl_project_tpu.training.checkpoint import restore_checkpoint
    from deepl_project_tpu.training.train_step import make_vf_proj_params

    payload, _ = restore_checkpoint(os.path.join(out, "checkpoints"))
    assert "vf_proj" in payload["params"], "eager VF projection missing"
    init = make_vf_proj_params(jax.random.PRNGKey(42), 32, 768)
    trained = payload["params"]["vf_proj"]["kernel"]
    assert trained.shape == init["kernel"].shape == (32, 768)
    assert not np.allclose(np.asarray(trained), np.asarray(init["kernel"])), \
        "vf_proj was never updated by the optimizer"
