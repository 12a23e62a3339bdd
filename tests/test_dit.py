"""Latent-DiT harness tests: shapes, adaLN-zero identity-at-init, CFG
sampling, rectified-flow training convergence, end-to-end generate through
the TransVAE decoder (paper Table 2b pipeline; not in the reference repo)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepl_project_tpu import TransVAE, get_config
from deepl_project_tpu.models import DiT, get_dit_config, init_dit_params
from deepl_project_tpu.training import (LatentStats, encode_to_latents,
                                        generate_images, init_train_state,
                                        make_dit_train_step, make_sampler)


def micro_dit(**kw):
    cfg = get_dit_config("B", patch_size=2, dtype="float32",
                         attention_impl="xla", **kw)
    return DiT(cfg.replace(hidden_dim=64, depth=2, num_heads=2,
                           in_channels=4, num_classes=10))


@pytest.fixture(scope="module")
def dit_and_params():
    model = micro_dit()
    params = init_dit_params(model, jax.random.PRNGKey(0), grid=8)
    return model, params


def test_dit_output_shape(dit_and_params, rng):
    model, params = dit_and_params
    z = jax.random.normal(rng, (2, 8, 8, 4))
    t = jnp.array([0.1, 0.9])
    y = jnp.array([3, 7])
    v = model.apply({"params": params}, z, t, y)
    assert v.shape == (2, 8, 8, 4)
    assert v.dtype == jnp.float32


def test_dit_zero_init_head(dit_and_params, rng):
    # adaLN-Zero: zero-init final head → output is exactly 0 at init, the
    # property that makes DiT training stable from step 0.
    model, params = dit_and_params
    z = jax.random.normal(rng, (2, 8, 8, 4))
    v = model.apply({"params": params}, z, jnp.array([0.5, 0.5]),
                    jnp.array([0, 1]))
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


def test_dit_resolution_flexible(dit_and_params, rng):
    # RoPE on the patch grid → same params run at a larger latent grid
    # (the tokenizer's extrapolation story carries to the DiT).
    model, params = dit_and_params
    z = jax.random.normal(rng, (1, 16, 16, 4))
    v = model.apply({"params": params}, z, jnp.array([0.5]), jnp.array([2]))
    assert v.shape == (1, 16, 16, 4)


def test_label_dropout_trains_null_class(dit_and_params, rng):
    # With deterministic=False, some labels are replaced by the null class —
    # the model must consume label id == num_classes without error.
    model, params = dit_and_params
    z = jax.random.normal(rng, (4, 8, 8, 4))
    v = model.apply({"params": params}, z, jnp.full((4,), 0.5),
                    jnp.array([0, 1, 2, 3]), deterministic=False,
                    rngs={"label_dropout": rng})
    assert v.shape == (4, 8, 8, 4)


def test_latent_stats_roundtrip(rng):
    z = 3.0 + 2.0 * jax.random.normal(rng, (16, 8, 8, 4))
    stats = LatentStats.from_latents(z)
    zn = stats.normalize(z)
    np.testing.assert_allclose(float(jnp.mean(zn)), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(jnp.std(zn)), 1.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(stats.denormalize(zn)),
                               np.asarray(z), rtol=1e-5, atol=1e-5)


def test_dit_training_loss_decreases(dit_and_params, rng):
    # Rectified-flow training on a fixed synthetic latent distribution: loss
    # must drop substantially within 60 steps (v-prediction of a learnable
    # structured target).
    model, params = dit_and_params
    tx = optax.adamw(2e-3)
    state = init_train_state(params, tx)
    step = make_dit_train_step(model, tx, donate=False)

    # Structured latents: class-dependent mean.
    def batch(key):
        ky, kz = jax.random.split(key)
        y = jax.random.randint(ky, (8,), 0, 10)
        mean = (y[:, None, None, None].astype(jnp.float32) - 4.5) / 3.0
        return mean + 0.3 * jax.random.normal(kz, (8, 8, 8, 4)), y

    losses = []
    key = rng
    for i in range(60):
        key, bk, sk = jax.random.split(key, 3)
        z0, y = batch(bk)
        state, m = step(state, z0, y, sk)
        losses.append(float(m["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.65 * first, (first, last)


def test_sampler_shapes_and_cfg(dit_and_params, rng):
    model, params = dit_and_params
    labels = jnp.array([1, 2, 3])
    for scale in (1.0, 4.0):
        sampler = make_sampler(model, num_steps=4, cfg_scale=scale,
                               num_classes=10)
        z = sampler(params, rng, labels, 8, 4)
        assert z.shape == (3, 8, 8, 4)
        assert bool(jnp.all(jnp.isfinite(z)))


def test_generate_through_vae_decoder(rng):
    # Full Table-2b loop on micro models: encode images → latent stats →
    # train-free DiT sample → denormalize → VAE decode → [0,1] images.
    vcfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    vcfg = vcfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32),
                        latent_dim=4, head_dim=16)
    vae = TransVAE(vcfg)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    vparams = vae.init({"params": rng, "sample": rng}, x)["params"]

    lat = encode_to_latents(vae, vparams, x)
    assert lat.shape == (2, 8, 8, 4)
    stats = LatentStats.from_latents(lat)

    dit = micro_dit()
    dparams = init_dit_params(dit, jax.random.PRNGKey(1), grid=8)
    imgs = generate_images(vae, vparams, dit, dparams, stats, rng,
                           jnp.array([0, 5]), grid=8, num_steps=2)
    assert imgs.shape == (2, 32, 32, 3)
    assert float(jnp.min(imgs)) >= 0.0 and float(jnp.max(imgs)) <= 1.0


def test_generation_fid_runs(rng):
    # FID-10K harness on micro scale: tiny counts, mean-pool feature fn.
    from deepl_project_tpu.training import generation_fid

    vcfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    vcfg = vcfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32),
                        latent_dim=4, head_dim=16)
    vae = TransVAE(vcfg)
    x = jax.random.uniform(rng, (4, 32, 32, 3))
    vparams = vae.init({"params": rng, "sample": rng}, x)["params"]
    dit = micro_dit()
    dparams = init_dit_params(dit, jax.random.PRNGKey(1), grid=8)
    stats = LatentStats.identity(4)

    def feature_fn(imgs):  # [B,H,W,3] -> [B, 48] crude pooled features
        f = jnp.mean(imgs.reshape(imgs.shape[0], 4, 8, 4, 8, 3), axis=(2, 4))
        return f.reshape(imgs.shape[0], -1)

    def real_batches():
        k = rng
        for _ in range(4):
            k, sub = jax.random.split(k)
            yield jax.random.uniform(sub, (4, 32, 32, 3))

    fid = generation_fid(vae, vparams, dit, dparams, stats, real_batches(),
                         feature_fn, rng, num_samples=8, batch_size=4,
                         grid=8, num_steps=2)
    assert np.isfinite(fid) and fid >= 0.0


def test_train_dit_cli_smoke(tmp_path):
    from deepl_project_tpu.cli.train_dit import main

    main(["--dit_variant", "S", "--vae_variant", "tiny", "--data", "synthetic",
          "--resolution", "64", "--batch_size", "2", "--total_steps", "2",
          "--log_every", "1", "--save_every", "0", "--sample_every", "0",
          "--stats_batches", "1", "--output_dir", str(tmp_path)])


def test_ema_train_state_tracks_params(dit_and_params, rng):
    from deepl_project_tpu.training import init_ema_train_state

    model, params = dit_and_params
    tx = optax.adamw(1e-2)
    state = init_ema_train_state(params, tx)
    step = make_dit_train_step(model, tx, ema_decay=0.5, donate=False)
    z0 = jax.random.normal(rng, (4, 8, 8, 4))
    y = jnp.array([0, 1, 2, 3])
    for i in range(3):
        state, _ = step(state, z0, y, jax.random.fold_in(rng, i))
    # EMA lags the live params but moves away from init.
    p0 = jax.tree_util.tree_leaves(params)
    pe = jax.tree_util.tree_leaves(state.ema_params)
    pl = jax.tree_util.tree_leaves(state.params)
    moved = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(pe, p0))
    lag = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(pe, pl))
    assert moved > 0.0 and lag > 0.0


def test_train_dit_cli_resume(tmp_path):
    from deepl_project_tpu.cli.train_dit import main

    common = ["--dit_variant", "S", "--vae_variant", "tiny", "--data",
              "synthetic", "--resolution", "64", "--batch_size", "2",
              "--log_every", "1", "--sample_every", "0", "--stats_batches",
              "1", "--output_dir", str(tmp_path)]
    main(common + ["--total_steps", "2", "--save_every", "2"])
    # Resume continues from step 2 to 4 (same arch/opt config).
    main(common + ["--total_steps", "4", "--save_every", "0", "--resume"])


def test_sample_dit_cli_end_to_end(tmp_path):
    # Train 2 steps (writes ckpt + dit_config.json sidecar), then sample from
    # the checkpoint via the standalone CLI (EMA params path).
    from deepl_project_tpu.cli.sample_dit import main as sample_main
    from deepl_project_tpu.cli.train_dit import main as train_main

    out = str(tmp_path / "run")
    train_main(["--dit_variant", "S", "--vae_variant", "tiny", "--data",
                "synthetic", "--resolution", "64", "--batch_size", "2",
                "--total_steps", "2", "--save_every", "2", "--sample_every",
                "0", "--stats_batches", "1", "--log_every", "1",
                "--output_dir", out])
    samples = str(tmp_path / "samples")
    sample_main(["--checkpoint", out, "--num_samples", "2", "--sample_steps",
                 "3", "--cfg_scale", "1.0", "--output_dir", samples])
    import os
    assert os.path.exists(os.path.join(samples, "grid.png"))
    assert len([f for f in os.listdir(samples)
                if f.startswith("sample_")]) == 2


def test_train_dit_uses_vae_checkpoint_config(tmp_path, capsys):
    # The tokenizer architecture must come from the checkpoint's config
    # sidecar: a norm_latents=True checkpoint applied to the flag-built
    # (norm_latents=False) structure runs WITHOUT error but produces
    # random-scale latents (Flax ignores the unused GroupNorm params) —
    # the exact failure observed on-chip with a real trained checkpoint.
    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.cli.train_dit import main
    from deepl_project_tpu.models import init_params
    from deepl_project_tpu.training.checkpoint import save_checkpoint

    cfg = get_config("tiny", 16, 32).replace(norm_latents=True,
                                             dtype="float32")
    model = TransVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=64, batch=1)
    ckpt = str(tmp_path / "vae")
    save_checkpoint(ckpt, 1, {"params": {"model": params}, "opt_state": {},
                              "step": 1}, config=cfg)

    out = str(tmp_path / "dit")
    main(["--dit_variant", "S", "--vae_variant", "tiny", "--vae_checkpoint",
          ckpt, "--data", "synthetic", "--resolution", "64", "--batch_size",
          "2", "--total_steps", "1", "--log_every", "1", "--save_every", "0",
          "--sample_every", "0", "--stats_batches", "1",
          "--output_dir", out])
    txt = capsys.readouterr().out
    # norm_latents bounds the latent scale; the mis-built structure yields
    # |mean| in the hundreds-to-thousands.
    import re

    m = re.search(r"mean\|max\|=([0-9.]+)", txt)
    assert m, txt
    assert float(m.group(1)) < 100.0, txt


def test_train_dit_cli_best_fid_checkpoint(tmp_path):
    """--fid_every keeps a best-FID checkpoint under <output>/best with a
    metrics.json sidecar (r4: mirrors the VAE trainer's best-ckpt retention)."""
    import json
    import os

    from deepl_project_tpu.cli.train_dit import main

    main(["--dit_variant", "S", "--vae_variant", "tiny", "--data", "synthetic",
          "--resolution", "64", "--batch_size", "2", "--total_steps", "2",
          "--log_every", "1", "--save_every", "0", "--sample_every", "0",
          "--stats_batches", "1", "--fid_every", "1", "--fid_samples", "4",
          "--sample_steps", "2", "--output_dir", str(tmp_path)])
    meta_path = os.path.join(str(tmp_path), "best", "metrics.json")
    assert os.path.exists(meta_path)
    meta = json.load(open(meta_path))
    fid_keys = [k for k in meta if k.endswith("gen_fid")]
    assert fid_keys and np.isfinite(meta[fid_keys[0]])
    # History recorded a fid row per eval.
    rows = [json.loads(l) for l in open(os.path.join(str(tmp_path),
                                                     "history.jsonl"))]
    assert sum(r["kind"] == "fid" for r in rows) == 2
