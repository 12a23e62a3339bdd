"""Training-runtime tests: train step, grad accumulation, NaN-skip, freeze,
checkpoint round-trip, and a tiny end-to-end convergence check (the TPU
analogue of the reference's 'quick verification ladder', EXPERIMENTS.md:408-450).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepl_project_tpu import TransVAE, get_config
from deepl_project_tpu.losses import LossWeights
from deepl_project_tpu.training import (TrainState, init_train_state,
                                        make_eval_step, make_gan_train_step,
                                        make_optimizer, make_train_step,
                                        make_vf_proj_params, restore_checkpoint,
                                        save_checkpoint, warmup_constant)
from deepl_project_tpu.models.discriminator import PatchDiscriminator


def micro_model(**kw):
    cfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla", **kw)
    cfg = cfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4,
                      head_dim=16)
    return TransVAE(cfg)


@pytest.fixture
def setup(rng):
    model = micro_model()
    x = jax.random.uniform(rng, (4, 16, 16, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    params = {"model": variables["params"]}
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=0)
    state = init_train_state(params, tx)
    return model, tx, state, x


def test_train_step_runs_and_updates(setup, rng):
    model, tx, state, x = setup
    step = make_train_step(model, tx,
                           LossWeights(lpips=0.0, kl=1e-6, vf=0.0, gan=0.0),
                           donate=False)
    new_state, metrics = step(state, x, rng)
    assert int(new_state.step) == 1
    assert float(metrics["total"]) > 0
    assert float(metrics["grad_norm"]) > 0
    # Params must actually move.
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_grad_accumulation_matches_full_batch(setup, rng):
    model, _, state, x = setup
    w = LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0)
    sgd = optax.sgd(1e-2)
    st = init_train_state(state.params, sgd)
    step1 = make_train_step(model, sgd, w, accum_steps=1, donate=False)
    step4 = make_train_step(model, sgd, w, accum_steps=4, donate=False)
    s1, m1 = step1(st, x, rng)
    s4, m4 = step4(st, x, rng)
    # Same data, same rng stream per microbatch differs — losses must be close
    # but not identical; grads averaged over microbatches approximate full-batch.
    assert np.isfinite(float(m4["total"]))
    # Deterministic path (no sampling noise): compare param movement magnitude.
    n1 = float(optax.global_norm(jax.tree_util.tree_map(
        lambda a, b: a - b, s1.params, st.params)))
    n4 = float(optax.global_norm(jax.tree_util.tree_map(
        lambda a, b: a - b, s4.params, st.params)))
    assert n4 == pytest.approx(n1, rel=0.5)


def test_nan_skip_guards_step(setup, rng):
    model, tx, state, _ = setup
    step = make_train_step(model, tx,
                           LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0),
                           donate=False)
    bad = jnp.full((4, 16, 16, 3), jnp.nan)
    new_state, metrics = step(state, bad, rng)
    # apply_if_finite must leave params untouched on non-finite grads.
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(a, b)


def test_freeze_encoder(setup, rng):
    model, _, state, x = setup
    tx = make_optimizer(learning_rate=1e-3, warmup_steps=0, freeze_encoder=True)
    st = init_train_state(state.params, tx)
    step = make_train_step(model, tx,
                           LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0),
                           donate=False)
    new_state, _ = step(st, x, rng)
    # Encoder params unchanged; decoder params moved (stage-2 semantics,
    # ref: train.py:676-679).
    for a, b in zip(jax.tree_util.tree_leaves(st.params["model"]["encoder"]),
                    jax.tree_util.tree_leaves(
                        new_state.params["model"]["encoder"])):
        np.testing.assert_array_equal(a, b)
    dec_moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        st.params["model"]["decoder"], new_state.params["model"]["decoder"])
    assert max(jax.tree_util.tree_leaves(dec_moved)) > 0


def test_vf_projection_is_trained(rng):
    model = micro_model()
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    params = {"model": variables["params"],
              "vf_proj": make_vf_proj_params(rng, 4, 8)}
    tx = make_optimizer(learning_rate=1e-2, warmup_steps=0)
    state = init_train_state(params, tx)

    def teacher(images):  # stub frozen teacher: fixed random features
        return jnp.ones((images.shape[0], 4, 4, 8))

    step = make_train_step(model, tx,
                           LossWeights(lpips=0.0, kl=0.0, vf=0.1, gan=0.0),
                           teacher_fn=teacher, donate=False)
    new_state, metrics = step(state, x, rng)
    # The eager projection must be optimized from step 0 (reference defect
    # §2.9.4 made it invisible to the optimizer).
    assert float(jnp.max(jnp.abs(new_state.params["vf_proj"]["kernel"] -
                                 state.params["vf_proj"]["kernel"]))) >= 0
    assert np.isfinite(float(metrics["vf"]))


def test_warmup_schedule():
    sched = warmup_constant(1e-4, 100)
    assert float(sched(0)) == 0.0
    assert float(sched(50)) == pytest.approx(0.5e-4)
    assert float(sched(100)) == pytest.approx(1e-4)
    assert float(sched(10_000)) == pytest.approx(1e-4)


def test_tiny_convergence(rng):
    # A micro model must overfit a fixed batch quickly (L1-only): loss halves.
    model = micro_model()
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    tx = make_optimizer(learning_rate=1e-2, warmup_steps=0)
    state = init_train_state({"model": variables["params"]}, tx)
    step = make_train_step(model, tx,
                           LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0),
                           donate=False)
    _, m0 = step(state, x, rng)
    first = float(m0["total"])
    for _ in range(300):
        state, metrics = step(state, x, rng)
    last = float(metrics["total"])
    # Reparameterization noise (std≈1 at init) floors the L1; ~47% reduction
    # in 300 steps is the observed trajectory for this micro config.
    assert last < 0.6 * first, (first, last)


def test_checkpoint_roundtrip(tmp_path, setup, rng):
    model, tx, state, x = setup
    step = make_train_step(model, tx,
                           LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0),
                           donate=False)
    state, _ = step(state, x, rng)
    ckpt_dir = str(tmp_path / "ckpt")
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": int(state.step)}
    save_checkpoint(ckpt_dir, 1, payload, epoch=3, config=model.config)
    restored, meta = restore_checkpoint(ckpt_dir)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Config sidecar round-trips.
    from deepl_project_tpu.training import load_config
    cfg = load_config(ckpt_dir)
    assert cfg.depths == model.config.depths


def test_gan_train_step(rng):
    model = micro_model()
    disc = PatchDiscriminator(base_channels=8, num_layers=2, dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    mvars = model.init({"params": rng, "sample": rng}, x)
    dvars = disc.init(rng, x)
    gen_tx = make_optimizer(1e-3, 0, freeze_encoder=True)
    disc_tx = make_optimizer(1e-3, 0)
    gen_state = init_train_state({"model": mvars["params"]}, gen_tx)
    disc_state = init_train_state({"model": dvars["params"]}, disc_tx)
    step = make_gan_train_step(
        model, disc, gen_tx, disc_tx,
        LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.05))
    gen_state, disc_state, metrics = step(gen_state, disc_state, x, rng)
    assert np.isfinite(float(metrics["total"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    assert int(gen_state.step) == 1 and int(disc_state.step) == 1


def test_eval_step(setup, rng):
    model, _, state, x = setup
    ev = make_eval_step(model, LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0))
    recon, losses = ev(state.params, x)
    assert recon.shape == x.shape
    assert float(jnp.min(recon)) >= 0.0 and float(jnp.max(recon)) <= 1.0


def test_gan_adaptive_weight_step(rng):
    # Adaptive VQGAN weighting path compiles and yields a finite weight.
    model = micro_model()
    disc = PatchDiscriminator(base_channels=8, num_layers=2, dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    mvars = model.init({"params": rng, "sample": rng}, x)
    dvars = disc.init(rng, x)
    gen_tx = make_optimizer(1e-3, 0)
    disc_tx = make_optimizer(1e-3, 0)
    gen_state = init_train_state({"model": mvars["params"]}, gen_tx)
    disc_state = init_train_state({"model": dvars["params"]}, disc_tx)
    step = make_gan_train_step(
        model, disc, gen_tx, disc_tx,
        LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.05),
        adaptive_weight=True)
    gen_state, disc_state, metrics = step(gen_state, disc_state, x, rng)
    assert np.isfinite(float(metrics["adaptive_gan_weight"]))
    assert np.isfinite(float(metrics["total"]))


def test_optimizer_mu_dtype_bf16():
    # mu_dtype='bfloat16' must put AdamW's first moment in bf16 (an HBM lever
    # for big-variant training) without breaking updates.
    import optax

    from deepl_project_tpu.training import make_optimizer

    tx = make_optimizer(learning_rate=1e-3, warmup_steps=0,
                        mu_dtype="bfloat16")
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = tx.init(params)
    mus = [leaf for leaf in jax.tree_util.tree_leaves(state)
           if getattr(leaf, "dtype", None) == jnp.bfloat16]
    assert mus, "no bf16 leaves in optimizer state"
    grads = {"w": jnp.full((4, 4), 0.1, jnp.float32)}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert bool(jnp.all(jnp.isfinite(new["w"])))
    assert float(jnp.max(jnp.abs(new["w"] - params["w"]))) > 0


def test_optimizer_adafactor_state_is_factored():
    # Adafactor's state must be ~O(rows+cols), not O(params) — the lever that
    # fits 1B-param single-chip training (PERFORMANCE.md HBM budget).
    import numpy as np
    import optax

    from deepl_project_tpu.training import make_optimizer

    tx = make_optimizer(learning_rate=1e-3, warmup_steps=0,
                        optimizer="adafactor")
    params = {"w": jnp.ones((256, 512), jnp.float32)}
    state = tx.init(params)
    state_elems = sum(np.size(l) for l in jax.tree_util.tree_leaves(state))
    assert state_elems < 256 * 512 / 10, state_elems  # factored, not dense
    grads = {"w": jnp.full((256, 512), 0.1, jnp.float32)}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert bool(jnp.all(jnp.isfinite(new["w"])))
    assert float(jnp.max(jnp.abs(new["w"] - params["w"]))) > 0


def test_adafactor_rejects_adamw_weight_decay():
    # optax.adafactor's decay is not lr-scaled; passing AdamW-style wd through
    # would over-decay ~1/lr x. Must be an explicit error, not silent.
    import pytest as _pytest

    from deepl_project_tpu.training import make_optimizer

    with _pytest.raises(ValueError, match="adafactor"):
        make_optimizer(learning_rate=1e-4, weight_decay=0.01,
                       optimizer="adafactor")


def test_trainer_saves_inference_dispatch(tmp_path):
    # 'auto_train' is a training-only execution policy; the checkpoint config
    # must record the inference dispatch so serve/evaluate don't inherit it.
    from deepl_project_tpu import get_config
    from deepl_project_tpu.training.checkpoint import load_config
    from deepl_project_tpu.training.trainer import Trainer, TrainerConfig

    mcfg = get_config("tiny_f16d32", dtype="float32", attention_impl="auto_train")
    mcfg = mcfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4,
                        head_dim=16)
    tcfg = TrainerConfig(batch_size=2, resolution=16, use_lpips=False,
                         weights=LossWeights(l1=1.0, lpips=0.0, kl=0.0,
                                             vf=0.0, gan=0.0),
                         output_dir=str(tmp_path))
    tr = Trainer(mcfg, tcfg)
    state = tr.create_state(jax.random.PRNGKey(0))
    tr.save(state, epoch=0)
    saved = load_config(str(tmp_path / "checkpoints"))
    assert saved.attention_impl == "auto"


def test_trainer_save_every_steps(tmp_path):
    from deepl_project_tpu import get_config
    from deepl_project_tpu.data import batch_iterator, make_dataset
    from deepl_project_tpu.training.checkpoint import latest_step
    from deepl_project_tpu.training.trainer import Trainer, TrainerConfig

    mcfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    mcfg = mcfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4,
                        head_dim=16)
    tcfg = TrainerConfig(batch_size=2, resolution=16, use_lpips=False,
                         num_epochs=1, steps_per_epoch=5, save_every_steps=2,
                         save_every_epochs=99, log_every=100,
                         weights=LossWeights(l1=1.0, lpips=0.0, kl=0.0,
                                             vf=0.0, gan=0.0),
                         output_dir=str(tmp_path))
    tr = Trainer(mcfg, tcfg)
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=64), 2)
    tr.fit(data)
    # Mid-epoch saves at steps 2 and 4, plus the end-of-training save.
    assert latest_step(str(tmp_path / "checkpoints")) == 5


def _micro_trainer(tmp_path, gan=False, steps=3, resolution=16):
    # NB: GAN trainers need resolution >= 24 (PatchGAN receptive-field floor).
    from deepl_project_tpu.training.trainer import Trainer, TrainerConfig

    mcfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    mcfg = mcfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4,
                        head_dim=16)
    w = LossWeights(l1=1.0, lpips=0.0, kl=0.0, vf=0.0,
                    gan=0.5 if gan else 0.0)
    tcfg = TrainerConfig(batch_size=2, resolution=resolution, use_lpips=False,
                         num_epochs=1, steps_per_epoch=steps,
                         save_every_epochs=1, log_every=100, weights=w,
                         output_dir=str(tmp_path))
    return Trainer(mcfg, tcfg)


def test_resume_restores_optimizer_structure_and_steps(tmp_path):
    """Regression: maybe_resume must restore opt_state into the live optax
    NamedTuple structure — a raw-dict restore crashes tx.update on the first
    post-resume step ('dict' object has no attribute 'inner_state')."""
    from deepl_project_tpu.data import batch_iterator, make_dataset

    tr = _micro_trainer(tmp_path, steps=3)
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=64), 2)
    tr.fit(data)

    tr2 = _micro_trainer(tmp_path, steps=3)
    state = tr2.create_state(jax.random.PRNGKey(0))
    state, epoch = tr2.maybe_resume(state)
    assert int(state.step) == 3
    # The restored opt_state must be the real optax structure, not dicts.
    assert hasattr(state.opt_state, "inner_state") or isinstance(
        state.opt_state, tuple)
    # And the acid test: one more optimizer step through the restored state.
    batch = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                        jnp.float32)
    state2, metrics = tr2.step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 4
    assert np.isfinite(float(metrics["total"]))


def test_resume_gan_stage2_roundtrip(tmp_path):
    """Stage-2 resume restores discriminator params+opt state structurally."""
    from deepl_project_tpu.data import batch_iterator, make_dataset

    tr = _micro_trainer(tmp_path, gan=True, steps=2, resolution=32)
    data = batch_iterator(make_dataset("synthetic", resolution=32,
                                       num_samples=64), 2)
    tr.fit(data)

    tr2 = _micro_trainer(tmp_path, gan=True, steps=2, resolution=32)
    state = tr2.create_state(jax.random.PRNGKey(0))
    state, _ = tr2.maybe_resume(state)
    assert tr2._disc_state is not None
    batch = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                        jnp.float32)
    state2, metrics = tr2.step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 3
    assert np.isfinite(float(metrics["total"]))


def test_resume_stage1_checkpoint_into_stage2(tmp_path):
    """Starting GAN stage 2 from a stage-1 checkpoint: generator restores,
    discriminator starts fresh (the two-stage recipe's hand-off)."""
    from deepl_project_tpu.data import batch_iterator, make_dataset

    tr = _micro_trainer(tmp_path, gan=False, steps=2)
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=64), 2)
    tr.fit(data)

    tr2 = _micro_trainer(tmp_path, gan=True, steps=2, resolution=32)
    state = tr2.create_state(jax.random.PRNGKey(0))
    state, _ = tr2.maybe_resume(state)
    assert int(state.step) == 2
    batch = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                        jnp.float32)
    state2, metrics = tr2.step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 3
    assert "disc_loss" in metrics
    assert np.isfinite(float(metrics["disc_loss"]))


def test_vae_ema_and_best_checkpoint(tmp_path):
    """r4: EMA shadow params + best-val-PSNR checkpoint retention.

    The r3 256px run ended 2.6 dB below its best with only latest-N orbax
    retention; the trainer now keeps checkpoints_best/ (max_to_keep=1, with a
    metrics.json sidecar) selected on the EMA val PSNR."""
    import os

    from deepl_project_tpu.data import batch_iterator, make_dataset
    from deepl_project_tpu.training.checkpoint import (checkpoint_metrics,
                                                       restore_model_params)
    from deepl_project_tpu.training.trainer import Trainer, TrainerConfig

    mcfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    mcfg = mcfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4,
                        head_dim=16)
    tcfg = TrainerConfig(batch_size=2, resolution=16, use_lpips=False,
                         num_epochs=1, steps_per_epoch=4, save_every_epochs=1,
                         log_every=100, eval_every_steps=2, ema_decay=0.9,
                         weights=LossWeights(l1=1.0, lpips=0.0, kl=0.0,
                                             vf=0.0, gan=0.0),
                         output_dir=str(tmp_path))
    tr = Trainer(mcfg, tcfg)
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=64), 2)
    val = [np.random.RandomState(7).rand(2, 16, 16, 3).astype(np.float32)]
    state = tr.fit(data, val_batches=val)

    # EMA shadow exists and differs from the raw params after 4 steps.
    assert state.ema_params is not None
    diff = jax.tree_util.tree_map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))),
        state.ema_params, state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # Best checkpoint dir exists with the metrics sidecar.
    best_dir = os.path.join(str(tmp_path), "checkpoints_best")
    meta = checkpoint_metrics(best_dir)
    assert meta is not None and "val_psnr_ema" in meta
    # restore_model_params prefers the EMA shadow by default.
    ema_restored = restore_model_params(best_dir)
    raw_restored = restore_model_params(best_dir, prefer_ema=False)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ema_restored, raw_restored)
    assert max(jax.tree_util.tree_leaves(d)) > 0

    # History logged both raw and EMA val PSNR.
    import json as _json
    rows = [_json.loads(line) for line in
            open(os.path.join(str(tmp_path), "history.jsonl"))]
    val_rows = [r for r in rows if r["kind"] == "val"]
    assert val_rows and all("val_psnr_ema" in r for r in val_rows)

    # Resume: EMA restores structurally and best tracking is seeded (a fresh
    # trainer must not immediately overwrite the best with a worse model).
    tr2 = Trainer(mcfg, tcfg)
    state2 = tr2.create_state(jax.random.PRNGKey(0))
    state2, _ = tr2.maybe_resume(state2)
    assert int(state2.step) == 4
    assert state2.ema_params is not None
    assert tr2._best_psnr == meta["val_psnr_ema"]
    d2 = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state2.ema_params, state.ema_params)
    assert max(jax.tree_util.tree_leaves(d2)) == 0


def test_trainer_sigterm_checkpoints_and_stops(tmp_path):
    """Preemption safety: SIGTERM mid-run finishes the in-flight step, saves a
    resumable checkpoint, and returns (preemptible TPU VMs get SIGTERM with a
    short grace window; the reference only saves on epoch boundaries,
    ref: train.py:739-742)."""
    import os
    import signal

    from deepl_project_tpu.data import batch_iterator, make_dataset
    from deepl_project_tpu.training.checkpoint import latest_step

    tr = _micro_trainer(tmp_path, steps=50)
    tr.cfg.save_every_epochs = 99  # only the preemption save may fire

    def signalling_iter():
        inner = batch_iterator(
            make_dataset("synthetic", resolution=16, num_samples=512), 2)
        for i, batch in enumerate(inner):
            if i == 2:  # delivered at a bytecode boundary inside step 3
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch

    prev = signal.getsignal(signal.SIGTERM)
    tr.fit(signalling_iter())
    # The signal landed during step 3 => exactly one save, at step 3.
    assert latest_step(str(tmp_path / "checkpoints")) == 3
    # Handlers restored after fit.
    assert signal.getsignal(signal.SIGTERM) is prev

    # The checkpoint is resumable: a fresh trainer picks up at step 3.
    tr2 = _micro_trainer(tmp_path, steps=2)
    state2, _ = tr2.maybe_resume(tr2.create_state(jax.random.PRNGKey(0)))
    assert int(state2.step) == 3


def test_trainer_skip_data_on_resume(tmp_path):
    """skip_data_on_resume fast-forwards the stream by the restored step count
    (1 batch per optimizer step), giving exact data-position continuity."""
    from deepl_project_tpu.data import batch_iterator, make_dataset

    def counting_iter(counter):
        inner = batch_iterator(
            make_dataset("synthetic", resolution=16, num_samples=512), 2)
        for batch in inner:
            counter[0] += 1
            yield batch

    tr = _micro_trainer(tmp_path, steps=3)
    c1 = [0]
    tr.fit(counting_iter(c1))
    assert c1[0] == 3

    tr2 = _micro_trainer(tmp_path, steps=2)
    tr2.cfg.skip_data_on_resume = True
    c2 = [0]
    tr2.fit(counting_iter(c2))
    # 3 skipped (resume point) + 1 trained: step 3 is mid-epoch for the
    # 2-step schedule, so the resumed run finishes that epoch (1 step)
    # rather than rerunning it in full (ADVICE r4 overshoot fix).
    assert c2[0] == 4


def test_gan_warmup_gates_generator_term(rng):
    """gan_warmup_steps (VQGAN disc_start analogue): while the discriminator
    has taken < warmup steps, the generator's GAN term is zeroed (total
    excludes it, gan_scale=0) — for BOTH the fixed-weight and adaptive paths;
    the gate is keyed on the DISC step so it is stage-2-relative even when
    the generator resumes at a large step count."""
    model = micro_model()
    disc = PatchDiscriminator(base_channels=8, num_layers=2, dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    mvars = model.init({"params": rng, "sample": rng}, x)
    dvars = disc.init(rng, x)
    gen_tx, disc_tx = make_optimizer(1e-3, 0), make_optimizer(1e-3, 0)
    w = LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.05)

    for adaptive in (False, True):
        gen_state = init_train_state(
            {"model": jax.tree_util.tree_map(jnp.copy, mvars["params"])},
            gen_tx)
        # Generator resumes mid-lineage; discriminator is fresh.
        gen_state = gen_state.replace(step=jnp.asarray(6000, jnp.int32))
        disc_state = init_train_state(
            {"model": jax.tree_util.tree_map(jnp.copy, dvars["params"])},
            disc_tx)
        step = make_gan_train_step(model, disc, gen_tx, disc_tx, w,
                                   adaptive_weight=adaptive,
                                   gan_warmup_steps=2)
        gen_state, disc_state, m0 = step(gen_state, disc_state, x, rng)
        assert float(m0["gan_scale"]) == 0.0
        assert float(m0["gan"]) != 0.0  # the term is computed, just gated
        expected = sum(float(m0[k]) for k in ("l1", "lpips", "kl", "vf"))
        np.testing.assert_allclose(float(m0["total"]), expected, rtol=1e-5)

        gen_state, disc_state, m1 = step(gen_state, disc_state, x, rng)
        assert float(m1["gan_scale"]) == 0.0
        gen_state, disc_state, m2 = step(gen_state, disc_state, x, rng)
        assert float(m2["gan_scale"]) == 1.0  # disc has 2 steps: gate opens
        if adaptive:
            contrib = (float(m2["adaptive_gan_weight"]) * float(m2["gan"]))
        else:
            contrib = float(m2["gan"])
        expected2 = sum(float(m2[k])
                        for k in ("l1", "lpips", "kl", "vf")) + contrib
        np.testing.assert_allclose(float(m2["total"]), expected2, rtol=1e-5)


def test_divergence_circuit_breaker(tmp_path):
    """r5: the finite-collapse circuit breaker. The r4 stage-2 explosion sat
    at 10.6 dB (>20 dB below best) for 2,500 steps with no guard — the NaN
    guard only catches non-finite losses. A scripted eval sequence (one good
    eval, then collapse) must halt the run after divergence_patience bad
    evals instead of burning the remaining steps."""
    from deepl_project_tpu.data import batch_iterator, make_dataset
    from deepl_project_tpu.training.checkpoint import latest_step

    tr = _micro_trainer(tmp_path, steps=20)
    tr.cfg.eval_every_steps = 1
    tr.cfg.save_every_epochs = 99
    tr.cfg.divergence_halt_db = 5.0
    tr.cfg.divergence_patience = 3

    scripted = iter([30.0] + [10.0] * 50)

    def fake_evaluate(state, val_batches):
        return {"val_psnr": next(scripted), "val_ssim": 0.5}

    tr.evaluate = fake_evaluate
    val = [np.random.RandomState(7).rand(2, 16, 16, 3).astype(np.float32)]
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=256), 2)
    tr.fit(data, val_batches=val)
    # Eval @1: best=30. Evals @2,3,4: 10 dB (>5 below best) -> halt at step 4
    # with a final checkpoint, not at the scheduled 20.
    assert latest_step(str(tmp_path / "checkpoints")) == 4


def test_divergence_breaker_tolerates_transient_dip(tmp_path):
    """A dip shorter than the patience window must NOT halt the run."""
    from deepl_project_tpu.data import batch_iterator, make_dataset
    from deepl_project_tpu.training.checkpoint import latest_step

    tr = _micro_trainer(tmp_path, steps=8)
    tr.cfg.eval_every_steps = 1
    tr.cfg.save_every_epochs = 1
    tr.cfg.divergence_halt_db = 5.0
    tr.cfg.divergence_patience = 3

    scripted = iter([30.0, 10.0, 10.0, 31.0, 32.0, 31.5, 32.5, 33.0])

    def fake_evaluate(state, val_batches):
        return {"val_psnr": next(scripted), "val_ssim": 0.5}

    tr.evaluate = fake_evaluate
    val = [np.random.RandomState(7).rand(2, 16, 16, 3).astype(np.float32)]
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=256), 2)
    tr.fit(data, val_batches=val)
    assert latest_step(str(tmp_path / "checkpoints")) == 8  # ran to the end


def test_disc_step_persisted_across_resume(tmp_path):
    """ADVICE r4 (medium): the discriminator's OWN step must survive a
    checkpoint round-trip. Seeding it from the generator's cumulative step
    would open the gan_warmup gate immediately on any stage-2 resume whose
    generator lineage exceeds gan_warmup_steps."""
    from deepl_project_tpu.data import batch_iterator, make_dataset

    # Stage 1: 2 generator-only steps.
    tr1 = _micro_trainer(tmp_path, gan=False, steps=2)
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=64), 2)
    tr1.fit(data)

    # Stage 2 from the stage-1 checkpoint: generator 2 -> 4, disc 0 -> 2.
    tr2 = _micro_trainer(tmp_path, gan=True, steps=2, resolution=32)
    data = batch_iterator(make_dataset("synthetic", resolution=32,
                                       num_samples=64), 2)
    tr2.fit(data)
    assert int(tr2._disc_state.step) == 2

    # Resume stage 2: disc step restores as 2 (its own), not 4 (generator's).
    tr3 = _micro_trainer(tmp_path, gan=True, steps=2, resolution=32)
    state = tr3.create_state(jax.random.PRNGKey(0))
    state, _ = tr3.maybe_resume(state)
    assert int(state.step) == 4
    assert tr3._disc_state is not None
    assert int(tr3._disc_state.step) == 2


def test_mid_epoch_resume_no_overshoot(tmp_path):
    """ADVICE r4: resuming a mid-epoch checkpoint finishes the interrupted
    epoch instead of rerunning it in full — total optimizer steps stay at
    num_epochs*steps_per_epoch (a full rerun would train past the cosine
    decay horizon at the schedule floor)."""
    from deepl_project_tpu.data import batch_iterator, make_dataset
    from deepl_project_tpu.training.checkpoint import latest_step

    # A 3-step run leaves a checkpoint mid-epoch for the 2x5 schedule below.
    tr1 = _micro_trainer(tmp_path, steps=3)
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=256), 2)
    tr1.fit(data)
    assert latest_step(str(tmp_path / "checkpoints")) == 3

    tr2 = _micro_trainer(tmp_path, steps=5)
    tr2.cfg.num_epochs = 2
    data = batch_iterator(make_dataset("synthetic", resolution=16,
                                       num_samples=256), 2)
    tr2.fit(data)
    # Epoch 0 finishes with 2 steps (3 already done), epoch 1 runs 5:
    # total exactly 10, not 3 + 10.
    assert latest_step(str(tmp_path / "checkpoints")) == 10


def test_step_timer_window_zero_keeps_no_ticks():
    """StepTimer(window=0) documents cumulative behavior; it must not grow an
    unbounded tick deque over a long run (ADVICE r4)."""
    from deepl_project_tpu.utils.logging import StepTimer

    t = StepTimer(warmup=1, window=0)
    for _ in range(1000):
        t.tick(4)
    assert len(t._ticks) == 0
    assert t.images_per_sec > 0


def test_gan_ramp_schedule(rng):
    """r5: after the warmup gate opens, gan_scale ramps LINEARLY over
    gan_ramp_steps instead of stepping 0 -> 1. A step-function handoff
    against the warmed (near-converged) discriminator collapsed
    reconstructions (measured 33.5 -> 7.3 dB; runs/two_stage_tiny256_s2b
    r5 attempt 1)."""
    model = micro_model()
    disc = PatchDiscriminator(base_channels=8, num_layers=2, dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    mvars = model.init({"params": rng, "sample": rng}, x)
    dvars = disc.init(rng, x)
    gen_tx, disc_tx = make_optimizer(1e-3, 0), make_optimizer(1e-3, 0)
    w = LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.05)

    gen_state = init_train_state(
        {"model": jax.tree_util.tree_map(jnp.copy, mvars["params"])}, gen_tx)
    disc_state = init_train_state(
        {"model": jax.tree_util.tree_map(jnp.copy, dvars["params"])}, disc_tx)
    step = make_gan_train_step(model, disc, gen_tx, disc_tx, w,
                               gan_warmup_steps=2, gan_ramp_steps=4)
    # disc steps 0,1: gated; 2..4: 0.25/0.5/0.75; 5: saturated at 1.0.
    expected = [0.0, 0.0, 0.25, 0.5, 0.75, 1.0, 1.0]
    for want in expected:
        gen_state, disc_state, m = step(gen_state, disc_state, x, rng)
        np.testing.assert_allclose(float(m["gan_scale"]), want, atol=1e-6)


def test_adaptive_gan_weight_clamp():
    """adaptive_max clamps the VQGAN ratio: a near-zero GAN gradient (random
    discriminator) must not amplify the GAN term 40x."""
    from deepl_project_tpu.models.transvae import adaptive_gan_weight

    rec = jnp.ones((8,)) * 1.0
    gan = jnp.ones((8,)) * 1e-3  # ratio would be ~1000
    w_unclamped = adaptive_gan_weight(rec, gan)
    assert float(w_unclamped) > 100
    w_clamped = adaptive_gan_weight(rec, gan, max_weight=1.0)
    assert float(w_clamped) == 1.0


def test_disc_loss_floor_freezes_winning_disc(rng):
    """r5: the 'don't let D win' control — discriminator updates are zeroed
    while its current-batch loss is below the floor. Attempt 3 measured the
    runaway this prevents: D reached perfect separation (hinge 1.8 -> 0.0)
    and destroyed reconstructions within 100 steps despite warmup+ramp+clamp."""
    model = micro_model()
    disc = PatchDiscriminator(base_channels=8, num_layers=2, dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    mvars = model.init({"params": rng, "sample": rng}, x)
    dvars = disc.init(rng, x)
    gen_tx, disc_tx = make_optimizer(1e-3, 0), make_optimizer(1e-3, 0)
    w = LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.05)

    def fresh_states():
        return (init_train_state(
                    {"model": jax.tree_util.tree_map(jnp.copy,
                                                     mvars["params"])},
                    gen_tx),
                init_train_state(
                    {"model": jax.tree_util.tree_map(jnp.copy,
                                                     dvars["params"])},
                    disc_tx))

    # Floor above any reachable hinge loss (~2.0 untrained): D always frozen.
    gen_state, disc_state = fresh_states()
    step = make_gan_train_step(model, disc, gen_tx, disc_tx, w,
                               disc_loss_floor=100.0)
    _, disc_after, m = step(gen_state, disc_state, x, rng)
    assert float(m["disc_update_scale"]) == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(dvars["params"]),
                    jax.tree_util.tree_leaves(disc_after.params["model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(disc_after.step) == 1  # the counter still advances (warmup)

    # Floor below: D trains normally.
    gen_state, disc_state = fresh_states()
    step2 = make_gan_train_step(model, disc, gen_tx, disc_tx, w,
                                disc_loss_floor=1e-6)
    _, disc_after2, m2 = step2(gen_state, disc_state, x, rng)
    assert float(m2["disc_update_scale"]) == 1.0
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        dvars["params"], disc_after2.params["model"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_r1_gradient_penalty(rng):
    """r5: R1 slope control on the discriminator. The penalty must (a) add to
    the disc loss, (b) produce different disc updates, (c) stay finite, and
    (d) be reported in metrics."""
    model = micro_model()
    disc = PatchDiscriminator(base_channels=8, num_layers=2, dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    mvars = model.init({"params": rng, "sample": rng}, x)
    dvars = disc.init(rng, x)
    gen_tx, disc_tx = make_optimizer(1e-3, 0), make_optimizer(1e-3, 0)
    w = LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.05)

    def run(r1):
        gen_state = init_train_state(
            {"model": jax.tree_util.tree_map(jnp.copy, mvars["params"])},
            gen_tx)
        disc_state = init_train_state(
            {"model": jax.tree_util.tree_map(jnp.copy, dvars["params"])},
            disc_tx)
        step = make_gan_train_step(model, disc, gen_tx, disc_tx, w,
                                   r1_gamma=r1)
        _, d_after, m = step(gen_state, disc_state, x, rng)
        return d_after, m

    d0, m0 = run(0.0)
    d1, m1 = run(10.0)
    assert "disc_r1" not in m0
    assert float(m1["disc_r1"]) > 0
    assert np.isfinite(float(m1["disc_loss"]))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        d0.params, d1.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0  # penalty changed D's step
