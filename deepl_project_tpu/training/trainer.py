"""High-level training loop: assembles model, data, optimizer, logging and
checkpointing into the reference's two-stage recipe.

Reference counterpart: train.py main() / train_epoch (ref: train.py:557-646,
train_2.py:276-405; SURVEY.md §3.1). Differences are all TPU-idiomatic:
one jitted step (grad-accum inside), sharded batches on a device mesh instead
of DDP, orbax checkpoints, no GradScaler (bf16), metrics fetched once per log
interval rather than a D2H sync per step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Iterator

import jax
import numpy as np

from ..config import TransVAEConfig
from ..losses import LossWeights, get_lpips_params, lpips_params_available
from ..models.transvae import TransVAE, init_params
from ..parallel import batch_sharding, create_mesh, shard_params
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .optim import make_optimizer
from .train_step import (TrainState, init_ema_train_state, init_train_state,
                         make_train_step, make_vf_proj_params)


def jnp_zeros_like_batch(batch):
    import jax.numpy as jnp

    return jnp.zeros((1,) + tuple(batch.shape[1:]), jnp.float32)


@dataclasses.dataclass
class TrainerConfig:
    """Training hyperparameters (reference defaults; SURVEY.md §2.5)."""

    batch_size: int = 16
    accum_steps: int = 1
    learning_rate: float = 1e-4
    warmup_steps: int = 10_000
    num_epochs: int = 100
    steps_per_epoch: int = 1000
    max_grad_norm: float = 1.0
    freeze_encoder: bool = False  # stage 2
    weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    use_lpips: bool = True
    # What fills the LPIPS slot: 'vgg' (reference parity — needs converted
    # pretrained weights, WEIGHTS.md; random-init otherwise) or 'self' (the
    # frozen encoder from perceptual_checkpoint as the feature net — the
    # honest in-env substitute; see losses.make_self_perceptual).
    perceptual: str = "vgg"
    perceptual_checkpoint: str = ""
    resolution: int = 256
    seed: int = 42
    log_every: int = 100
    save_every_epochs: int = 5
    # Also checkpoint every N optimizer steps (0 = epoch boundaries only) —
    # long epochs / preemptible capacity shouldn't risk a whole epoch of work.
    save_every_steps: int = 0
    # Periodic validation PSNR/SSIM during training (0 = off). The reference's
    # acceptance ladder is defined on val PSNR (EXPERIMENTS.md:424-437).
    eval_every_steps: int = 0
    output_dir: str = "outputs"
    mesh_model: int = 1
    param_sharding: str = "replicate"  # 'replicate' | 'fsdp' | 'tensor'
    mu_dtype: str | None = None  # 'bfloat16' halves AdamW's first moment
    optimizer: str = "adamw"  # 'adamw' | 'adafactor' (1B-scale single-chip)
    # EMA shadow of the params (0 = off). The r3 256px run's val PSNR dipped
    # 2.6 dB below its best at the final step; EMA + best-ckpt retention make
    # "the checkpoint" the good model. DiT had this; the VAE now does too.
    ema_decay: float = 0.0
    # Keep a separate best-val-PSNR checkpoint under checkpoints_best/
    # (orbax max_to_keep retains the LATEST N, which loses the best model
    # when training ends on a dip). Needs eval_every_steps + val batches.
    keep_best: bool = True
    # Stage 2: rescale the GAN term by the VQGAN adaptive rule
    # ||grad_last L_rec|| / ||grad_last L_gan|| (what the reference's unused
    # get_last_layer exists for; SURVEY §2.3).
    gan_adaptive_weight: bool = False
    # VQGAN disc_start analogue, counted on the DISCRIMINATOR's steps: the
    # generator's GAN term is zeroed until the fresh discriminator has taken
    # this many steps. DEFAULT 0 (off): five measured r4/r5 runs showed ANY
    # discriminator head start destabilizes the generator at handoff, while
    # the cold-start adaptive-ratio explosion warmup was masking is fixed
    # properly by gan_adaptive_max. Both nets co-evolving from scratch is the
    # stable regime (13k-step r3 run; RESULTS/two_stage_tiny256_s2_*.json
    # negative results document every other schedule tried).
    gan_warmup_steps: int = 0
    # Linear 0 -> 1 ramp of the GAN term after the warmup gate (1 = step
    # function = default, matching warmup 0; only meaningful with a warmup).
    gan_ramp_steps: int = 1
    # Clamp on the VQGAN adaptive ratio. 1.0 = down-only (the GAN term never
    # outweighs the reconstruction gradient at the last layer); VQGAN's own
    # 1e4 permits the measured 41.9x explosion.
    gan_adaptive_max: float = 1.0
    # Discriminator updates are zeroed while its current-batch loss is below
    # this floor — the "don't let D win" control (see make_gan_train_step;
    # r5 attempt 3: D abruptly reached perfect separation and the runaway
    # destroyed reconstructions in 100 steps even with warmup+ramp+clamp).
    # Hinge loss: ~2.0 untrained, 0.0 at perfect separation.
    gan_disc_loss_floor: float = 0.6
    # R1 gradient penalty on the discriminator (StyleGAN slope control;
    # 0 = off). Bounds ∂D/∂x — the hinge loss bounds outputs, not slope.
    # DEFAULT ON at 10: six r4/r5 stage-2 runs without it collapsed with the
    # same measured signature (gen grad_norm exploding through D's growing
    # Lipschitz constant, e.g. 9.8 -> inf in 600 steps while the game's
    # outputs stayed balanced); the attempt-7 run with gamma=10 held l1 and
    # val PSNR at stage-1 levels through the same window. See PERFORMANCE.md
    # "GAN stage-2".
    gan_r1_gamma: float = 10.0
    # 'constant' (reference recipe: warmup then flat) or 'cosine' (warmup
    # then cosine decay over num_epochs*steps_per_epoch — the r3 val-PSNR
    # dip A/B lever).
    lr_schedule: str = "constant"
    # Divergence circuit breaker: halt when the selection PSNR sits more than
    # divergence_halt_db below the run's best for divergence_patience
    # consecutive evals (0 disables). The NaN guard cannot catch a FINITE
    # collapse: the r4 stage-2 adaptive-weight explosion pinned val PSNR at
    # 10.6 dB for 2,500 steps of burned chip time with no breaker. Patience
    # of 3 tolerates transient early-training dips; a real collapse (dead
    # decoder) never recovers on its own.
    divergence_halt_db: float = 5.0
    divergence_patience: int = 3
    # On resume, advance the data stream by the restored step count so the
    # run continues from its exact data position instead of replaying the
    # stream prefix (one batch is consumed per optimizer step; grad accum
    # microbatching lives inside the step). Off by default: fast-forwarding
    # a streaming/decoded source costs one decode per skipped batch, and the
    # reference's own resume semantics also restart the sampler (ref:
    # train_2.py:478-497 restores step/epoch but DataLoader order resets).
    skip_data_on_resume: bool = False


class Trainer:
    def __init__(self, model_config: TransVAEConfig, train_config: TrainerConfig,
                 teacher_fn=None):
        self.model_config = model_config
        self.cfg = train_config
        self.model = TransVAE(model_config)
        # Data-axis size must divide the global batch; drop to the largest
        # divisor (a subset mesh) rather than crashing on small debug batches.
        import math

        n = len(jax.devices())
        avail = n // train_config.mesh_model
        data = math.gcd(train_config.batch_size, avail)
        devices = jax.devices()[: data * train_config.mesh_model]
        self.mesh = create_mesh(data=data, model=train_config.mesh_model,
                                devices=devices)
        self.teacher_fn = teacher_fn
        # VF projection width: taken from the teacher so create_state can
        # build vf_proj eagerly (reference defect §2.9.4 — lazy projection
        # never reached the optimizer).
        self.dino_dim = getattr(teacher_fn, "feature_dim", None)

        lpips_params = None
        perceptual_fn = None
        if train_config.perceptual == "self":
            if not train_config.perceptual_checkpoint:
                raise ValueError(
                    "perceptual='self' needs perceptual_checkpoint (a trained "
                    "checkpoint whose frozen encoder becomes the feature net)")
            from ..losses import make_self_perceptual
            from .checkpoint import load_config, restore_model_params

            fcfg = load_config(train_config.perceptual_checkpoint)
            fparams = restore_model_params(train_config.perceptual_checkpoint)
            perceptual_fn = make_self_perceptual(TransVAE(fcfg), fparams)
            print("[trainer] perceptual=self: LPIPS slot uses the frozen "
                  f"encoder from {train_config.perceptual_checkpoint} "
                  "(self-perceptual distance, NOT VGG-LPIPS)")
        elif (train_config.perceptual == "vgg" and train_config.use_lpips
              and train_config.weights.lpips > 0):
            lpips_params = get_lpips_params()
            if not lpips_params_available():
                print("[trainer] WARNING: no pretrained LPIPS weights found; "
                      "using random-init VGG (run scripts/convert_lpips_weights.py)")
        elif train_config.perceptual not in ("vgg", "self"):
            raise ValueError(
                f"perceptual must be vgg|self, got {train_config.perceptual!r}")
        self.lpips_params = lpips_params
        self.perceptual_fn = perceptual_fn

        schedule = None
        if train_config.lr_schedule == "cosine":
            from .schedule import warmup_cosine

            schedule = warmup_cosine(
                train_config.learning_rate, train_config.warmup_steps,
                train_config.num_epochs * train_config.steps_per_epoch)
        elif train_config.lr_schedule != "constant":
            raise ValueError(
                f"lr_schedule must be constant|cosine, got "
                f"{train_config.lr_schedule!r}")
        self.tx = make_optimizer(
            learning_rate=train_config.learning_rate,
            warmup_steps=train_config.warmup_steps,
            max_grad_norm=train_config.max_grad_norm,
            freeze_encoder=train_config.freeze_encoder,
            mu_dtype=train_config.mu_dtype,
            optimizer=train_config.optimizer,
            schedule=schedule)

        # Stage 2: adversarial finetune with a real PatchGAN discriminator
        # (the reference wires the flags but always passes discriminator=None;
        # SURVEY.md §2.3).
        self.use_gan = train_config.weights.gan > 0
        if self.use_gan:
            from ..models.discriminator import PatchDiscriminator
            from .train_step import make_gan_train_step

            self.disc = PatchDiscriminator(
                dtype=model_config.compute_dtype,
                param_dtype=model_config.params_dtype)
            self.disc_tx = make_optimizer(
                learning_rate=train_config.learning_rate,
                warmup_steps=0, max_grad_norm=train_config.max_grad_norm)
            self._gan_step = make_gan_train_step(
                self.model, self.disc, self.tx, self.disc_tx,
                train_config.weights, lpips_params=lpips_params,
                perceptual_fn=perceptual_fn,
                teacher_fn=teacher_fn,
                adaptive_weight=train_config.gan_adaptive_weight,
                ema_decay=train_config.ema_decay or None,
                gan_warmup_steps=train_config.gan_warmup_steps,
                gan_ramp_steps=train_config.gan_ramp_steps,
                adaptive_max=train_config.gan_adaptive_max,
                disc_loss_floor=train_config.gan_disc_loss_floor,
                r1_gamma=train_config.gan_r1_gamma)
            self._disc_state = None

            def gan_adapter(state, batch, rng):
                self._ensure_disc_state(batch)
                state, self._disc_state, metrics = self._gan_step(
                    state, self._disc_state, batch, rng)
                return state, metrics

            self.step_fn = gan_adapter
        else:
            self.disc = None
            self.step_fn = make_train_step(
                self.model, self.tx, train_config.weights,
                lpips_params=lpips_params, perceptual_fn=perceptual_fn,
                teacher_fn=teacher_fn,
                accum_steps=train_config.accum_steps,
                ema_decay=train_config.ema_decay or None)
        self._writer = None
        self._best_psnr = float("-inf")

    # -- state -----------------------------------------------------------
    def create_state(self, rng: jax.Array, dino_dim: int | None = None
                     ) -> TrainState:
        params = {"model": init_params(
            self.model, rng, image_size=self.cfg.resolution)}
        if self.teacher_fn is not None and dino_dim:
            params["vf_proj"] = make_vf_proj_params(
                rng, self.model_config.latent_dim, dino_dim)
        params = shard_params(self.mesh, params, self.cfg.param_sharding)
        if self.cfg.ema_decay:
            return init_ema_train_state(params, self.tx)
        return init_train_state(params, self.tx)

    def _ensure_disc_state(self, batch=None) -> TrainState:
        """Lazily init the discriminator train state. ``batch`` only supplies
        the init shape; PatchGAN is fully convolutional, so a dummy
        [1, res, res, 3] works when no batch is at hand (resume time)."""
        if self._disc_state is None:
            import jax.numpy as jnp

            if batch is None:
                res = self.cfg.resolution
                batch = jnp.zeros((1, res, res, 3),
                                  self.model_config.compute_dtype)
            dvars = self.disc.init(jax.random.PRNGKey(self.cfg.seed + 1),
                                   jnp_zeros_like_batch(batch))
            self._disc_state = init_train_state(
                {"model": dvars["params"]}, self.disc_tx)
        return self._disc_state

    def maybe_resume(self, state: TrainState) -> tuple[TrainState, int]:
        ckpt_dir = os.path.join(self.cfg.output_dir, "checkpoints")
        step = latest_step(ckpt_dir)
        if step is None:
            return state, 0
        # Structured restore: orbax must be given the live pytree as the
        # target or it returns plain dicts in place of the optax NamedTuples
        # (ApplyIfFiniteState etc.), which breaks tx.update on the first
        # post-resume step. Build the abstract payload from the fresh state;
        # on-disk key metadata decides whether discriminator state is present
        # (stage-2 resume) or not (fresh stage 2 from a stage-1 checkpoint).
        from .checkpoint import checkpoint_state_keys

        # Abstract leaves carry explicit target shardings: params keep their
        # mesh layout; scalars (step, optimizer counters) restore replicated
        # on the SAME mesh — orbax would otherwise commit them to one device,
        # which jit rejects against the mesh-committed params.
        from jax.sharding import NamedSharding, PartitionSpec

        def _abstract_leaf(x):
            s = getattr(x, "sharding", None)
            if not isinstance(s, NamedSharding):
                s = NamedSharding(self.mesh, PartitionSpec())
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

        abstract_src = {"params": state.params, "opt_state": state.opt_state,
                        "step": state.step}
        if getattr(state, "ema_params", None) is not None:
            abstract_src["ema_params"] = state.ema_params
        abstract = jax.tree_util.tree_map(_abstract_leaf, abstract_src)
        # Unreadable metadata means we cannot tell a same-stage resume from a
        # stage hand-off — degrading to a params-only restore here would
        # silently reset the optimizer mid-run, so fail loudly instead
        # (ADVICE r3: do not paper over a corrupt/unreadable checkpoint).
        keys = checkpoint_state_keys(ckpt_dir, step)
        if self.use_gan and "disc_params" in keys:
            disc_state = self._ensure_disc_state()
            abstract["disc_params"] = jax.tree_util.tree_map(
                _abstract_leaf, disc_state.params)
            abstract["disc_opt_state"] = jax.tree_util.tree_map(
                _abstract_leaf, disc_state.opt_state)
            if "disc_step" in keys:
                abstract["disc_step"] = _abstract_leaf(disc_state.step)
        use_abstract = keys == set(abstract)
        try:
            payload, meta = restore_checkpoint(
                ckpt_dir, abstract_state=abstract if use_abstract else None)
        except (ValueError, KeyError, TypeError) as e:
            # Narrowed to tree-structure mismatch errors: genuine I/O or
            # corruption errors (OSError etc.) must surface, not silently
            # downgrade the restore (ADVICE r3).
            if not use_abstract:
                raise
            # Top-level keys matched but the inner tree didn't — e.g. the
            # stage-2 optimizer partitions differently (freeze_encoder), so
            # the saved opt_state has another structure. Restore raw and keep
            # the fresh optimizer (the right semantic for a stage hand-off).
            print(f"[trainer] structured restore failed ({type(e).__name__}); "
                  "falling back to params/step-only restore")
            use_abstract = False
            payload, meta = restore_checkpoint(ckpt_dir)
        import jax.numpy as jnp

        # Orbax restores the scalar step committed to a single device; keep it
        # uncommitted so jit can co-locate it with the mesh-sharded params.
        step_val = jnp.asarray(int(payload["step"]), jnp.int32)
        if use_abstract:
            state = state.replace(step=step_val,
                                  params=payload["params"],
                                  opt_state=payload["opt_state"],
                                  **({"ema_params": payload["ema_params"]}
                                     if "ema_params" in payload else {}))
        else:
            # Raw restore loses the optax NamedTuple structure; a raw-dict
            # opt_state would crash tx.update, so keep the fresh optimizer
            # state (params and step restore fine — they are plain pytrees).
            print("[trainer] WARNING: checkpoint keys "
                  f"{sorted(keys)} do not match the "
                  "live state; restoring params/step only (optimizer state "
                  "reset)")
            restored_params = jax.device_put(
                payload["params"],
                jax.tree_util.tree_map(lambda x: x.sharding, state.params))
            state = state.replace(step=step_val, params=restored_params)
            if getattr(state, "ema_params", None) is not None:
                # Stage hand-off: restart the EMA shadow from the restored
                # params (the saved shadow, if any, tracked another stage).
                state = state.replace(ema_params=jax.tree_util.tree_map(
                    jnp.copy, restored_params))
        if self.use_gan and use_abstract and "disc_params" in payload:
            # The discriminator keeps its OWN step (gan_warmup_steps is keyed
            # on it): seeding it from the generator's cumulative step would
            # open the warmup gate immediately on any resumed stage-2 run —
            # a preemption during warmup would then resume straight into the
            # un-warmed adaptive-weight explosion the gate prevents (ADVICE
            # r4). Old checkpoints without disc_step restart the warmup (0) —
            # a safe second warmup, never a skipped one.
            self._disc_state = TrainState(
                step=jnp.asarray(int(payload.get("disc_step", 0)), jnp.int32),
                params=payload["disc_params"],
                opt_state=payload["disc_opt_state"])
        # Seed best-checkpoint tracking from a prior best dir so a resumed
        # run can't overwrite a better earlier checkpoint with a worse one.
        from .checkpoint import checkpoint_metrics

        best_meta = checkpoint_metrics(
            os.path.join(self.cfg.output_dir, "checkpoints_best"))
        if best_meta is not None:
            self._best_psnr = self._selection_psnr(best_meta)
        print(f"[trainer] resumed from step {int(state.step)} "
              f"(epoch {meta['epoch']})")
        return state, meta["epoch"]

    # -- validation -------------------------------------------------------
    def evaluate(self, state: TrainState, val_batches: list) -> dict:
        """Mean PSNR/SSIM over fixed validation batches (the reference's
        acceptance metric — val PSNR, EXPERIMENTS.md:424-437). With EMA
        enabled the shadow params are scored too (val_psnr_ema, ...) — the
        EMA model is what best-checkpoint selection and users should get."""
        from ..evaluation import make_metric_step

        if not hasattr(self, "_metric_step"):
            self._metric_step = make_metric_step(self.model)

        def run(model_params) -> dict:
            vals: dict[str, list] = {}
            for batch in val_batches:
                import jax.numpy as jnp

                _, m = self._metric_step(model_params, jnp.asarray(batch))
                for k, v in m.items():
                    vals.setdefault(k, []).append(np.asarray(v))
            return {k: float(np.concatenate(v).mean())
                    for k, v in vals.items()}

        out = {f"val_{k}": v for k, v in run(state.params["model"]).items()}
        if getattr(state, "ema_params", None) is not None:
            out.update({f"val_{k}_ema": v for k, v in
                        run(state.ema_params["model"]).items()})
        return out

    def _selection_psnr(self, val: dict) -> float:
        """The PSNR used for best-checkpoint selection: EMA when available."""
        return val.get("val_psnr_ema", val.get("val_psnr", float("-inf")))

    # -- loop ------------------------------------------------------------
    def fit(self, data_iter: Iterator[np.ndarray],
            state: TrainState | None = None,
            val_batches: list | None = None) -> TrainState:
        """Run the training loop.

        Note on epoch-end partial accumulation (ref train_2.py:387-402):
        grad accumulation here lives INSIDE the jitted step (a lax.scan over
        microbatches of one full batch), so no accumulation state ever spans
        loop iterations — there is nothing to flush. The ragged final batch
        of a finite dataset is dropped by batch_iterator(drop_last=True),
        matching the reference DataLoader's drop_last.
        """
        from ..utils.logging import MetricWriter, RunHistory, StepTimer

        # Dev-mode numerical sanitizer (SURVEY.md §5 "race detection" analogue):
        # the NaN-guard in the optimizer chain skips bad steps in production;
        # DEEPL_DEBUG_NANS=1 additionally makes JAX raise at the faulting op.
        if os.environ.get("DEEPL_DEBUG_NANS"):
            jax.config.update("jax_debug_nans", True)

        # Preemption-safe shutdown: preemptible TPU VMs get SIGTERM with a
        # short grace window. Trap it (and Ctrl-C), finish the in-flight step,
        # checkpoint, and return — maybe_resume picks the run back up exactly
        # where it stopped. The reference can lose up to save_every_epochs of
        # work on preemption (ref: train.py:739-742 saves on epoch boundaries
        # only). Handlers are restored on exit; a second signal during the
        # final save falls through to the previous handler.
        import signal

        stop_signal: list[int | None] = [None]
        prev_handlers: dict[int, Any] = {}

        def _request_stop(signum, frame):
            if stop_signal[0] is not None:  # second signal: don't swallow it
                prev = prev_handlers.get(signum)
                signal.signal(signum, prev or signal.SIG_DFL)
                raise KeyboardInterrupt
            stop_signal[0] = signum
            print(f"[trainer] received signal {signum}: will checkpoint and "
                  "stop after the current step")

        # Handlers go in immediately before the try so EVERY exit path —
        # including failures in state setup / resume / writer construction —
        # restores them and closes the writer (ADVICE r4).
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # not the main thread (e.g. under a test runner)
                pass
        writer = None
        try:
            rng = jax.random.PRNGKey(self.cfg.seed)
            if state is None:
                state = self.create_state(rng, dino_dim=self.dino_dim)
            state, start_epoch = self.maybe_resume(state)
            writer = MetricWriter(os.path.join(self.cfg.output_dir, "tb"))
            history = RunHistory(os.path.join(self.cfg.output_dir,
                                              "history.jsonl"))
            sharding = batch_sharding(self.mesh)
            timer = StepTimer()

            # Host-side step counter: reading state.step back every iteration
            # would force a device sync per step and serialize the pipeline;
            # sync happens only on log/save boundaries.
            step = int(state.step)
            if step and self.cfg.skip_data_on_resume:
                print(f"[trainer] skip_data_on_resume: advancing the data "
                      f"stream by {step} batches to the resume point")
                for _ in range(step):
                    if next(data_iter, None) is None:
                        break
            state = self._fit_loop(state, data_iter, val_batches, writer,
                                   history, sharding, timer, rng, step,
                                   start_epoch, stop_signal)
        finally:
            for sig, prev in prev_handlers.items():
                signal.signal(sig, prev)
            if writer is not None:
                writer.close()
        return state

    def _fit_loop(self, state, data_iter, val_batches, writer, history,
                  sharding, timer, rng, step, start_epoch, stop_signal):
        # Finite-collapse circuit breaker state (see divergence_halt_db).
        diverged_evals = 0
        # Mid-epoch resume (signal-stopped runs save anywhere): finish the
        # interrupted epoch rather than rerunning it in full, which would
        # overshoot num_epochs*steps_per_epoch and train past the cosine
        # schedule's decay horizon at the floor LR (ADVICE r4).
        resume_offset = step % self.cfg.steps_per_epoch
        for epoch in range(start_epoch, self.cfg.num_epochs):
            # Epoch averages are over the sampled log points (every log_every
            # steps) — the reference averages every step, but that costs a
            # D2H sync per step, which this loop deliberately avoids.
            epoch_metrics: list[dict] = []
            n_steps = self.cfg.steps_per_epoch
            if epoch == start_epoch and resume_offset:
                n_steps -= resume_offset
            for _ in range(n_steps):
                try:
                    batch = next(data_iter)
                except StopIteration:
                    break
                if not isinstance(batch, jax.Array):
                    batch = jax.device_put(batch, sharding)
                state, metrics = self.step_fn(state, batch, rng)
                timer.tick(self.cfg.batch_size)
                step += 1
                if (self.cfg.save_every_steps
                        and step % self.cfg.save_every_steps == 0):
                    self.save(state, epoch)
                if step % self.cfg.log_every == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    host["images_per_sec"] = timer.images_per_sec
                    writer.scalars(step, host)
                    history.append(step, host, kind="train")
                    epoch_metrics.append(host)
                    print(f"[trainer] epoch {epoch} step {step} "
                          f"loss {host['total']:.4f} "
                          f"({host['images_per_sec']:.1f} img/s)")
                if (self.cfg.eval_every_steps and val_batches
                        and step % self.cfg.eval_every_steps == 0):
                    val = self.evaluate(state, val_batches)
                    writer.scalars(step, val)
                    history.append(step, val, kind="val")
                    ema_str = (f" ema {val['val_psnr_ema']:.2f}"
                               if "val_psnr_ema" in val else "")
                    print(f"[trainer] epoch {epoch} step {step} "
                          f"val_psnr {val['val_psnr']:.2f} dB{ema_str} "
                          f"val_ssim {val['val_ssim']:.4f}")
                    sel = self._selection_psnr(val)
                    if self.cfg.keep_best and sel > self._best_psnr:
                        self._best_psnr = sel
                        self.save(state, epoch, best=True, val=val)
                    # The breaker watches the RAW val PSNR, not the EMA
                    # selection metric: an EMA shadow lags a collapse by
                    # thousands of steps (r5 attempt 3: raw fell 32.7 -> 11.8
                    # in one eval interval while the EMA still read 33.4).
                    raw = val.get("val_psnr", sel)
                    self._best_raw_psnr = max(
                        getattr(self, "_best_raw_psnr", float("-inf")), raw)
                    if (self.cfg.divergence_halt_db > 0
                            and np.isfinite(self._best_raw_psnr)
                            and raw < self._best_raw_psnr
                            - self.cfg.divergence_halt_db):
                        diverged_evals += 1
                        if diverged_evals >= self.cfg.divergence_patience:
                            self.save(state, epoch)
                            print(
                                f"[trainer] DIVERGENCE HALT: raw val PSNR "
                                f"{raw:.2f} dB has sat more than "
                                f"{self.cfg.divergence_halt_db:.1f} dB below "
                                f"the best ({self._best_raw_psnr:.2f} dB) for "
                                f"{diverged_evals} consecutive evals — the "
                                "model has collapsed and will not recover. "
                                "Halting; resume from checkpoints_best/ with "
                                "adjusted hyperparameters.")
                            return state
                    else:
                        diverged_evals = 0
                if stop_signal[0] is not None:
                    break
            if stop_signal[0] is not None:
                self.save(state, epoch)
                print(f"[trainer] stopped by signal {stop_signal[0]} at step "
                      f"{step}; checkpoint saved, resume with the same "
                      "--output_dir")
                break
            if epoch_metrics:  # epoch-average logging (ref prints epoch avg)
                avg = {f"epoch_avg/{k}": float(np.mean([m[k]
                                                        for m in epoch_metrics]))
                       for k in epoch_metrics[0]}
                writer.scalars(step, avg)
                print(f"[trainer] epoch {epoch} done: avg loss "
                      f"{avg['epoch_avg/total']:.4f} over "
                      f"{len(epoch_metrics)} log points")
            if ((epoch + 1) % self.cfg.save_every_epochs == 0
                    or epoch == self.cfg.num_epochs - 1):
                self.save(state, epoch)
        return state

    def save(self, state: TrainState, epoch: int, best: bool = False,
             val: dict | None = None) -> None:
        """Save a training checkpoint. With best=True, saves to the separate
        checkpoints_best/ dir (max_to_keep=1) with the val metrics in meta —
        the checkpoint users should evaluate/resume from."""
        ckpt_dir = os.path.join(
            self.cfg.output_dir, "checkpoints_best" if best else "checkpoints")
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = state.ema_params
        if self.use_gan and getattr(self, "_disc_state", None) is not None:
            payload["disc_params"] = self._disc_state.params
            payload["disc_opt_state"] = self._disc_state.opt_state
            payload["disc_step"] = self._disc_state.step
        # attention_impl is an execution policy, not architecture: persist
        # the inference-tuned dispatch so serve/evaluate/from_pretrained don't
        # inherit the training-only 'auto_train' band (measured slower for
        # forward-only use; PERFORMANCE.md).
        saved_cfg = self.model_config
        if saved_cfg.attention_impl == "auto_train":
            saved_cfg = saved_cfg.replace(attention_impl="auto")
        save_checkpoint(ckpt_dir, int(state.step), payload,
                        epoch=epoch, config=saved_cfg,
                        max_to_keep=1 if best else 3,
                        metrics=val if best else None)
        tag = " (new best)" if best else ""
        print(f"[trainer] saved checkpoint at step {int(state.step)}{tag}")
