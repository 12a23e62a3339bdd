"""The jitted training step: forward, loss, grad, update — one XLA program.

TPU design (vs. the reference's imperative loop, train_2.py:276-405):
- The entire step — bf16 forward, fp32 loss, backward, clip, AdamW, NaN-skip —
  is a single compiled program with donated state (no per-step host sync; the
  reference pays a D2H sync per step for ``loss.item()``).
- Gradient accumulation is a ``lax.scan`` over microbatches with fp32 grad
  accumulators (ref: loss/accum + step-on-boundary, train_2.py:294-363) —
  deterministic and memory-bounded, no optimizer-level MultiSteps state.
- Mixed precision is a dtype policy (params fp32, compute bf16), not autocast:
  there is no GradScaler because bf16 needs no loss scaling
  (ref: train_2.py:303,352-357 uses fp16+GradScaler when bf16 unsupported).
- The NaN guard is optax.apply_if_finite in the chain plus per-term finiteness
  metrics (ref: train_2.py:329-338, train_working.py:298-302).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.vae_loss import LossWeights, discriminator_loss, transvae_loss


class TrainState(struct.PyTreeNode):
    """Carried training state. ``params`` is a dict with 'model' and optionally
    'vf_proj' (the eager VF projection, fixing reference defect §2.9.4)."""

    step: jax.Array
    params: Any
    opt_state: Any


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


class EMATrainState(TrainState):
    """Train state with an exponential-moving-average shadow of the params —
    the standard DiT/LightningDiT evaluation trick (sample/eval from EMA
    weights). The reference repo has no EMA anywhere; this is a framework
    extension (r3 verdict: the VAE's val-PSNR dip needs EMA + best-ckpt)."""

    ema_params: Any = None


def init_ema_train_state(params: Any, tx: optax.GradientTransformation
                         ) -> EMATrainState:
    return EMATrainState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=tx.init(params),
                         ema_params=jax.tree_util.tree_map(jnp.copy, params))


def _ema_update(ema_decay, ema_params, new_params):
    return jax.tree_util.tree_map(
        lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
        ema_params, new_params)


def make_vf_proj_params(rng: jax.Array, latent_dim: int, dino_dim: int) -> dict:
    """Eagerly create the VF projection (D → C_dino) so it is registered with
    the optimizer from step 0 (ref defect: lazy nn.Linear in vae_loss.py:177-182)."""
    k = jax.random.normal(rng, (latent_dim, dino_dim), jnp.float32)
    k = k * (1.0 / jnp.sqrt(latent_dim))
    return {"kernel": k, "bias": jnp.zeros((dino_dim,), jnp.float32)}


def _loss_and_metrics(model, params, images, rng, weights, lpips_params,
                      teacher_fn, disc_apply, perceptual_fn=None):
    recon, mu, logvar = model.apply(
        {"params": params["model"]}, images, rngs={"sample": rng})
    dino_features = teacher_fn(images) if teacher_fn is not None else None
    vf_proj = None
    if "vf_proj" in params:
        vf_proj = (params["vf_proj"]["kernel"], params["vf_proj"]["bias"])
    losses = transvae_loss(
        recon, images, mu, logvar, weights,
        lpips_params=lpips_params, perceptual_fn=perceptual_fn,
        vf_proj=vf_proj,
        dino_features=dino_features, disc_apply=disc_apply)
    metrics = dict(losses)
    metrics["recon_finite_frac"] = jnp.mean(
        jnp.isfinite(recon).astype(jnp.float32))
    metrics["mu_absmax"] = jnp.max(jnp.abs(mu)).astype(jnp.float32)
    return losses["total"], metrics


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    lpips_params: Any | None = None,
    teacher_fn: Callable | None = None,
    disc_apply: Callable | None = None,
    accum_steps: int = 1,
    donate: bool = True,
    param_shardings: Any | None = None,
    ema_decay: float | None = None,
    perceptual_fn: Callable | None = None,
):
    """Build the jitted train step.

    Returns fn(state, batch, rng) -> (new_state, metrics). ``batch`` is
    [B, H, W, C] images in [0, 1]; with accum_steps > 1, B must divide evenly
    and the step scans over microbatches of B // accum_steps.

    param_shardings: optional NamedSharding pytree matching state.params;
    pins the updated params (and their grads) to the FSDP/tensor layout so
    XLA doesn't re-replicate them through the optimizer update.

    ema_decay: with a decay set, ``state`` must be an EMATrainState; the EMA
    shadow tracks the updated params inside the same compiled program.
    """

    def compute_grads(params, batch, rng):
        loss_fn = functools.partial(
            _loss_and_metrics, model, weights=weights,
            lpips_params=lpips_params, teacher_fn=teacher_fn,
            disc_apply=disc_apply, perceptual_fn=perceptual_fn)
        vg = jax.value_and_grad(
            lambda p, im, r: loss_fn(p, im, r), has_aux=True)
        if accum_steps == 1:
            (_, metrics), grads = vg(params, batch, rng)
            return grads, metrics

        b = batch.shape[0]
        micro = b // accum_steps
        micro_batches = batch.reshape(accum_steps, micro, *batch.shape[1:])
        rngs = jax.random.split(rng, accum_steps)

        def body(carry, xs):
            g_acc, m_acc = carry
            mb, r = xs
            (_, metrics), grads = vg(params, mb, r)
            g_acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), g_acc, grads)
            m_acc = jax.tree_util.tree_map(lambda a, m: a + m, m_acc, metrics)
            return (g_acc, m_acc), None

        g0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        # Zero metrics tree with the correct structure (shape-only trace).
        (_, m_shape), _ = jax.eval_shape(vg, params, micro_batches[0], rngs[0])
        m0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.float32), m_shape)
        (g_sum, m_sum), _ = jax.lax.scan(body, (g0, m0), (micro_batches, rngs))
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
        metrics = jax.tree_util.tree_map(lambda m: m * inv, m_sum)
        return grads, metrics

    def train_step(state: TrainState, batch: jax.Array, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        grads, metrics = compute_grads(state.params, batch, rng)
        if param_shardings is not None:
            grads = jax.lax.with_sharding_constraint(grads, param_shardings)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if param_shardings is not None:
            new_params = jax.lax.with_sharding_constraint(
                new_params, param_shardings)
        extra = {}
        if ema_decay is not None:
            extra["ema_params"] = _ema_update(ema_decay, state.ema_params,
                                              new_params)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, **extra)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(model, weights: LossWeights = LossWeights(),
                   lpips_params: Any | None = None):
    """Jitted eval step: deterministic forward (decode the mean), loss terms +
    reconstructions in [0,1]."""

    def eval_step(params: Any, batch: jax.Array):
        model_params = params["model"] if "model" in params else params
        recon, mu, logvar = model.apply(
            {"params": model_params}, batch, sample=False)
        losses = transvae_loss(recon, batch, mu, logvar, weights,
                               lpips_params=lpips_params)
        return jax.nn.sigmoid(recon.astype(jnp.float32)), losses

    return jax.jit(eval_step)


def make_gan_train_step(
    model,
    disc,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    lpips_params: Any | None = None,
    teacher_fn: Callable | None = None,
    disc_loss_kind: str = "hinge",
    adaptive_weight: bool = False,
    ema_decay: float | None = None,
    gan_warmup_steps: int = 0,
    gan_ramp_steps: int = 1,
    adaptive_max: float = 1e4,
    disc_loss_floor: float = 0.0,
    r1_gamma: float = 0.0,
    perceptual_fn: Callable | None = None,
):
    """Stage-2 adversarial step: one generator update + one discriminator
    update per call, compiled together.

    The reference wires GAN flags but never ships a working stage 2
    (discriminator=None everywhere; SURVEY.md §2.3). This makes it real.
    With adaptive_weight=True the GAN term is rescaled by the VQGAN rule
    ||∇_last L_rec|| / ||∇_last L_gan|| computed on the decoder's final conv
    (what the reference's unused get_last_layer exists for), clamped to
    ``adaptive_max``.

    GAN-introduction schedule (keyed on the DISCRIMINATOR's step count, so it
    is stage-2-relative even when the generator resumes from a stage-1
    checkpoint at step 6000), learned the hard way across two measured
    collapses (RESULTS/two_stage_tiny256.json, .._s2_warmuponly):

    - ``gan_warmup_steps`` — VQGAN ``disc_start`` analogue: while the
      discriminator has taken fewer than this many steps, the generator's GAN
      term is zeroed and only the discriminator trains. Without it a random
      discriminator gives near-zero ||∇_last L_gan|| and the adaptive ratio
      explodes (measured 41.9x at stage-2 start, r4: -22 dB val PSNR in 100
      steps).
    - ``gan_ramp_steps`` — after the gate opens, gan_scale rises LINEARLY
      0 -> 1 over this many steps instead of as a step function. The warmup
      gate alone is NOT enough: 500 disc-only steps produce a near-converged
      discriminator (hinge loss ~1e-4), and switching the generator's
      equalized-gradient adversarial term on all at once against it collapsed
      reconstructions a second time (r5 measured: 33.5 -> 7.3 dB within 500
      steps of gate-open). 1 = the old step-function behavior.
    - ``adaptive_max`` — clamp on the adaptive ratio. VQGAN's 1e4 permits the
      41.9x amplification above; 1.0 makes the rule down-only (the GAN term
      never gets MORE last-layer gradient than the reconstruction loss).
    - ``disc_loss_floor`` — the discriminator's updates are ZEROED whenever
      its current-batch loss is already below this floor (0 disables). Ramp +
      clamp alone were still not enough (r5 attempt 3): the game held a
      healthy equilibrium for 400 steps (disc hinge ~1.8, logit means ~0),
      then the discriminator abruptly achieved near-perfect separation
      (hinge 1.8 -> 0.0, real-logit mean 4.6 within 100 steps) and the
      runaway destroyed reconstructions (l1 0.016 -> 0.22). The floor cuts
      that loop at its root: a discriminator that is already winning stops
      training until the generator catches up — the classic "don't let D
      win" control. For the hinge loss, an untrained D sits at ~2.0 and
      perfect separation at 0.0; 0.6 keeps D near the decision boundary.
    - ``r1_gamma`` — R1 gradient penalty γ/2·E[||∇_x D(x_real)||²] on the
      discriminator (StyleGAN's slope control; 0 disables). r5 attempt 5
      exposed why output-side controls are not enough: with the game fully
      balanced (hinge ~2.0, logit means ~0), the generator's grad_norm still
      exploded 9.8 → inf within 600 steps — D's LIPSCHITZ CONSTANT grew in
      an arms race even though its outputs never separated, and the
      generator's gradients flow through that slope. The hinge loss bounds
      D's outputs on data, not its slope; R1 bounds the slope.

    Returns fn(gen_state, disc_state, batch, rng) -> (gen_state, disc_state,
    metrics).
    """
    from ..models.transvae import adaptive_gan_weight, get_last_layer

    def gen_loss_fn(params, disc_params, images, rng, gan_scale):
        def disc_apply(img):
            return disc.apply({"params": disc_params}, img)
        total, metrics = _loss_and_metrics(model, params, images, rng, weights,
                                           lpips_params, teacher_fn, disc_apply,
                                           perceptual_fn=perceptual_fn)
        # Warmup gate: losses["gan"] is the weighted in-total term, so
        # subtracting (1-scale)*gan removes exactly the generator's
        # adversarial pull while the discriminator warms up.
        total = total - (1.0 - gan_scale) * metrics["gan"]
        metrics["gan_scale"] = gan_scale
        metrics["total"] = total
        if adaptive_weight and weights.gan > 0:
            rec = metrics["l1"] + metrics["lpips"]

            def with_last_kernel(kernel):
                m2 = dict(params["model"])
                dec = dict(m2["decoder"])
                co = dict(dec["conv_out"])
                co["kernel"] = kernel
                dec["conv_out"] = co
                m2["decoder"] = dec
                return {**params, "model": m2}

            def last_grad(*loss_names):
                # Differentiating w.r.t. the final conv kernel only — backprop
                # stops at the output head, so this costs one extra forward +
                # a tiny backward, not a full model backward.
                def f(kernel):
                    _, m = _loss_and_metrics(
                        model, with_last_kernel(kernel), images, rng, weights,
                        lpips_params, teacher_fn, disc_apply,
                        perceptual_fn=perceptual_fn)
                    return sum(m[n] for n in loss_names)
                return jax.grad(f)(get_last_layer(params))

            # VQGAN rule: ||grad_last L_rec|| / ||grad_last L_gan|| with
            # L_rec the full reconstruction loss (pixel + perceptual).
            w = adaptive_gan_weight(last_grad("l1", "lpips"),
                                    last_grad("gan"),
                                    max_weight=adaptive_max)
            total = (rec + metrics["kl"] + metrics["vf"]
                     + gan_scale * w * metrics["gan"])
            metrics["adaptive_gan_weight"] = w
            metrics["total"] = total
        return total, metrics

    def disc_loss_fn(disc_params, real, fake):
        real_logits = disc.apply({"params": disc_params}, real)
        fake_logits = disc.apply({"params": disc_params}, fake)
        loss = discriminator_loss(real_logits, fake_logits, disc_loss_kind)
        metrics = {"disc_loss": loss,
                   "disc_real_mean": jnp.mean(real_logits),
                   "disc_fake_mean": jnp.mean(fake_logits)}
        if r1_gamma > 0:
            def dsum(x):
                return jnp.sum(disc.apply({"params": disc_params},
                                          x).astype(jnp.float32))

            g = jax.grad(dsum)(real.astype(jnp.float32))
            r1 = jnp.mean(jnp.sum(
                jnp.square(g.reshape(g.shape[0], -1)), axis=-1))
            loss = loss + 0.5 * r1_gamma * r1
            metrics["disc_r1"] = r1
        return loss, metrics

    def step(gen_state: TrainState, disc_state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, gen_state.step)
        g_rng, _ = jax.random.split(rng)
        # Linear ramp after the warmup gate: 0 while disc_step < warmup, then
        # (disc_step - warmup + 1)/ramp up to 1. ramp=1 reproduces the old
        # step function exactly.
        past_gate = (disc_state.step - gan_warmup_steps + 1).astype(jnp.float32)
        gan_scale = jnp.clip(past_gate / max(gan_ramp_steps, 1), 0.0, 1.0)

        # Generator update (encoder typically frozen via gen_tx partition).
        (_, g_metrics), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gen_state.params,
                                       disc_state.params["model"], batch,
                                       g_rng, gan_scale)
        # A non-finite grad_norm in the logs is the visible trace of
        # apply_if_finite silently skipping updates — the r4 collapse froze
        # params for 2,500 steps with nothing in the metrics to show it.
        g_metrics["grad_norm"] = optax.global_norm(g_grads)
        g_updates, g_opt = gen_tx.update(g_grads, gen_state.opt_state,
                                         gen_state.params)
        g_params = optax.apply_updates(gen_state.params, g_updates)
        extra = {}
        if ema_decay is not None:
            extra["ema_params"] = _ema_update(ema_decay, gen_state.ema_params,
                                              g_params)
        gen_state = gen_state.replace(step=gen_state.step + 1,
                                      params=g_params, opt_state=g_opt,
                                      **extra)

        # Discriminator update on fresh reconstructions (stop-grad through G).
        recon, _, _ = model.apply({"params": gen_state.params["model"]},
                                  batch, rngs={"sample": g_rng})
        fake = jax.lax.stop_gradient(jax.nn.sigmoid(recon.astype(jnp.float32)))
        (_, d_metrics), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(disc_state.params["model"], batch, fake)
        if disc_loss_floor > 0:
            # Freeze D while it is already winning (loss under the floor):
            # zero its grads so the optimizer holds position (moments decay).
            d_scale = (d_metrics["disc_loss"] >= disc_loss_floor).astype(
                jnp.float32)
            d_grads = jax.tree_util.tree_map(lambda g_: g_ * d_scale, d_grads)
            d_metrics = {**d_metrics, "disc_update_scale": d_scale}
        d_updates, d_opt = disc_tx.update(
            {"model": d_grads}, disc_state.opt_state, disc_state.params)
        disc_state = disc_state.replace(step=disc_state.step + 1,
                                        params=optax.apply_updates(
                                            disc_state.params, d_updates),
                                        opt_state=d_opt)

        metrics = {**g_metrics, **d_metrics}
        return gen_state, disc_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))
