"""Rectified-flow training + sampling for the latent DiT.

The paper's Table 2(b) pipeline (LightningDiT on TransVAE latents; the
reference repo does not ship it — SURVEY.md §6) as a framework-native
harness: flow matching / rectified flow, the objective LightningDiT uses.

    x_t = (1 - t)·x0 + t·ε,   target v = ε - x0,   L = ||v_θ(x_t,t,y) - v||²

Sampling integrates dx/dt = -v_θ from t=1 (noise) to t=0 (data) with Euler
steps, optionally with classifier-free guidance (the DiT trains a null class
for this via label dropout).

Latents are channel-normalized by precomputed per-channel statistics
(`LatentStats`) so the flow sees ~unit-variance inputs regardless of the
tokenizer's latent scale.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .train_step import (  # noqa: F401 (re-export)
    EMATrainState, TrainState, init_ema_train_state, init_train_state)


class LatentStats(struct.PyTreeNode):
    """Per-channel latent normalization: z_norm = (z - mean) / std."""

    mean: jax.Array  # [C]
    std: jax.Array   # [C]

    @staticmethod
    def identity(channels: int) -> "LatentStats":
        return LatentStats(mean=jnp.zeros((channels,), jnp.float32),
                           std=jnp.ones((channels,), jnp.float32))

    @staticmethod
    def from_latents(z: jax.Array) -> "LatentStats":
        m = jnp.mean(z, axis=(0, 1, 2))
        s = jnp.std(z, axis=(0, 1, 2)) + 1e-6
        return LatentStats(mean=m.astype(jnp.float32),
                           std=s.astype(jnp.float32))

    def normalize(self, z: jax.Array) -> jax.Array:
        return (z - self.mean) / self.std

    def denormalize(self, z: jax.Array) -> jax.Array:
        return z * self.std + self.mean


def rectified_flow_loss(model, params, z0: jax.Array, labels: jax.Array,
                        rng: jax.Array, time_sampling: str = "logit_normal"
                        ) -> tuple[jax.Array, dict]:
    """Flow-matching MSE on normalized latents z0 [B,h,w,C]."""
    b = z0.shape[0]
    t_rng, n_rng, d_rng = jax.random.split(rng, 3)
    if time_sampling == "logit_normal":
        # SD3/LightningDiT-style: concentrates capacity at mid-noise levels.
        t = jax.nn.sigmoid(jax.random.normal(t_rng, (b,), jnp.float32))
    else:
        t = jax.random.uniform(t_rng, (b,), jnp.float32)
    noise = jax.random.normal(n_rng, z0.shape, jnp.float32)
    tb = t[:, None, None, None]
    z_t = (1.0 - tb) * z0 + tb * noise
    target = noise - z0
    v, aux_vars = model.apply({"params": params}, z_t, t, labels,
                              deterministic=False,
                              rngs={"label_dropout": d_rng},
                              mutable=["losses"])
    loss = jnp.mean(jnp.square(v.astype(jnp.float32) - target))
    metrics = {"loss": loss, "v_norm": jnp.sqrt(jnp.mean(jnp.square(v)))}
    # Sown auxiliary losses (MoE router load balance, ops/moe.py) — weighted
    # per the model config; a dense model sows nothing and pays nothing.
    aux_w = getattr(getattr(model, "config", None), "moe_aux_weight", 0.0)
    if aux_vars.get("losses"):
        from ..ops.moe import collect_aux_losses

        aux = collect_aux_losses(aux_vars)
        metrics["moe_aux"] = aux
        loss = loss + jnp.float32(aux_w) * aux
        metrics["total"] = loss
    return loss, metrics


def make_dit_train_step(model, tx: optax.GradientTransformation,
                        time_sampling: str = "logit_normal",
                        ema_decay: float | None = None,
                        donate: bool = True):
    """Jitted DiT training step: fn(state, z0, labels, rng) → (state, metrics).

    z0 is the NORMALIZED latent batch [B, h, w, C] (apply LatentStats first,
    on device, typically fused into the data pipeline or the encode step).
    With ema_decay set, ``state`` must be an EMATrainState; the EMA shadow
    updates in the same compiled program.
    """

    def step(state: TrainState, z0, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            functools.partial(rectified_flow_loss, model,
                              time_sampling=time_sampling),
            has_aux=True)(state.params, z0, labels, rng)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = {}
        if ema_decay is not None:
            extra["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, params)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, **extra), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sampler(model, num_steps: int = 50, cfg_scale: float = 1.0,
                 num_classes: int = 1000):
    """Euler rectified-flow sampler, jitted once per (shape, steps).

    fn(params, rng, labels, grid, channels) → normalized latents [B,h,w,C].
    With cfg_scale > 1, runs the conditional and null-class branches batched
    together (one model call per step) and extrapolates.
    """

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def sample(params, rng, labels, grid: int, channels: int):
        b = labels.shape[0]
        z = jax.random.normal(rng, (b, grid, grid, channels), jnp.float32)
        dt = 1.0 / num_steps
        use_cfg = cfg_scale != 1.0
        null = jnp.full_like(labels, num_classes)

        def body(i, z):
            t = jnp.full((b,), 1.0 - i * dt, jnp.float32)
            if use_cfg:
                v2 = model.apply(
                    {"params": params},
                    jnp.concatenate([z, z]), jnp.concatenate([t, t]),
                    jnp.concatenate([labels, null]))
                v_c, v_u = jnp.split(v2, 2, axis=0)
                v = v_u + cfg_scale * (v_c - v_u)
            else:
                v = model.apply({"params": params}, z, t, labels)
            return z - dt * v  # dz/dt = v points data→noise; integrate down

        return jax.lax.fori_loop(0, num_steps, body, z)

    return sample


def generate_images(vae_model, vae_params, dit_model, dit_params,
                    stats: LatentStats, rng: jax.Array, labels: jax.Array,
                    grid: int = 16, num_steps: int = 50,
                    cfg_scale: float = 1.0) -> jax.Array:
    """End-to-end class-conditional generation: DiT sample → denormalize →
    TransVAE decode → sigmoid → [B, H, W, 3] images in [0, 1]."""
    sampler = make_sampler(dit_model, num_steps, cfg_scale,
                           dit_model.config.num_classes)
    z = sampler(dit_params, rng, labels, grid,
                dit_model.config.in_channels)
    z = stats.denormalize(z)
    recon = vae_model.apply({"params": vae_params}, z, method="decode")
    return jax.nn.sigmoid(recon.astype(jnp.float32))


def generation_fid(vae_model, vae_params, dit_model, dit_params,
                   stats: LatentStats, real_batches, feature_fn,
                   rng: jax.Array, num_samples: int = 10_000,
                   batch_size: int = 64, grid: int = 16, num_steps: int = 50,
                   cfg_scale: float = 1.0, unconditional: bool = False) -> float:
    """Class-conditional generation FID (the paper's FID-10K, Table 2b).

    Generates ``num_samples`` images through DiT→TransVAE-decode and computes
    the Fréchet distance to features of ``real_batches`` ([B,H,W,3] in [0,1])
    under ``feature_fn`` (InceptionV3 pool3 for the canonical number; any
    perceptual embedding for relative comparisons in weight-less envs)."""
    import numpy as np

    from ..utils.fid import fid_from_features

    num_classes = dit_model.config.num_classes
    sampler = make_sampler(dit_model, num_steps, cfg_scale, num_classes)
    decode = jax.jit(lambda z: jax.nn.sigmoid(vae_model.apply(
        {"params": vae_params}, z, method="decode").astype(jnp.float32)))

    fake_feats, done = [], 0
    while done < num_samples:
        b = min(batch_size, num_samples - done)
        rng, k1, k2 = jax.random.split(rng, 3)
        if unconditional:
            # Models trained with class_dropout=1.0 (label-less data) only
            # ever saw the null token; random class labels would condition
            # on untrained embeddings.
            labels = jnp.full((b,), num_classes, jnp.int32)
        else:
            labels = jax.random.randint(k1, (b,), 0, num_classes)
        z = sampler(dit_params, k2, labels, grid,
                    dit_model.config.in_channels)
        imgs = decode(stats.denormalize(z))
        fake_feats.append(np.asarray(feature_fn(imgs)))
        done += b

    real_feats, seen = [], 0
    for batch in real_batches:
        batch = np.asarray(batch)
        real_feats.append(np.asarray(feature_fn(jnp.asarray(batch))))
        seen += batch.shape[0]
        if seen >= num_samples:
            break
    # Trim both sides to exactly num_samples (the FID-10K protocol compares
    # equal-sized sets; a ragged final batch would bias the estimate).
    return fid_from_features(np.concatenate(real_feats)[:num_samples],
                             np.concatenate(fake_feats)[:num_samples])


def encode_to_latents(vae_model, vae_params, images: jax.Array,
                      sample: bool = False,
                      rng: jax.Array | None = None) -> jax.Array:
    """Tokenize images → latents (mu by default, matching the paper's use of
    the tokenizer for downstream generation)."""
    mu, logvar = vae_model.apply({"params": vae_params}, images,
                                 method="encode")
    if sample:
        eps = jax.random.normal(rng, mu.shape, jnp.float32)
        return mu + eps * jnp.exp(0.5 * logvar)
    return mu
