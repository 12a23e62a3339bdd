"""TransVAE training losses as pure functions (patched reference semantics).

Reference behavior (patched transvae/losses/vae_loss.py:21-173, the
authoritative tree per SURVEY.md §2.3):

- The decoder emits unbounded logits → ``sigmoid`` is applied *inside the loss*
  for every image-space term; targets are [0,1].
- L1 on [0,1] images; LPIPS inputs mapped to [-1,1] and clamped.
- KL in fp32 with logvar clamped to (-30, 20), reduced by ``mean`` over all
  elements.
- Per-term zeros when a weight is 0; ``total`` is the explicit sum.
- VF alignment to a frozen teacher (DINOv2) with an **eagerly created**
  projection (fixing reference defect §2.9.4 where the lazy nn.Linear was
  invisible to the optimizer/DDP).

Everything here is functional and jit-safe: no modules, no state — parameters
(LPIPS net, VF projection) are explicit arguments so the whole loss fuses into
the compiled train step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .lpips import lpips as lpips_distance


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Defaults per the reference (patched vae_loss.py:31-38)."""

    l1: float = 1.0
    lpips: float = 1.0
    kl: float = 1e-8
    vf: float = 0.1
    gan: float = 0.05
    logvar_clip: tuple = (-30.0, 20.0)


def l1_loss(recon_img: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(recon_img.astype(jnp.float32) -
                            target.astype(jnp.float32)))


def kl_divergence(mu: jax.Array, logvar: jax.Array,
                  clip: tuple = (-30.0, 20.0)) -> jax.Array:
    """Mean KL(q(z|x) || N(0,1)) in fp32 (patched vae_loss.py:96-102)."""
    mu32 = mu.astype(jnp.float32)
    logvar32 = jnp.clip(logvar.astype(jnp.float32), clip[0], clip[1])
    kl = -0.5 * (1.0 + logvar32 - jnp.square(mu32) - jnp.exp(logvar32))
    return jnp.mean(kl)


def vf_loss(latent: jax.Array, dino_features: jax.Array,
            proj_kernel: jax.Array, proj_bias: jax.Array,
            margin: float = 0.4) -> jax.Array:
    """Visual-feature alignment loss (patched vae_loss.py:125-172).

    Args:
      latent: [B, h, w, D] (NHWC) VAE latent (mu).
      dino_features: [B, hd, wd, C_dino] frozen teacher feature map.
      proj_kernel/proj_bias: eager D→C_dino projection params ([D, C], [C]).
      margin: hinge margin (temperature exists in the reference ctor but is
        unused in its formula; we drop it).
    """
    lat = latent.astype(jnp.float32)
    b, h, w, d = lat.shape
    _, hd, wd, cd = dino_features.shape
    if (h, w) != (hd, wd):
        lat = jax.image.resize(lat, (b, hd, wd, d), method="bilinear")
    if d != cd:
        lat = lat @ proj_kernel.astype(jnp.float32) + proj_bias.astype(jnp.float32)
    lat_n = lat / (jnp.linalg.norm(lat, axis=-1, keepdims=True) + 1e-8)
    din = dino_features.astype(jnp.float32)
    din_n = din / (jnp.linalg.norm(din, axis=-1, keepdims=True) + 1e-8)
    similarity = jnp.mean(jnp.sum(lat_n * din_n, axis=-1))
    return jnp.maximum(margin - similarity, 0.0)


def gan_generator_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating BCE-with-logits generator loss vs. ones
    (ref: vae_loss.py:114-117): softplus(-D(G(x)))."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def discriminator_loss(real_logits: jax.Array, fake_logits: jax.Array,
                       kind: str = "hinge") -> jax.Array:
    """D-side GAN loss, bce/hinge/wgan variants (ref main-tree
    vae_loss.py:199-244)."""
    real = real_logits.astype(jnp.float32)
    fake = fake_logits.astype(jnp.float32)
    if kind == "bce":
        return jnp.mean(jax.nn.softplus(-real)) + jnp.mean(jax.nn.softplus(fake))
    if kind == "hinge":
        return jnp.mean(jax.nn.relu(1.0 - real)) + jnp.mean(jax.nn.relu(1.0 + fake))
    if kind == "wgan":
        return jnp.mean(fake) - jnp.mean(real)
    raise ValueError(f"Unknown GAN loss kind: {kind!r}")


def make_self_perceptual(model, frozen_params) -> Callable:
    """Perceptual distance from the model's OWN trained encoder (frozen).

    The reference's perceptual term is LPIPS over pretrained VGG16 features
    (patched vae_loss.py:52-54, 80-95); this environment has no pretrained
    weights (WEIGHTS.md), and a random-init VGG is perceptually meaningless.
    This is the honest in-env substitute: features = the frozen encoder's mu
    map from a trained checkpoint (the latent space a linear probe shows is
    semantically organized — RESULTS/latent_probe_tiny256.json), unit-
    normalized channel-wise and compared by squared distance, i.e. LPIPS's
    functional form with the learned heads replaced by uniform weights.
    Labeled 'self-perceptual' in run args wherever used — NOT LPIPS parity.

    Returns fn(recon_img01, target01) -> [B] distances.
    """
    # Remat the feature forward: the recon-side backward re-traverses the
    # frozen encoder, and storing its full activations alongside the main
    # model's OOMs a 16 GB chip at 256px b16 (measured r5); recomputing them
    # costs one extra encoder forward instead.
    @jax.checkpoint
    def feats(x):
        mu, _ = model.apply({"params": frozen_params}, x, method="encode")
        f = mu.astype(jnp.float32)
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

    def fn(recon_img: jax.Array, target: jax.Array) -> jax.Array:
        fr, ft = feats(recon_img), feats(jax.lax.stop_gradient(target))
        return jnp.mean(jnp.square(fr - ft), axis=(1, 2, 3))

    return fn


def transvae_loss(
    recon_logits: jax.Array,
    target: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    weights: LossWeights = LossWeights(),
    *,
    lpips_params: Any | None = None,
    perceptual_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    vf_proj: tuple[jax.Array, jax.Array] | None = None,
    dino_features: jax.Array | None = None,
    disc_apply: Callable[[jax.Array], jax.Array] | None = None,
) -> dict[str, jax.Array]:
    """Combined weighted loss; returns a dict with per-term values and 'total'.

    All terms computed in fp32 (the reference computes the loss outside
    autocast; ref train_working.py:352-362). ``perceptual_fn`` (images in
    [0,1] -> [B] distances) replaces the VGG-LPIPS term when given — see
    make_self_perceptual.
    """
    zero = jnp.zeros((), jnp.float32)
    losses: dict[str, jax.Array] = {}

    recon_img = jax.nn.sigmoid(recon_logits.astype(jnp.float32))
    target32 = target.astype(jnp.float32)

    losses["l1"] = (l1_loss(recon_img, target32) * weights.l1
                    if weights.l1 > 0 else zero)

    if weights.lpips > 0 and perceptual_fn is not None:
        losses["lpips"] = jnp.mean(
            perceptual_fn(recon_img, target32)) * weights.lpips
    elif weights.lpips > 0 and lpips_params is not None:
        recon_lp = jnp.clip(recon_img * 2.0 - 1.0, -1.0, 1.0)
        targ_lp = jnp.clip(target32 * 2.0 - 1.0, -1.0, 1.0)
        losses["lpips"] = jnp.mean(
            lpips_distance(lpips_params, recon_lp, targ_lp)) * weights.lpips
    else:
        losses["lpips"] = zero

    losses["kl"] = (kl_divergence(mu, logvar, weights.logvar_clip) * weights.kl
                    if weights.kl > 0 else zero)

    if weights.vf > 0 and dino_features is not None and vf_proj is not None:
        losses["vf"] = vf_loss(mu, dino_features, *vf_proj) * weights.vf
    else:
        losses["vf"] = zero

    if weights.gan > 0 and disc_apply is not None:
        fake_logits = disc_apply(recon_img)
        losses["gan"] = gan_generator_loss(fake_logits) * weights.gan
    else:
        losses["gan"] = zero

    losses["total"] = (losses["l1"] + losses["lpips"] + losses["kl"] +
                       losses["vf"] + losses["gan"])
    return losses
