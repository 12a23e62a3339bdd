"""TransVAE: hybrid CNN+Transformer variational autoencoder (TPU-native).

Reference API parity (transvae/models/transvae.py:13-310): encode → conv_mu /
conv_logvar 3x3 heads → reparameterize → decode; variant registry;
``create_transvae`` factory; param counting; pretrained loading.

Patched-tree numerical contract is kept throughout (SURVEY.md §2.9.3):
mu clamped to ±50 and logvar to (-30, 20) in ``__call__``; reparameterization in
fp32 with clamped logvar; decoder emits unbounded logits.

Layout contract: **NHWC** ([B, H, W, 3] images, [B, h, w, D] latents) — the
MXU-native layout. `deepl_project_tpu.utils.image` has NCHW<->NHWC helpers for
interop with reference-formatted data.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import TransVAEConfig, get_config
from ..ops.ffn import _conv_kernel_init
from .decoder import TransVAEDecoder
from .encoder import TransVAEEncoder


class TransVAE(nn.Module):
    config: TransVAEConfig

    def setup(self):
        cfg = self.config
        self.encoder = TransVAEEncoder(cfg, name="encoder")
        self.decoder = TransVAEDecoder(cfg, name="decoder")
        # Latent heads use a small-variance init instead of the reference's
        # Kaiming (ref: transvae.py:157-161). With Kaiming, the deep residual
        # encoder's output scale (absmax ~2e3 at init) saturates the mu/logvar
        # clamps: gradients vanish at the clamp, logvar pins at +20 and injects
        # e^10-scale sampling noise — the instability the reference's NaN
        # guards paper over (SURVEY.md §2.9.3). Small init keeps mu/logvar
        # O(1) at the start of training; converted checkpoints are unaffected
        # (init only matters for fresh training).
        conv = lambda name: nn.Conv(  # noqa: E731
            cfg.latent_dim, (3, 3), padding=((1, 1), (1, 1)),
            dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype,
            kernel_init=nn.initializers.variance_scaling(
                1e-4, "fan_in", "truncated_normal"), name=name)
        self.conv_mu = conv("conv_mu")
        self.conv_logvar = conv("conv_logvar")
        if cfg.norm_latents:
            from ..ops.norms import GroupNorm, gn_groups

            final_dim = cfg.base_dims[-1]
            self.latent_norm = GroupNorm(
                gn_groups(final_dim), final_dim, dtype=cfg.compute_dtype,
                param_dtype=cfg.params_dtype, name="latent_norm")

    def encode(self, x: jax.Array, deterministic: bool = True):
        """x: [B, H, W, C] -> (mu, logvar), each [B, H/f, W/f, D]."""
        h = self.encoder(x, deterministic)
        if self.config.norm_latents:
            h = self.latent_norm(h)
        return self.conv_mu(h), self.conv_logvar(h)

    def decode(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        """z: [B, h, w, D] -> logits [B, h*f, w*f, C] (apply sigmoid for [0,1])."""
        return self.decoder(z, deterministic)

    def reparameterize(self, mu: jax.Array, logvar: jax.Array) -> jax.Array:
        """z = mu + eps * exp(0.5*logvar), computed in fp32 with clamped logvar
        (patched ref: transvae.py:186-196). Uses the 'sample' RNG stream."""
        lo, hi = self.config.logvar_clip
        mu32 = mu.astype(jnp.float32)
        logvar32 = jnp.clip(logvar.astype(jnp.float32), lo, hi)
        std = jnp.exp(0.5 * logvar32)
        eps = jax.random.normal(self.make_rng("sample"), std.shape, jnp.float32)
        z = mu32 + eps * std
        return z.astype(mu.dtype)

    def __call__(self, x: jax.Array, deterministic: bool = True,
                 sample: bool = True):
        """Full VAE forward. Returns (reconstruction_logits, mu, logvar).

        With sample=False, decodes the mean (no RNG needed) — the reference's
        inference_example.py path.
        """
        cfg = self.config
        mu, logvar = self.encode(x, deterministic)
        mu = jnp.clip(mu, -cfg.mu_clip, cfg.mu_clip)
        logvar = jnp.clip(logvar, *cfg.logvar_clip)
        z = self.reparameterize(mu, logvar) if sample else mu
        recon = self.decode(z, deterministic)
        return recon, mu, logvar


def create_transvae(variant: str = "large", compression_ratio: int = 16,
                    latent_dim: int | None = None, **kw) -> TransVAE:
    """Factory mirroring the reference ``create_transvae``
    (ref: transvae/models/transvae.py:303-326)."""
    return TransVAE(get_config(variant, compression_ratio, latent_dim, **kw))


def init_params(model: TransVAE, rng: jax.Array, image_size: int = 256,
                batch: int = 1) -> Any:
    """Initialize a parameter pytree for ``model`` at the given resolution."""
    x = jnp.zeros((batch, image_size, image_size, model.config.input_channels),
                  model.config.compute_dtype)
    return model.init({"params": rng, "sample": rng}, x)["params"]


def count_params(params: Any) -> dict:
    """Parameter counts (ref: transvae.py:290-300)."""
    def _count(tree):
        return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(tree))
    out = {"total": _count(params)}
    for key in ("encoder", "decoder"):
        if key in params:
            out[key] = _count(params[key])
    return out


def get_num_params(params: Any) -> int:
    """Total parameter count — name-for-name counterpart of the reference's
    ``TransVAE.get_num_params`` (ref: transvae.py:290-300). See
    :func:`count_params` for the per-submodule breakdown."""
    return count_params(params)["total"]


def enable_gradient_checkpointing(model: TransVAE,
                                  policy: str | None = None) -> TransVAE:
    """Return a copy of ``model`` with per-block rematerialization enabled —
    the counterpart of the reference's in-place
    ``TransVAE.enable_gradient_checkpointing`` (ref: transvae.py:269-277;
    torch.utils.checkpoint per block, encoder.py:114-124).

    JAX modules are immutable, so this returns a new module; params are
    unchanged (remat only alters what the backward pass saves). ``policy``
    overrides the remat policy ('dots' saves matmul/conv outputs — the fast
    default; 'none' saves nothing for max memory savings).
    """
    kw = {"remat": True}
    if policy is not None:
        kw["remat_policy"] = policy
    return TransVAE(model.config.replace(**kw))


def get_last_layer(params: Any) -> jax.Array:
    """The decoder's final conv kernel — used for adaptive GAN weighting
    (ref: transvae.py:260-262 ``get_last_layer``; the reference defines it but
    never calls it). Accepts either the model param tree or {'model': ...}."""
    p = params["model"] if "model" in params and "decoder" not in params else params
    return p["decoder"]["conv_out"]["kernel"]


def adaptive_gan_weight(rec_grad: jax.Array, gan_grad: jax.Array,
                        max_weight: float = 1e4) -> jax.Array:
    """VQGAN-style adaptive weight: ||∇_last rec|| / ||∇_last gan|| — balances
    the adversarial term against the reconstruction losses. This is what
    ``get_last_layer`` exists for; the reference never finished the wiring
    (SURVEY.md §2.3 note)."""
    norm_rec = jnp.linalg.norm(rec_grad)
    norm_gan = jnp.linalg.norm(gan_grad)
    weight = norm_rec / (norm_gan + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(weight, 0.0, max_weight))


def from_pretrained(model_name: str, checkpoint_dir: str | None = None, **kw):
    """Build a model (and load weights when a checkpoint is given).

    Parses ``transvae-{variant}-f{f}d{d}`` names like the reference
    (ref: transvae.py:264-283). Returns (model, params).

    Weight resolution (the reference's actual download is TODO — here the
    name is resolved against a local registry instead, which works in
    zero-egress deployments): an explicit ``checkpoint_dir`` wins; otherwise,
    when ``DEEPL_PRETRAINED_DIR`` is set and ``$DEEPL_PRETRAINED_DIR/<name>``
    exists, weights load from there (orbax layout, as written by the
    Trainer); else params is None (random init).
    """
    parts = model_name.split("-")
    if len(parts) < 3:
        raise ValueError(f"Bad model name {model_name!r}; want transvae-<variant>-f<f>d<d>")
    variant, fd = parts[1], parts[2]
    f = int(fd[1:].split("d")[0])
    d = int(fd.split("d")[1])
    model = create_transvae(variant=variant, compression_ratio=f, latent_dim=d, **kw)
    if checkpoint_dir is None:
        registry = os.environ.get("DEEPL_PRETRAINED_DIR")
        if registry:
            candidate = os.path.join(registry, model_name)
            if os.path.isdir(candidate):
                checkpoint_dir = candidate
    params = None
    if checkpoint_dir is not None:
        from ..training.checkpoint import restore_params
        params = restore_params(checkpoint_dir)
    return model, params
