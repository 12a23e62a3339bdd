"""Loss-layer tests: patched-semantics contracts (SURVEY.md §2.3, §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepl_project_tpu.losses import (LossWeights, discriminator_loss,
                                      gan_generator_loss, init_lpips_params,
                                      kl_divergence, l1_loss, lpips,
                                      transvae_loss, vf_loss)
from deepl_project_tpu.models.discriminator import PatchDiscriminator


def test_kl_standard_normal_is_zero():
    mu = jnp.zeros((2, 4, 4, 8))
    logvar = jnp.zeros((2, 4, 4, 8))
    np.testing.assert_allclose(kl_divergence(mu, logvar), 0.0, atol=1e-7)


def test_kl_clamps_logvar():
    mu = jnp.zeros((1, 2, 2, 4))
    logvar = jnp.full((1, 2, 2, 4), 1e4)  # would overflow exp without clamp
    kl = kl_divergence(mu, logvar)
    assert bool(jnp.isfinite(kl))


def test_l1_zero_on_identical():
    x = jnp.ones((1, 4, 4, 3)) * 0.5
    np.testing.assert_allclose(l1_loss(x, x), 0.0)


def test_lpips_zero_on_identical(rng):
    params = init_lpips_params(rng)
    x = jax.random.uniform(rng, (1, 64, 64, 3)) * 2 - 1
    d = lpips(params, x, x)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_lpips_positive_on_different(rng):
    params = init_lpips_params(rng)
    k1, k2 = jax.random.split(rng)
    x = jax.random.uniform(k1, (2, 64, 64, 3)) * 2 - 1
    y = jax.random.uniform(k2, (2, 64, 64, 3)) * 2 - 1
    d = lpips(params, x, y)
    assert d.shape == (2,)
    assert bool(jnp.all(d > 0))


def test_vf_loss_margin(rng):
    # Identical (already-aligned) features → similarity 1 → loss 0.
    feats = jax.random.normal(rng, (2, 16, 16, 32))
    proj_k = jnp.eye(32)
    proj_b = jnp.zeros((32,))
    loss = vf_loss(feats, feats, proj_k, proj_b, margin=0.4)
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    # Orthogonal features → similarity ~0 → loss ~margin.
    other = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 32))
    loss2 = vf_loss(feats, other, proj_k, proj_b, margin=0.4)
    assert 0.2 < float(loss2) <= 0.6


def test_vf_loss_projection_and_resize(rng):
    # latent dim != dino dim and different grid → projection + bilinear resize.
    latent = jax.random.normal(rng, (1, 4, 4, 8))
    dino = jax.random.normal(rng, (1, 16, 16, 24))
    proj_k = jax.random.normal(rng, (8, 24)) * 0.1
    proj_b = jnp.zeros((24,))
    loss = vf_loss(latent, dino, proj_k, proj_b)
    assert loss.shape == ()
    assert bool(jnp.isfinite(loss))


def test_gan_generator_loss_direction():
    # Confident-real fake logits → small loss; confident-fake → large.
    assert float(gan_generator_loss(jnp.full((2, 4, 4, 1), 10.0))) < 0.01
    assert float(gan_generator_loss(jnp.full((2, 4, 4, 1), -10.0))) > 5.0


@pytest.mark.parametrize("kind", ["bce", "hinge", "wgan"])
def test_discriminator_loss_kinds(kind):
    real = jnp.full((2, 4, 4, 1), 5.0)
    fake = jnp.full((2, 4, 4, 1), -5.0)
    # Perfect discriminator → low loss for all variants.
    loss = discriminator_loss(real, fake, kind)
    assert float(loss) < 0.1 if kind != "wgan" else float(loss) < 0


def test_transvae_loss_zero_weight_terms(rng):
    recon = jax.random.normal(rng, (1, 32, 32, 3))
    target = jax.random.uniform(rng, (1, 32, 32, 3))
    mu = jax.random.normal(rng, (1, 2, 2, 8))
    logvar = jnp.zeros((1, 2, 2, 8))
    w = LossWeights(l1=1.0, lpips=0.0, kl=0.0, vf=0.0, gan=0.0)
    losses = transvae_loss(recon, target, mu, logvar, w)
    assert float(losses["lpips"]) == 0.0
    assert float(losses["kl"]) == 0.0
    assert float(losses["vf"]) == 0.0
    assert float(losses["gan"]) == 0.0
    np.testing.assert_allclose(losses["total"], losses["l1"], rtol=1e-6)


def test_transvae_loss_sigmoid_contract(rng):
    # Large positive logits → sigmoid ~1; with target 1 the L1 must be ~0
    # (the sigmoid lives inside the loss, patched semantics §2.9.2).
    recon_logits = jnp.full((1, 8, 8, 3), 20.0)
    target = jnp.ones((1, 8, 8, 3))
    mu = jnp.zeros((1, 1, 1, 4))
    logvar = jnp.zeros((1, 1, 1, 4))
    losses = transvae_loss(recon_logits, target, mu, logvar,
                           LossWeights(lpips=0.0, kl=0.0, vf=0.0, gan=0.0))
    np.testing.assert_allclose(losses["total"], 0.0, atol=1e-6)


def test_transvae_loss_full_stack(rng):
    # All terms live at once (random lpips net, stub dino teacher, real D).
    k = jax.random.split(rng, 6)
    recon = jax.random.normal(k[0], (1, 64, 64, 3))
    target = jax.random.uniform(k[1], (1, 64, 64, 3))
    mu = jax.random.normal(k[2], (1, 4, 4, 8))
    logvar = jax.random.normal(k[3], (1, 4, 4, 8))
    lp = init_lpips_params(k[4])
    dino = jax.random.normal(k[5], (1, 16, 16, 24))
    proj = (jax.random.normal(k[5], (8, 24)) * 0.1, jnp.zeros((24,)))

    disc = PatchDiscriminator(base_channels=16, dtype=jnp.float32)
    dvars = disc.init(k[0], jnp.zeros((1, 64, 64, 3)))
    losses = transvae_loss(
        recon, target, mu, logvar, LossWeights(),
        lpips_params=lp, vf_proj=proj, dino_features=dino,
        disc_apply=lambda img: disc.apply(dvars, img))
    for name in ("l1", "lpips", "kl", "vf", "gan", "total"):
        assert bool(jnp.isfinite(losses[name])), name
    assert float(losses["total"]) > 0


def test_patch_discriminator_shapes(rng):
    disc = PatchDiscriminator(base_channels=16, dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 64, 64, 3))
    v = disc.init(rng, x)
    out = disc.apply(v, x)
    # 3 stride-2 layers → /8, then two stride-1 4x4 convs each trim 1
    # (pix2pix semantics: 256 input → 30x30 patch map).
    assert out.shape == (2, 6, 6, 1)
    assert out.dtype == jnp.float32


def test_self_perceptual_distance(rng):
    """r5 (VERDICT 9): the LPIPS-slot self-perceptual distance — the frozen
    trained encoder as the feature net. Zero on identical images, positive on
    different ones, and differentiable w.r.t. the recon input."""
    import jax.numpy as jnp

    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.losses import make_self_perceptual, transvae_loss
    from deepl_project_tpu.losses.vae_loss import LossWeights

    cfg = get_config("tiny_f16d32", dtype="float32", attention_impl="xla")
    cfg = cfg.replace(depths=(1, 1, 1), base_dims=(16, 16, 32), latent_dim=4,
                      head_dim=16)
    model = TransVAE(cfg)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    frozen = model.init({"params": rng, "sample": rng}, x)["params"]
    fn = make_self_perceptual(model, frozen)

    d_same = fn(x, x)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.3, 0, 1)
    d_diff = fn(y, x)
    assert float(d_diff.min()) > 0

    # Plugged into the loss: fills the lpips slot and carries gradient.
    def loss_of(recon_logits):
        out = transvae_loss(recon_logits, x, jnp.zeros((2, 1, 1, 4)),
                            jnp.zeros((2, 1, 1, 4)),
                            LossWeights(l1=0.0, lpips=1.0, kl=0.0, vf=0.0,
                                        gan=0.0),
                            perceptual_fn=fn)
        return out["total"], out

    (total, out), g = jax.value_and_grad(loss_of, has_aux=True)(
        jnp.zeros((2, 16, 16, 3)))
    assert float(out["lpips"]) > 0
    assert float(total) == float(out["lpips"])
    assert float(jnp.max(jnp.abs(g))) > 0
