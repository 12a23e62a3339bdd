"""Model-layer tests mirroring the reference's test_installation.py six checks
(SURVEY.md §4.1): construction across variants, forward shape contracts,
encode/decode round trip, resolution flexibility, gradient-checkpointing
backward, and f8/f16 compression-ratio contracts.

All at tiny spatial sizes so CPU compiles stay fast; variants beyond tiny are
constructed with shrunken dims via config overrides where full-size init would
be slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepl_project_tpu import (TransVAE, VARIANTS, count_params, create_transvae,
                               get_config, init_params)

TEST_CFG = dict(dtype="float32", attention_impl="xla")


def tiny_model(**kw):
    cfg = get_config("tiny_f16d32", **{**TEST_CFG, **kw})
    # Shrink dims for fast CPU tests while keeping the 5-stage architecture.
    cfg = cfg.replace(depths=(1, 1, 1, 1, 1), base_dims=(32, 32, 64, 64, 128),
                      latent_dim=8)
    return TransVAE(cfg)


def test_variant_registry_complete():
    # All six published variants must exist (ref: transvae.py:110-147).
    for key in ["tiny_f16d32", "base_f16d32", "large_f16d32", "huge_f16d32",
                "giant_f16d32", "large_f8d16"]:
        assert key in VARIANTS
        cfg = get_config(key)
        assert cfg.compression_ratio == (16 if "f16" in key else 8)
        assert cfg.latent_dim == (32 if "d32" in key else 16)


def test_factory_api():
    # create_transvae(variant, compression_ratio, latent_dim) parity
    # (ref: transvae.py:303-326) — config defaults from the registry, fixing
    # reference defect §2.9.1.
    m = create_transvae(variant="large", compression_ratio=16, latent_dim=32)
    assert m.config.depths == (3, 3, 3, 4, 6)
    m8 = create_transvae(variant="large", compression_ratio=8)
    assert m8.config.latent_dim == 16
    with pytest.raises(ValueError):
        create_transvae(variant="nonexistent")


def test_forward_shapes(rng):
    model = tiny_model()
    x = jax.random.normal(rng, (2, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    recon, mu, logvar = model.apply(variables, x, rngs={"sample": rng})
    assert recon.shape == (2, 32, 32, 3)
    assert mu.shape == (2, 2, 2, 8)
    assert logvar.shape == (2, 2, 2, 8)
    assert bool(jnp.all(jnp.isfinite(recon)))


def test_encode_decode_roundtrip(rng):
    model = tiny_model()
    x = jax.random.normal(rng, (1, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    mu, logvar = model.apply(variables, x, method="encode")
    assert mu.shape == (1, 2, 2, 8)
    recon = model.apply(variables, mu, method="decode")
    assert recon.shape == (1, 32, 32, 3)


def test_deterministic_mean_decode(rng):
    # sample=False decodes the mean — no sample RNG required, fully deterministic.
    model = tiny_model()
    x = jax.random.normal(rng, (1, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    r1, *_ = model.apply(variables, x, sample=False)
    r2, *_ = model.apply(variables, x, sample=False)
    np.testing.assert_array_equal(r1, r2)


@pytest.mark.parametrize("res", [32, 64])
def test_resolution_flexibility(rng, res):
    # Same params at multiple resolutions (RoPE extrapolation;
    # ref: test_installation.py:90-113).
    model = tiny_model()
    x32 = jax.random.normal(rng, (1, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x32)
    x = jax.random.normal(rng, (1, res, res, 3))
    recon, mu, _ = model.apply(variables, x, rngs={"sample": rng})
    assert recon.shape == (1, res, res, 3)
    assert mu.shape == (1, res // 16, res // 16, 8)


def test_compression_ratios():
    # f16 = 5 stages, f8 = 4 stages (ref: test_installation.py:144-175).
    assert get_config("tiny_f16d32").compression_ratio == 16
    assert get_config("large_f8d16").compression_ratio == 8


def test_gradient_checkpointing_backward(rng):
    # remat model must produce identical outputs and finite grads
    # (ref: test_installation.py:116-141).
    model = tiny_model()
    model_remat = tiny_model(remat=True)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x)

    def loss_fn(params, mdl):
        recon, mu, logvar = mdl.apply({"params": params}, x,
                                      rngs={"sample": jax.random.PRNGKey(1)})
        return jnp.mean(jnp.square(recon)) + jnp.mean(mu ** 2)

    l1, g1 = jax.value_and_grad(loss_fn)(variables["params"], model)
    l2, g2 = jax.value_and_grad(loss_fn)(variables["params"], model_remat)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        assert bool(jnp.all(jnp.isfinite(a)))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_param_count_tiny_matches_reference_code():
    # The reference *code* for tiny_f16d32 has exactly 81,887,427 params
    # (measured by instantiating ref transvae/models/transvae.py:13 in torch;
    # the paper's Table-3 "44M" disagrees with the reference's own code — we
    # match the code, which is what checkpoints are shaped by).
    model = create_transvae("tiny", 16, 32, dtype="float32", attention_impl="xla")
    params = init_params(model, jax.random.PRNGKey(0), image_size=32)
    counts = count_params(params)
    assert counts["total"] == 81_887_427, counts
    assert counts["encoder"] == 40_721_408, counts
    assert counts["decoder"] == 40_871_043, counts


def test_get_num_params_and_enable_gradient_checkpointing(rng):
    # Name-for-name counterparts of the reference API (ref: transvae.py:269-300).
    from deepl_project_tpu.models import (enable_gradient_checkpointing,
                                          get_num_params)

    model = tiny_model()
    x = jax.random.normal(rng, (1, 32, 32, 3))
    params = model.init({"params": rng, "sample": rng}, x)["params"]
    assert get_num_params(params) == count_params(params)["total"] > 0

    remat_model = enable_gradient_checkpointing(model, policy="none")
    assert remat_model.config.remat and remat_model.config.remat_policy == "none"
    # Same params apply cleanly; forward identical (remat changes backward only).
    r1, _, _ = model.apply({"params": params}, x, sample=False)
    r2, _, _ = remat_model.apply({"params": params}, x, sample=False)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5)


def test_logvar_clamp_contract(rng):
    # mu/logvar clamping must hold on the forward path (patched semantics).
    model = tiny_model()
    x = 1e3 * jax.random.normal(rng, (1, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    _, mu, logvar = model.apply(variables, x, rngs={"sample": rng})
    assert float(jnp.max(jnp.abs(mu))) <= 50.0
    assert float(jnp.max(logvar)) <= 20.0
    assert float(jnp.min(logvar)) >= -30.0


def test_get_last_layer_and_adaptive_gan_weight(rng):
    import jax.numpy as jnp

    from deepl_project_tpu.models import adaptive_gan_weight, get_last_layer

    model = tiny_model()
    x = jax.random.normal(rng, (1, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    last = get_last_layer(variables["params"])
    assert last.shape[-1] == 3  # conv_out kernel HWIO → 3 output channels
    # Also works with the train-state {'model': ...} wrapper.
    last2 = get_last_layer({"model": variables["params"]})
    np.testing.assert_array_equal(last, last2)

    w = adaptive_gan_weight(jnp.ones((3, 3)) * 2.0, jnp.ones((3, 3)))
    assert float(w) == pytest.approx(2.0, rel=1e-3)


def test_scan_blocks_equivalence(rng):
    # scan_blocks=True (lax.scan over stacked per-stage params) must produce
    # the same outputs as the unrolled model given converted params.
    from deepl_project_tpu.ops.stack import (from_scanned_params,
                                             to_scanned_params)

    cfg = get_config("tiny_f16d32", **TEST_CFG).replace(
        depths=(2, 2, 2), base_dims=(16, 16, 32), latent_dim=4, head_dim=16)
    m_loop = TransVAE(cfg)
    m_scan = TransVAE(cfg.replace(scan_blocks=True))
    x = jax.random.uniform(rng, (1, 16, 16, 3))
    v = m_loop.init({"params": rng, "sample": rng}, x)
    scan_params = to_scanned_params(v["params"], cfg)
    # Structure matches a natively-initialized scan model.
    v2 = m_scan.init({"params": rng, "sample": rng}, x)
    assert (jax.tree_util.tree_structure(v2["params"])
            == jax.tree_util.tree_structure(scan_params))
    a, mu_a, _ = m_loop.apply(v, x, sample=False)
    b, mu_b, _ = m_scan.apply({"params": scan_params}, x, sample=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
    # Round trip back to unrolled layout.
    back = from_scanned_params(scan_params, cfg)
    for p1, p2 in zip(jax.tree_util.tree_leaves(v["params"]),
                      jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_transvae_shim_import():
    # Reference import surface works (ref: transvae/__init__.py:5-9).
    # test_parity puts the reference tree on sys.path (its own 'transvae'
    # package) — evict any cached module and prefer the repo shim.
    import sys
    sys.modules.pop("transvae", None)
    for mod in [m for m in sys.modules if m.startswith("transvae.")]:
        sys.modules.pop(mod)
    sys.path.insert(0, "/root/repo")
    from transvae import TransVAE as ShimVAE, TransVAELoss, create_transvae as shim_create

    m = shim_create(variant="tiny", compression_ratio=16, latent_dim=32)
    assert m.config.latent_dim == 32
    loss = TransVAELoss(lpips_weight=0.0, vf_weight=0.0)
    out = loss(jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16, 3)),
               jnp.zeros((1, 1, 1, 4)), jnp.zeros((1, 1, 1, 4)))
    assert "total" in out


def test_from_pretrained_name_parsing_and_registry(tmp_path, monkeypatch):
    # Name parsing mirrors the reference (ref: transvae.py:248-267); weight
    # resolution goes through the local DEEPL_PRETRAINED_DIR registry (the
    # reference's download is TODO — here the offline registry is functional).
    from deepl_project_tpu import from_pretrained
    from deepl_project_tpu.training.checkpoint import save_checkpoint

    with pytest.raises(ValueError):
        from_pretrained("tiny")

    model, params = from_pretrained("transvae-tiny-f16d32", **TEST_CFG)
    assert model.config.compression_ratio == 16
    assert model.config.latent_dim == 32
    assert params is None  # no registry set -> random init

    name = "transvae-large-f8d16"
    ckpt_dir = tmp_path / name
    payload = {"params": {"w": np.arange(4.0, dtype=np.float32)}}
    save_checkpoint(str(ckpt_dir), step=7, state=payload)
    monkeypatch.setenv("DEEPL_PRETRAINED_DIR", str(tmp_path))
    model, params = from_pretrained(name, **TEST_CFG)
    assert model.config.compression_ratio == 8
    assert model.config.latent_dim == 16
    np.testing.assert_array_equal(np.asarray(params["w"]), np.arange(4.0))

    # An explicit checkpoint_dir wins over the registry.
    other = tmp_path / "other"
    save_checkpoint(str(other), step=1,
                    state={"params": {"w": np.zeros(2, np.float32)}})
    _, params = from_pretrained(name, checkpoint_dir=str(other), **TEST_CFG)
    assert params["w"].shape == (2,)
