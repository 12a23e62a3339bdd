"""Installation smoke test — the reference's test_installation.py as a CLI
(ref: test_installation.py:10-214): six self-contained checks on random
weights, exit code 0/1. The pytest suite under tests/ supersedes this for CI;
this is the quick "is my install sane" command.
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp


def _small_cfg(**kw):
    from ..config import get_config

    return get_config("tiny_f16d32", **kw).replace(
        depths=(1, 1, 1, 1, 1), base_dims=(32, 32, 64, 64, 128), latent_dim=8)


def check_model_creation():
    from ..config import VARIANTS, get_config

    for key in VARIANTS:
        cfg = get_config(key)
        assert cfg.num_stages == len(cfg.depths)
    return True


def check_forward_shapes():
    from ..models.transvae import TransVAE

    model = TransVAE(_small_cfg())
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    recon, mu, logvar = model.apply(variables, x, rngs={"sample": rng})
    assert recon.shape == x.shape
    assert mu.shape == (1, 4, 4, 8)
    return True


def check_encode_decode():
    from ..models.transvae import TransVAE

    model = TransVAE(_small_cfg())
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": rng, "sample": rng}, x)
    mu, logvar = model.apply(variables, x, method="encode")
    recon = model.apply(variables, mu, method="decode")
    assert recon.shape == x.shape
    return True


def check_resolution_flexibility():
    from ..models.transvae import TransVAE

    model = TransVAE(_small_cfg())
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "sample": rng},
                           jnp.zeros((1, 32, 32, 3)))
    for res in (32, 64, 128):
        recon, *_ = model.apply(variables, jnp.zeros((1, res, res, 3)),
                                rngs={"sample": rng})
        assert recon.shape == (1, res, res, 3), res
    return True


def check_gradient_checkpointing():
    from ..models.transvae import TransVAE

    model = TransVAE(_small_cfg(remat=True))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": rng, "sample": rng}, x)

    def loss(params):
        recon, *_ = model.apply({"params": params}, x, rngs={"sample": rng})
        return jnp.mean(recon ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree_util.tree_leaves(grads))
    return True


def check_compression_ratios():
    from ..config import get_config

    assert get_config("tiny_f16d32").compression_ratio == 16
    assert get_config("large_f8d16").compression_ratio == 8
    return True


CHECKS = [
    ("Model creation (all variants)", check_model_creation),
    ("Forward pass shapes", check_forward_shapes),
    ("Encode/decode round trip", check_encode_decode),
    ("Resolution flexibility (RoPE)", check_resolution_flexibility),
    ("Gradient checkpointing backward", check_gradient_checkpointing),
    ("Compression ratio contracts", check_compression_ratios),
]


def main() -> int:
    print(f"deepl_project_tpu smoke test — backend: {jax.default_backend()}")
    failures = 0
    for name, fn in CHECKS:
        try:
            fn()
            print(f"  [PASS] {name}")
        except Exception:
            failures += 1
            print(f"  [FAIL] {name}")
            traceback.print_exc()
    print(f"{len(CHECKS) - failures}/{len(CHECKS)} checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
