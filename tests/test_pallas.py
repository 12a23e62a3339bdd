"""Pallas flash-attention correctness vs. the XLA reference (interpret mode on
CPU; the same kernel compiles for real on TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepl_project_tpu.ops.attention import xla_attention
from deepl_project_tpu.ops.pallas import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # On the CPU test platform, run the kernel through the Pallas interpreter.
    orig = fa.pl.pallas_call
    monkeypatch.setattr(fa.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


@pytest.mark.parametrize("n,block", [(256, 128), (512, 256)])
def test_flash_matches_xla(rng, n, block):
    b, h, d = 1, 2, 64
    ks = jax.random.split(rng, 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d), jnp.float32) for kk in ks)
    scale = d ** -0.5
    out = fa.flash_attention(q, k, v, scale, block_q=block, block_k=block)
    ref = xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_bf16(rng):
    b, n, h, d = 1, 256, 1, 64
    ks = jax.random.split(rng, 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d), jnp.bfloat16) for kk in ks)
    scale = d ** -0.5
    out = fa.flash_attention(q, k, v, scale, block_q=128, block_k=128)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), scale)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_flash_gradients_match(rng):
    b, n, h, d = 1, 256, 1, 32
    ks = jax.random.split(rng, 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d), jnp.float32) for kk in ks)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, scale, 128, 128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_group_norm_silu_matches_reference(rng):
    import deepl_project_tpu.ops.pallas.fused_norm as fnorm
    from deepl_project_tpu.ops.norms import GroupNorm

    orig = fnorm.pl.pallas_call
    fnorm.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        x = jax.random.normal(rng, (2, 32, 16, 64), jnp.float32) * 2 + 1
        ks = jax.random.split(rng, 2)
        scale = jax.random.normal(ks[0], (64,)) * 0.1 + 1
        bias = jax.random.normal(ks[1], (64,)) * 0.1
        out = fnorm.group_norm_silu(x, scale, bias, groups=8, silu=True,
                                    block_rows=128)
        gn = GroupNorm(8, 64, dtype=jnp.float32)
        ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
        ref = ref * jax.nn.sigmoid(ref)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
    finally:
        fnorm.pl.pallas_call = orig


def test_small_attention_matches_xla_interpret(rng):
    # Interpreter mode runs the real kernel logic on CPU.
    from deepl_project_tpu.ops.attention import xla_attention
    from deepl_project_tpu.ops.pallas.small_attention import small_attention

    b, n, h, d = 2, 64, 3, 16
    q, k, v = (jax.random.normal(key, (b, n, h, d))
               for key in jax.random.split(rng, 3))
    scale = d ** -0.5
    ref = xla_attention(q, k, v, scale)
    out = small_attention(q, k, v, scale, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_small_attention_backward_matches_xla(rng):
    from deepl_project_tpu.ops.attention import xla_attention
    from deepl_project_tpu.ops.pallas.small_attention import small_attention

    b, n, h, d = 1, 32, 2, 16
    q, k, v = (jax.random.normal(key, (b, n, h, d))
               for key in jax.random.split(rng, 3))
    scale = d ** -0.5
    g1 = jax.grad(lambda q, k, v: jnp.sum(
        small_attention(q, k, v, scale, True) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        xla_attention(q, k, v, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-3, atol=1e-4)
