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


def test_fused_attention_sublayer_matches_module(rng):
    # The fused sublayer kernel (LN trio + QKV + RoPE + attention + proj)
    # must reproduce the standard AttentionRoPE module path from the SAME
    # parameter tree (interpret mode runs the real kernel logic on CPU).
    from deepl_project_tpu.ops.attention import AttentionRoPE
    from deepl_project_tpu.ops.pallas.fused_attention_block import (
        fused_attention_sublayer)

    b, h, w, c, hd = 2, 16, 16, 128, 32
    x = jax.random.normal(rng, (b, h, w, c), jnp.float32)
    mod = AttentionRoPE(c, head_dim=hd, dtype=jnp.float32)
    params = mod.init({"params": rng}, x)["params"]
    ref = mod.apply({"params": params}, x)

    ln = tuple((params[f"norm_{t}"]["scale"], params[f"norm_{t}"]["bias"])
               for t in "qkv")
    out = fused_attention_sublayer(
        x.reshape(b, h * w, c), ln,
        params["to_q"]["kernel"], params["to_k"]["kernel"],
        params["to_v"]["kernel"], params["proj"]["kernel"],
        params["proj"]["bias"], h, w, pairing="reference", head_dim=hd,
        use_rope=True, interpret=True).reshape(b, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_attention_sublayer_standard_pairing_and_groups(rng):
    # 8 heads force multiple head groups through the grid accumulation path;
    # 'standard' pairing exercises the alternate rope tables.
    from deepl_project_tpu.ops.attention import AttentionRoPE
    from deepl_project_tpu.ops.pallas import fused_attention_block as fab

    b, h, w, c, hd = 1, 16, 16, 128, 16
    x = jax.random.normal(rng, (b, h, w, c), jnp.float32)
    mod = AttentionRoPE(c, head_dim=hd, rope_pairing="standard",
                        dtype=jnp.float32)
    params = mod.init({"params": rng}, x)["params"]
    ref = mod.apply({"params": params}, x)
    ln = tuple((params[f"norm_{t}"]["scale"], params[f"norm_{t}"]["bias"])
               for t in "qkv")
    out = fab.fused_attention_sublayer(
        x.reshape(b, h * w, c), ln,
        params["to_q"]["kernel"], params["to_k"]["kernel"],
        params["to_v"]["kernel"], params["proj"]["kernel"],
        params["proj"]["bias"], h, w, pairing="standard", head_dim=hd,
        use_rope=True, interpret=True).reshape(b, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_attention_sublayer_backward(rng):
    # custom_vjp backward (differentiates the XLA composition).
    from deepl_project_tpu.ops.pallas import fused_attention_block as fab

    b, h, w, c, hd = 1, 16, 16, 64, 16
    n = h * w
    keys = jax.random.split(rng, 6)
    x = jax.random.normal(keys[0], (b, n, c), jnp.float32)
    wq, wk, wv, wp = (jax.random.normal(k2, (c, c)) * 0.05
                      for k2 in keys[1:5])
    bp = jnp.zeros((c,))
    ln = tuple((jnp.ones((c,)), jnp.zeros((c,))) for _ in range(3))

    def loss_fused(x, wq):
        out = fab.fused_attention_sublayer(
            x, ln, wq, wk, wv, wp, bp, h, w, head_dim=hd, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(x, wq):
        out = fab._reference(x, ln, wq, wk, wv, wp, bp, h, w, "reference",
                             hd, hd ** -0.5, True)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, wq)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, wq)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-3, atol=1e-4)


def test_fused_qkv_rope_matches_module(rng):
    # q/k return permuted per head (attention-invariant); validate by
    # running the attention core + proj on the kernel outputs and comparing
    # with the full AttentionRoPE module from the same params.
    from deepl_project_tpu.ops.attention import AttentionRoPE, xla_attention
    from deepl_project_tpu.ops.pallas.fused_attention_block import (
        fused_qkv_rope, qkv_rope_reference)

    b, h, w, c, hd = 2, 16, 16, 128, 32
    n, nh = h * w, c // hd
    x = jax.random.normal(rng, (b, h, w, c), jnp.float32)
    mod = AttentionRoPE(c, head_dim=hd, dtype=jnp.float32)
    params = mod.init({"params": rng}, x)["params"]
    ref = mod.apply({"params": params}, x)

    ln = tuple((params[f"norm_{t}"]["scale"], params[f"norm_{t}"]["bias"])
               for t in "qkv")
    args = (x.reshape(b, n, c), ln, params["to_q"]["kernel"],
            params["to_k"]["kernel"], params["to_v"]["kernel"], h, w)
    q, k, v = fused_qkv_rope(*args, head_dim=hd, interpret=True)
    qr, kr, vr = qkv_rope_reference(*args, head_dim=hd)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k), np.asarray(kr),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vr),
                               rtol=2e-4, atol=2e-5)

    def heads(t):
        return t.reshape(b, n, nh, hd)

    att = xla_attention(heads(q), heads(k), heads(v), hd ** -0.5)
    out = (att.reshape(b, n, c) @ params["proj"]["kernel"]
           + params["proj"]["bias"]).reshape(b, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
