"""Unit/property tests for the L1 ops (shapes, statistics, round-trips).

Mirrors the reference's per-module __main__ self-tests (SURVEY.md §4.2) as a
real pytest suite. fp32 everywhere for numerical checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepl_project_tpu.ops import (AttentionRoPE, ConvFFN, Downsample, GroupNorm,
                                   LayerNorm, ResBlock, RMSNorm, StandardFFN,
                                   TransVAEBlock, Upsample, apply_rope2d,
                                   depth_to_space, rope2d_tables, space_to_depth,
                                   xla_attention)
from deepl_project_tpu.ops.attention import xla_attention_chunked
from flax import linen as nn

F32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def test_rmsnorm_stats(rng):
    m = RMSNorm(64, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 64)) * 3.0 + 1.0
    y = m.apply(m.init(rng, x), x)
    # After RMS normalization, mean of squares over channels ~ 1.
    ms = jnp.mean(jnp.square(y), axis=-1)
    np.testing.assert_allclose(ms, jnp.ones_like(ms), rtol=1e-4)


def test_layernorm_stats(rng):
    m = LayerNorm(64, **F32)
    x = jax.random.normal(rng, (2, 16, 64)) * 5.0 + 2.0
    y = m.apply(m.init(rng, x), x)
    np.testing.assert_allclose(jnp.mean(y, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.std(y, -1), 1.0, atol=1e-2)


def test_groupnorm_matches_torch_semantics(rng):
    # Per-(batch, group) statistics over spatial+intra-group channels.
    m = GroupNorm(4, 8, **F32)
    x = jax.random.normal(rng, (2, 4, 4, 8)) * 2.0 + 3.0
    y = m.apply(m.init(rng, x), x)
    yg = y.reshape(2, 4, 4, 4, 2)
    mean = jnp.mean(yg, axis=(1, 2, 4))
    np.testing.assert_allclose(mean, 0.0, atol=1e-5)


def test_space_depth_roundtrip(rng):
    x = jax.random.normal(rng, (2, 8, 8, 6))
    np.testing.assert_allclose(depth_to_space(space_to_depth(x, 2), 2), x)


def test_space_to_depth_channel_order():
    # Channel order must be c*4 + i*2 + j (torch pixel_unshuffle).
    x = jnp.arange(2 * 2 * 3, dtype=jnp.float32).reshape(1, 2, 2, 3)
    y = space_to_depth(x, 2)
    assert y.shape == (1, 1, 1, 12)
    # out[c*4 + i*2 + j] == x[i, j, c]
    for c in range(3):
        for i in range(2):
            for j in range(2):
                assert y[0, 0, 0, c * 4 + i * 2 + j] == x[0, i, j, c]


def test_rope_tables_shapes():
    cos_a, sin_a, cos_b, sin_b = rope2d_tables(64, 8, 16)
    for t in (cos_a, sin_a, cos_b, sin_b):
        assert t.shape == (128, 32)
    # Position (0,0) has zero phase: cos=1, sin=0.
    np.testing.assert_allclose(cos_a[0], 1.0)
    np.testing.assert_allclose(sin_a[0], 0.0)


def test_rope_preserves_shape_and_norm_when_pure_rotation(rng):
    # For positions where pair frequencies coincide the map is a rotation;
    # at minimum the transform must be shape/dtype-preserving and invertible-ish.
    x = jax.random.normal(rng, (2, 64, 4, 64))
    y = apply_rope2d(x, 8, 8)
    assert y.shape == x.shape
    assert y.dtype == x.dtype
    # Zero phase at position 0 → identity there.
    np.testing.assert_allclose(y[:, 0], x[:, 0], atol=1e-6)


def test_rope_standard_relative_position_property(rng):
    """With pairing='standard' the attention logits q_i·k_j must depend on (i-j)
    only (per axis). Check along a row: logit(i, j) == logit(i+s, j+s)."""
    hd = 16
    W = 16
    q = jax.random.normal(rng, (1, W, 1, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, W, 1, hd))
    # Single-row grid: H=1 so only x-axis rotation varies.
    qr = apply_rope2d(q, 1, W, "standard")[0, :, 0, :]
    kr = apply_rope2d(k, 1, W, "standard")[0, :, 0, :]
    logits = qr @ kr.T
    # Build shifted inputs: same underlying q/k content placed at shifted positions.
    q2 = jnp.roll(q, 3, axis=1)
    k2 = jnp.roll(k, 3, axis=1)
    qr2 = apply_rope2d(q2, 1, W, "standard")[0, :, 0, :]
    kr2 = apply_rope2d(k2, 1, W, "standard")[0, :, 0, :]
    logits2 = qr2 @ kr2.T
    # Compare interior entries (avoid wrap-around positions).
    np.testing.assert_allclose(logits[4, 6], logits2[7, 9], rtol=1e-4)
    np.testing.assert_allclose(logits[2, 10], logits2[5, 13], rtol=1e-4)


def test_rope_reference_pairing_formula(rng):
    """pairing='reference' must implement exactly: out1 = x1*cos_a - x2*sin_a,
    out2 = x1*sin_b + x2*cos_b with a/b the even/odd entries of the interleaved
    [y,y,x,x] frequency embedding (ref: attention.py:149-198)."""
    hd, H, W = 8, 2, 3
    N = H * W
    x = jax.random.normal(rng, (1, N, 1, hd))
    out = apply_rope2d(x, H, W)

    # Independent numpy transcription of the reference formula.
    dim_axis = hd // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim_axis, 2) / dim_axis))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    emb = np.concatenate([
        np.outer(ys.ravel(), inv_freq), np.outer(ys.ravel(), inv_freq),
        np.outer(xs.ravel(), inv_freq), np.outer(xs.ravel(), inv_freq)], axis=-1)
    xn = np.asarray(x)[0, :, 0, :]
    x1, x2 = xn[:, 0::2], xn[:, 1::2]
    a, b = emb[:, 0::2], emb[:, 1::2]
    o1 = x1 * np.cos(a) - x2 * np.sin(a)
    o2 = x1 * np.sin(b) + x2 * np.cos(b)
    expected = np.stack([o1, o2], axis=-1).reshape(N, hd)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0, :], expected, rtol=1e-5, atol=1e-6)


def test_xla_attention_matches_naive(rng):
    b, n, h, d = 2, 32, 2, 16
    ks = jax.random.split(rng, 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d)) for kk in ks)
    scale = d ** -0.5
    out = xla_attention(q, k, v, scale)
    # Naive reference.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits, -1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_chunked_attention_matches_full(rng):
    b, n, h, d = 1, 64, 2, 16
    ks = jax.random.split(rng, 3)
    q, k, v = (jax.random.normal(kk, (b, n, h, d)) for kk in ks)
    out_full = xla_attention(q, k, v, d ** -0.5)
    out_chunk = xla_attention_chunked(q, k, v, d ** -0.5, chunk=16)
    np.testing.assert_allclose(out_full, out_chunk, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(8, 8), (16, 16), (8, 16)])
def test_attention_module_shapes(rng, hw):
    h, w = hw
    m = AttentionRoPE(128, head_dim=64, impl="xla", **F32)
    x = jax.random.normal(rng, (2, h, w, 128))
    params = m.init(rng, x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_attention_resolution_extrapolation(rng):
    # Same params must work at multiple resolutions (RoPE property;
    # ref: attention.py:202-224 self-test).
    m = AttentionRoPE(128, head_dim=64, impl="xla", **F32)
    x16 = jax.random.normal(rng, (1, 16, 16, 128))
    params = m.init(rng, x16)
    y16 = m.apply(params, x16)
    x32 = jax.random.normal(rng, (1, 32, 32, 128))
    y32 = m.apply(params, x32)
    assert y16.shape == (1, 16, 16, 128)
    assert y32.shape == (1, 32, 32, 128)


@pytest.mark.parametrize("conv_type", ["full", "depthwise"])
def test_convffn_shapes(rng, conv_type):
    m = ConvFFN(64, mlp_ratio=1.0, conv_type=conv_type, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 64))
    y = m.apply(m.init(rng, x), x)
    assert y.shape == x.shape


def test_standardffn_shapes(rng):
    m = StandardFFN(64, mlp_ratio=4.0, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 64))
    y = m.apply(m.init(rng, x), x)
    assert y.shape == x.shape


def test_resblock_channel_change(rng):
    m = ResBlock(64, 128, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 64))
    y = m.apply(m.init(rng, x), x)
    assert y.shape == (2, 8, 8, 128)


def test_transvae_block(rng):
    m = TransVAEBlock(128, head_dim=64, attention_impl="xla", **F32)
    x = jax.random.normal(rng, (2, 8, 8, 128))
    y = m.apply(m.init(rng, x), x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("dc", [True, False])
def test_down_up_shapes(rng, dc):
    down = Downsample(32, 64, use_dc_path=dc, **F32)
    x = jax.random.normal(rng, (2, 16, 16, 32))
    xd = down.apply(down.init(rng, x), x)
    assert xd.shape == (2, 8, 8, 64)
    up = Upsample(64, 32, use_dc_path=dc, **F32)
    xu = up.apply(up.init(rng, xd), xd)
    assert xu.shape == (2, 16, 16, 32)


def test_auto_train_dispatch_matches_xla(rng):
    # 'auto_train' (training memory dispatch: Pallas from N=4096 on TPU,
    # chunked-XLA fallback elsewhere) must be numerically equivalent to the
    # full-softmax path at any N.
    from deepl_project_tpu.ops.attention import core_attention

    b, n, h, d = 2, 4096, 2, 16
    q, k, v = (jax.random.normal(key, (b, n, h, d))
               for key in jax.random.split(rng, 3))
    scale = d ** -0.5
    ref = xla_attention(q, k, v, scale)
    out = core_attention(q, k, v, scale, impl="auto_train")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_attention_impl_auto_train_in_model(rng):
    m = AttentionRoPE(128, head_dim=64, impl="auto_train", **F32)
    x = jax.random.normal(rng, (1, 8, 8, 128))
    ref = AttentionRoPE(128, head_dim=64, impl="xla", **F32)
    p = m.init(rng, x)
    np.testing.assert_allclose(np.asarray(m.apply(p, x)),
                               np.asarray(ref.apply(p, x)), rtol=1e-5)


def test_fused_upsample_matches_reference_op_order(rng):
    # The phase-decomposed main path (4x 2x2 convs + pixel-shuffle) must equal
    # nearest-x2 + conv3x3 exactly (same params; weight-tap sums reassociate
    # fp, hence the small tolerance).
    fused = Upsample(24, 16, fuse_main=True, **F32)
    plain = Upsample(24, 16, fuse_main=False, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 24))
    p = plain.init(rng, x)
    y_plain = plain.apply(p, x)
    y_fused = fused.apply(p, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-5)


def test_fused_downsample_dc_matches_reference_op_order(rng):
    # The 2x2 stride-2 conv DC path must equal pixel-unshuffle + 1x1 conv
    # bit-for-bit up to fp reorder (identical params, identical math).
    fused = Downsample(24, 16, fuse_dc=True, **F32)
    plain = Downsample(24, 16, fuse_dc=False, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 24))
    p = plain.init(rng, x)
    np.testing.assert_allclose(np.asarray(fused.apply(p, x)),
                               np.asarray(plain.apply(p, x)),
                               rtol=1e-5, atol=1e-6)


def test_fused_qkv_matches_separate_projections(rng):
    # Folding the three QKV LayerNorm affines into one [C,3C] matmul must be
    # exact up to fp reassociation, with an identical param tree.
    fused = AttentionRoPE(128, head_dim=64, impl="xla", fuse_qkv=True, **F32)
    plain = AttentionRoPE(128, head_dim=64, impl="xla", fuse_qkv=False, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 128))
    p_plain = plain.init(rng, x)
    p_fused = fused.init(rng, x)
    assert (jax.tree_util.tree_structure(p_plain)
            == jax.tree_util.tree_structure(p_fused))
    np.testing.assert_allclose(np.asarray(fused.apply(p_plain, x)),
                               np.asarray(plain.apply(p_plain, x)),
                               rtol=1e-4, atol=1e-5)


def test_conv_ffn_fold_output_matches_literal(rng):
    # (y + z@W2)@Wout == y@Wout + z@(W2@Wout) + folded biases, same params.
    from deepl_project_tpu.ops.ffn import ConvFFN

    x = jax.random.normal(rng, (2, 8, 8, 32), jnp.float32)
    lit = ConvFFN(32, mlp_ratio=1.0, fold_output=False, dtype=jnp.float32)
    fold = ConvFFN(32, mlp_ratio=1.0, fold_output=True, dtype=jnp.float32)
    params = lit.init({"params": rng}, x)["params"]
    ref = lit.apply({"params": params}, x)
    out = fold.apply({"params": params}, x)
    assert jax.tree_util.tree_structure(
        fold.init({"params": rng}, x)["params"]) == \
        jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_upsample_dc_matches_reference_op_order(rng):
    # The 2x2 stride-2 TRANSPOSED conv DC path must equal 1x1 conv +
    # pixel-shuffle up to fp reorder (identical params, identical math).
    fused = Upsample(24, 16, fuse_dc=True, fuse_main=False, **F32)
    plain = Upsample(24, 16, fuse_dc=False, fuse_main=False, **F32)
    x = jax.random.normal(rng, (2, 8, 8, 24))
    p = plain.init(rng, x)
    np.testing.assert_allclose(np.asarray(fused.apply(p, x)),
                               np.asarray(plain.apply(p, x)),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ci,co", [(3, 24), (32, 24), (24, 3), (48, 40)])
def test_thin_conv_matches_native(rng, ci, co):
    # im2col (thin input), tap-major (thin output), and the native fallback
    # must all equal nn.Conv with the same params (fp reassociation only).
    from deepl_project_tpu.ops.thin_conv import ThinConv3x3

    thin = ThinConv3x3(ci, co, **F32)
    ref = nn.Conv(co, (3, 3), padding=((1, 1), (1, 1)), **F32)
    x = jax.random.normal(rng, (2, 9, 9, ci))
    p = thin.init(rng, x)
    y_thin = thin.apply(p, x)
    y_ref = ref.apply(p, x)
    assert y_thin.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_thin), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_qkv_kernel_vmem_gate():
    # The fused LN+QKV+RoPE kernel must refuse shapes whose weight/block
    # working set exceeds the scoped-VMEM budget (512px stage4 regression:
    # c=1536 N=1024 needs 256-row blocking; c=3072 must fall back entirely).
    from deepl_project_tpu.ops.pallas.fused_attention_block import (
        _qkv_rows, qkv_supported)

    assert _qkv_rows(4096, 384, 64) == 512       # headline stage2
    assert _qkv_rows(1024, 1536, 64) == 256      # 512px stage4: row-blocked
    assert _qkv_rows(1024, 3072, 64) == 0        # 3 x [C,C] bf16 = 56 MB
    assert qkv_supported(4096, 384, 64, jnp.bfloat16)
    assert not qkv_supported(4096, 384, 64, jnp.float32)   # bf16 only
    assert not qkv_supported(4100, 384, 64, jnp.bfloat16)  # row divisibility
    assert not qkv_supported(1024, 3072, 64, jnp.bfloat16)
