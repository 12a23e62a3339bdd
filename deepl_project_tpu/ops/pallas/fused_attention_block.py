"""Fused attention sublayer: QKV-norm trio + projections + RoPE + attention
+ output projection in one Pallas kernel (inference path, N <= 1024).

Motivation (PERFORMANCE.md round-1 audit): the transformer stages dominate
the 256px encode+decode wall time, and most of each block's attention
sublayer is NOT the attention core (3.2 ms via the whole-head kernel at the
stage-3 shape) but the HBM round-trips around it: three LayerNorm stat
passes over x, three projection reads/writes, a RoPE pass over q/k, the
[B,N,h,d] <-> [B*h,N,d] transposes into and out of the attention kernel,
and the proj read/write. This kernel keeps the whole sublayer VMEM-resident
per (batch, head-group): x is read ONCE from HBM and the sublayer output is
written ONCE.

Matches the reference op-by-op (transvae/modules/attention.py:12-104 — the
three separate input LayerNorms, bias-free QKV, head split, 2D RoPE with
either pairing, scaled fp32 softmax, biased output projection), with the
same bf16-in/fp32-accumulate matmul semantics as the unfused flax path.

Design notes:
- Grid (B, head_groups); group width is a multiple of 128 lanes (Mosaic's
  block-divisibility rule) or the full channel width. The x block's index
  map is constant in the inner (head-group) axis so Pallas keeps it
  resident; weight column/row slices stream per group. A fp32 [N, C]
  scratch accumulates the per-group output-projection partials (exact
  K-split of the proj matmul), emitted once on the last group.
- RoPE without lane shuffles: the q/k weight COLUMNS are pre-permuted per
  head (even pair-entries first, odd second), so the rotation is pure
  elementwise arithmetic on contiguous [N, hd/2] halves. Attention is
  invariant to a per-head channel permutation applied to both q and k; v
  and the output stay in the original layout, so results are unchanged.
- The LN trio shares one normalization (stats depend only on x); each
  branch applies its own affine before its projection, like the fuse_qkv
  rewrite (attention.py:178-223) — exact up to fp reassociation. The
  affine+matmul runs in 256-row chunks so no full-width [N, C] temp is
  live beyond the cached xhat.

Forward-only: the custom VJP differentiates the XLA composition below
(`_reference`), which is what training uses anyway ('auto_train' never
selects this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_N = 1024  # fp32 [q_chunk, N] score blocks + [N, C] buffers must fit VMEM
_LN_EPS = 1e-5


def _kernel(x_ref, wq_ref, wk_ref, wv_ref, wp_ref,
            gq_ref, bq_ref, gk_ref, bk_ref, gv_ref, bv_ref, bp_ref,
            ca_ref, sa_ref, cb_ref, sb_ref,
            o_ref,
            xhat_ref, q_ref, k_ref, v_ref, acc_ref,
            *, group_heads: int, head_dim: int, scale: float, n_groups: int,
            row_chunk: int, use_rope: bool):
    hg = pl.program_id(1)
    n = x_ref.shape[1]
    f32 = jnp.float32

    @pl.when(hg == 0)
    def _prep():
        # Shared LN statistics (fp32), cached for all head groups.
        x32 = x_ref[0].astype(f32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xhat_ref[...] = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
                        ).astype(xhat_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    # Per-branch affine + projection, in row chunks (bounds live temps).
    for g_ref, b_ref, w_ref, dst_ref in (
            (gq_ref, bq_ref, wq_ref, q_ref),
            (gk_ref, bk_ref, wk_ref, k_ref),
            (gv_ref, bv_ref, wv_ref, v_ref)):
        gvec = g_ref[0].astype(f32)
        bvec = b_ref[0].astype(f32)
        w = w_ref[...]
        for r0 in range(0, n, row_chunk):
            xt = (xhat_ref[r0:r0 + row_chunk].astype(f32) * gvec
                  + bvec).astype(xhat_ref.dtype)
            dst_ref[r0:r0 + row_chunk] = jax.lax.dot(
                xt, w, preferred_element_type=f32).astype(dst_ref.dtype)

    hd2 = head_dim // 2
    if use_rope:
        ca = ca_ref[...].astype(f32)  # [N, hd/2]
        sa = sa_ref[...].astype(f32)
        cb = cb_ref[...].astype(f32)
        sb = sb_ref[...].astype(f32)
        for ref in (q_ref, k_ref):
            rot = []
            full = ref[...]
            for h_i in range(group_heads):
                lo = h_i * head_dim
                e = full[:, lo:lo + hd2].astype(f32)
                o = full[:, lo + hd2:lo + head_dim].astype(f32)
                rot.append(jnp.concatenate(
                    [e * ca - o * sa, e * sb + o * cb],
                    axis=1).astype(ref.dtype))
            ref[...] = jnp.concatenate(rot, axis=1)

    qs = q_ref[...]
    ks = k_ref[...]
    vs = v_ref[...]
    wp = wp_ref[...]
    # Row-chunked attention + projection: bounds the fp32 score block to
    # [row_chunk, N] while the softmax stays exact (whole rows in VMEM).
    for r0 in range(0, n, row_chunk):
        outs = []
        for h_i in range(group_heads):
            sl = slice(h_i * head_dim, (h_i + 1) * head_dim)
            s = jax.lax.dot_general(
                qs[r0:r0 + row_chunk, sl], ks[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=f32) * scale  # [row_chunk, N]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vs.dtype)
            outs.append(jnp.dot(p, vs[:, sl],
                                preferred_element_type=f32).astype(vs.dtype))
        og = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        acc_ref[r0:r0 + row_chunk] += jax.lax.dot(
            og, wp, preferred_element_type=f32)

    @pl.when(hg == n_groups - 1)
    def _emit():
        o_ref[0] = (acc_ref[...]
                    + bp_ref[0].astype(f32)).astype(o_ref.dtype)


def _rope_tables(head_dim: int, height: int, width: int, pairing: str):
    from ..rope import _rope2d_tables_np

    cos_a, sin_a, cos_b, sin_b = _rope2d_tables_np(head_dim, height, width)
    if pairing == "standard":
        cos_b, sin_b = cos_a, sin_a
    elif pairing != "reference":
        raise ValueError(f"Unknown rope pairing: {pairing!r}")
    return tuple(jnp.asarray(t) for t in (cos_a, sin_a, cos_b, sin_b))


def _head_perm(num_heads: int, head_dim: int) -> np.ndarray:
    """Per-head column permutation: even pair-entries first, odd second."""
    idx = []
    for h in range(num_heads):
        base = h * head_dim
        idx.extend(base + i for i in range(0, head_dim, 2))
        idx.extend(base + i for i in range(1, head_dim, 2))
    return np.asarray(idx, dtype=np.int32)


def _pick_group(num_heads: int, head_dim: int, n: int, c: int) -> int:
    """Largest head-group whose working set fits VMEM. Group width must be a
    multiple of 128 lanes (Mosaic block divisibility) or the full width."""
    best = 0
    for g in range(1, num_heads + 1):
        if num_heads % g:
            continue
        hgd = g * head_dim
        if hgd % 128 and hgd != c:
            continue
        # x (double-buffered) + xhat + out, acc fp32, per-group buffers,
        # double-buffered weight slices, one chunked fp32 score block, tables.
        est = (2 * n * c * 2 + n * c * 2 + n * c * 2 + n * c * 4
               + 3 * n * hgd * 2 + 2 * 4 * c * hgd * 2
               + min(n, 256) * n * 4 + 4 * n * (head_dim // 2) * 4
               + 256 * c * 2)
        if est <= 14 * 1024 * 1024:
            best = g
    return best


def _reference(xf, ln_params, wq, wk, wv, wp, bp, height, width,
               pairing, head_dim, scale, use_rope):
    """XLA composition with identical math — backward path and CPU/test
    reference. ln_params: ((gq, bq), (gk, bk), (gv, bv))."""
    from ..rope import apply_rope2d

    b, n, c = xf.shape
    nh = c // head_dim
    x32 = xf.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xhat = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(xf.dtype)

    outs = []
    for (g, bb), w in zip(ln_params, (wq, wk, wv)):
        xt = (xhat.astype(jnp.float32) * g.astype(jnp.float32)
              + bb.astype(jnp.float32)).astype(xf.dtype)
        outs.append(jnp.dot(xt, w.astype(xf.dtype),
                            preferred_element_type=jnp.float32).astype(xf.dtype))
    q, k, v = (t.reshape(b, n, nh, head_dim) for t in outs)
    if use_rope:
        q = apply_rope2d(q, height, width, pairing)
        k = apply_rope2d(k, height, width, pairing)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    o = o.reshape(b, n, c)
    return (jnp.dot(o, wp.astype(xf.dtype),
                    preferred_element_type=jnp.float32)
            + bp.astype(jnp.float32)[None, None]).astype(xf.dtype)


def _forward(xf, ln_params, wq, wk, wv, wp, bp, height, width,
             pairing, head_dim, scale, use_rope, interpret):
    b, n, c = xf.shape
    nh = c // head_dim
    dt = xf.dtype
    g = _pick_group(nh, head_dim, n, c)
    if g == 0 and not interpret:
        return _reference(xf, ln_params, wq, wk, wv, wp, bp, height, width,
                          pairing, head_dim, scale, use_rope)
    g = g or nh
    n_groups = nh // g
    hgd = g * head_dim
    row_chunk = 256 if n % 256 == 0 else n

    perm = _head_perm(nh, head_dim)
    wqp = wq[:, perm].astype(dt)
    wkp = wk[:, perm].astype(dt)
    ca, sa, cb, sb = _rope_tables(head_dim, height, width, pairing)

    def row(v32):
        return v32.astype(jnp.float32).reshape(1, -1)

    (gq, bq), (gk, bk), (gv, bv) = [
        (row(gg), row(bb)) for gg, bb in ln_params]

    wspec_col = pl.BlockSpec((c, hgd), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
    wspec_row = pl.BlockSpec((hgd, c), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((n, head_dim // 2), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _kernel, group_heads=g, head_dim=head_dim, scale=float(scale),
            n_groups=n_groups, row_chunk=row_chunk, use_rope=use_rope),
        grid=(b, n_groups),
        in_specs=[xspec, wspec_col, wspec_col, wspec_col, wspec_row,
                  vec, vec, vec, vec, vec, vec, vec,
                  tab, tab, tab, tab],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
        scratch_shapes=[
            pltpu.VMEM((n, c), dt),            # xhat
            pltpu.VMEM((n, hgd), dt),          # q group
            pltpu.VMEM((n, hgd), dt),          # k group
            pltpu.VMEM((n, hgd), dt),          # v group
            pltpu.VMEM((n, c), jnp.float32),   # proj accumulator
        ],
        # The stage-3 working set (x + xhat + acc + out at [1024, 768]) sits
        # just above the compiler's default 16M scoped-vmem budget; v5e
        # physical VMEM accommodates the ~17M peak.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(xf, wqp, wkp, wv.astype(dt), wp.astype(dt),
      gq, bq, gk, bk, gv, bv, row(bp),
      ca, sa, cb, sb)
    return out


@functools.lru_cache(maxsize=None)
def _make_op(height, width, pairing, head_dim, scale, use_rope, interpret):
    @jax.custom_vjp
    def op(xf, gq, bq, gk, bk, gv, bv, wq, wk, wv, wp, bp):
        return _forward(xf, ((gq, bq), (gk, bk), (gv, bv)), wq, wk, wv,
                        wp, bp, height, width, pairing, head_dim, scale,
                        use_rope, interpret)

    def ref(xf, gq, bq, gk, bk, gv, bv, wq, wk, wv, wp, bp):
        return _reference(xf, ((gq, bq), (gk, bk), (gv, bv)), wq, wk, wv,
                          wp, bp, height, width, pairing, head_dim, scale,
                          use_rope)

    def fwd(*args):
        return op(*args), args

    def bwd(residuals, g):
        _, vjp = jax.vjp(ref, *residuals)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def _qkv_rope_kernel(x_ref, wq_ref, wk_ref, wv_ref,
                     gq_ref, bq_ref, gk_ref, bk_ref, gv_ref, bv_ref,
                     ca_ref, sa_ref, cb_ref, sb_ref,
                     q_ref, k_ref, v_ref,
                     *, num_heads: int, head_dim: int, use_rope: bool):
    f32 = jnp.float32
    x32 = x_ref[0].astype(f32)  # [rows, C]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xhat = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)

    hd2 = head_dim // 2
    if use_rope:
        ca = ca_ref[...].astype(f32)
        sa = sa_ref[...].astype(f32)
        cb = cb_ref[...].astype(f32)
        sb = sb_ref[...].astype(f32)
    for g_ref, b_ref, w_ref, dst_ref, rope in (
            (gq_ref, bq_ref, wq_ref, q_ref, True),
            (gk_ref, bk_ref, wk_ref, k_ref, True),
            (gv_ref, bv_ref, wv_ref, v_ref, False)):
        xt = (xhat * g_ref[0].astype(f32)
              + b_ref[0].astype(f32)).astype(dst_ref.dtype)
        t = jax.lax.dot(xt, w_ref[...], preferred_element_type=f32
                        ).astype(dst_ref.dtype)
        if use_rope and rope:
            rot = []
            for h_i in range(num_heads):
                lo = h_i * head_dim
                e = t[:, lo:lo + hd2].astype(f32)
                o = t[:, lo + hd2:lo + head_dim].astype(f32)
                rot.append(jnp.concatenate(
                    [e * ca - o * sa, e * sb + o * cb],
                    axis=1).astype(t.dtype))
            t = jnp.concatenate(rot, axis=1)
        dst_ref[0] = t


def fused_qkv_rope(xf, ln_params, wq, wk, wv, height, width,
                   pairing="reference", head_dim=64, use_rope=True,
                   interpret: bool = False):
    """LN trio + QKV projections + 2D RoPE in one row-blocked kernel.

    For token axes too long for the whole-sublayer kernel (stage 2's N=4096
    and 512/1024px inference): eliminates the three LN stat passes, the
    separate q/k/v materialization and the fp32 RoPE pass. Returns
    (q, k, v) each [B, N, C] with q/k in the per-head [evens|odds] PERMUTED
    layout — attention cores are invariant to a consistent per-head channel
    permutation of q and k, so callers feed them to any core directly and
    must NOT re-apply RoPE.
    """
    b, n, c = xf.shape
    nh = c // head_dim
    dt = xf.dtype
    rows = _qkv_rows(n, c, head_dim)
    assert rows, (n, c)  # callers gate on qkv_supported()
    perm = _head_perm(nh, head_dim)
    wqp = wq[:, perm].astype(dt)
    wkp = wk[:, perm].astype(dt)
    ca, sa, cb, sb = _rope_tables(head_dim, height, width, pairing)

    def row(v32):
        return v32.astype(jnp.float32).reshape(1, -1)

    (gq, bq), (gk, bk), (gv, bv) = [
        (row(gg), row(bb)) for gg, bb in ln_params]

    wspec = pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((rows, head_dim // 2), lambda i, j: (j, 0),
                       memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((b, n, c), dt)
    q, k, v = pl.pallas_call(
        functools.partial(_qkv_rope_kernel, num_heads=nh, head_dim=head_dim,
                          use_rope=use_rope),
        grid=(b, n // rows),
        in_specs=[xspec, wspec, wspec, wspec,
                  vec, vec, vec, vec, vec, vec,
                  tab, tab, tab, tab],
        out_specs=(xspec, xspec, xspec),
        out_shape=(shape, shape, shape),
        # Wide-channel stages (c=1536 at 512px+) exceed the compiler's 16M
        # default scoped-vmem budget: the three [C, C] weight buffers alone
        # are 14.2 MB bf16 at c=1536.  Same raise as the sublayer kernel.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=26 * 1024 * 1024),
        interpret=interpret,
    )(xf, wqp, wkp, wv.astype(dt),
      gq, bq, gk, bk, gv, bv, ca, sa, cb, sb)
    return q, k, v


def _qkv_rows(n: int, c: int, head_dim: int) -> int:
    """Largest row block whose working set fits the raised scoped-vmem
    budget, 0 when even 256 rows do not fit (callers fall back to the XLA
    composition). Budget terms: 3 [C,C] bf16 weight buffers (constant index
    map — single-buffered), double-buffered x block + 3 output blocks, fp32
    x32/LN temps, RoPE tables; ~25% headroom for Mosaic stack temps."""
    for rows in (512, 256):
        if n % rows:
            continue
        est = (3 * c * c * 2              # wq/wk/wv
               + 2 * rows * c * 2         # x block, double-buffered
               + 6 * rows * c * 2         # q/k/v blocks, double-buffered
               + 2 * rows * c * 4         # fp32 x32 + one branch temp
               + 8 * rows * (head_dim // 2) * 4)
        if est <= 24 * 1024 * 1024:
            return rows
    return 0


def qkv_supported(n: int, c: int, head_dim: int, dtype) -> bool:
    """Dispatch predicate for fused_qkv_rope (mirrors supported())."""
    return (n % 256 == 0 and head_dim % 4 == 0 and c % head_dim == 0
            and head_dim <= 128 and dtype == jnp.bfloat16
            and _qkv_rows(n, c, head_dim) > 0)


@functools.lru_cache(maxsize=None)
def _make_qkv_op(height, width, pairing, head_dim, use_rope, interpret):
    @jax.custom_vjp
    def op(xf, gq, bq, gk, bk, gv, bv, wq, wk, wv):
        return fused_qkv_rope(
            xf, ((gq, bq), (gk, bk), (gv, bv)), wq, wk, wv, height, width,
            pairing, head_dim, use_rope, interpret)

    def ref(xf, gq, bq, gk, bk, gv, bv, wq, wk, wv):
        return qkv_rope_reference(
            xf, ((gq, bq), (gk, bk), (gv, bv)), wq, wk, wv, height, width,
            pairing, head_dim, use_rope)

    def fwd(*args):
        return op(*args), args

    def bwd(residuals, g):
        _, vjp = jax.vjp(ref, *residuals)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def fused_qkv_rope_op(xf, ln_params, wq, wk, wv, height, width,
                      pairing="reference", head_dim=64, use_rope=True,
                      interpret: bool = False):
    """Differentiable wrapper: Pallas forward, XLA-composition backward."""
    (gq, bq), (gk, bk), (gv, bv) = ln_params
    op = _make_qkv_op(height, width, pairing, head_dim, bool(use_rope),
                      bool(interpret))
    return op(xf, gq, bq, gk, bk, gv, bv, wq, wk, wv)


def qkv_rope_reference(xf, ln_params, wq, wk, wv, height, width,
                       pairing="reference", head_dim=64, use_rope=True):
    """XLA composition matching fused_qkv_rope INCLUDING the permuted q/k
    layout (for the custom VJP and tests)."""
    b, n, c = xf.shape
    nh = c // head_dim
    x32 = xf.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xhat = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(xf.dtype)
    perm = _head_perm(nh, head_dim)
    outs = []
    for (g, bb), w, permute in zip(ln_params, (wq, wk, wv),
                                   (True, True, False)):
        wmat = w[:, perm] if permute else w
        xt = (xhat.astype(jnp.float32) * g.astype(jnp.float32)
              + bb.astype(jnp.float32)).astype(xf.dtype)
        outs.append(jnp.dot(xt, wmat.astype(xf.dtype),
                            preferred_element_type=jnp.float32).astype(xf.dtype))
    q, k, v = outs
    if use_rope:
        ca, sa, cb, sb = _rope_tables(head_dim, height, width, pairing)
        hd2 = head_dim // 2

        def rot(t):
            t4 = t.reshape(b, n, nh, head_dim).astype(jnp.float32)
            e = t4[..., :hd2]
            o = t4[..., hd2:]
            out = jnp.concatenate(
                [e * ca[None, :, None, :] - o * sa[None, :, None, :],
                 e * sb[None, :, None, :] + o * cb[None, :, None, :]],
                axis=-1)
            return out.reshape(b, n, c).astype(t.dtype)

        q, k = rot(q), rot(k)
    return q, k, v


def supported(n: int, c: int, head_dim: int, dtype) -> bool:
    """Dispatch predicate: shapes this kernel handles well on TPU."""
    return (n <= _MAX_N and n % 256 == 0 and head_dim % 4 == 0
            and c % head_dim == 0 and head_dim <= 128
            and dtype == jnp.bfloat16
            and _pick_group(c // head_dim, head_dim, n, c) > 0)


def fused_attention_sublayer(xf, ln_params, wq, wk, wv, wp, bp,
                             height, width, pairing="reference",
                             head_dim=64, use_rope=True,
                             interpret: bool = False):
    """Full attention sublayer on token input xf [B, N, C] -> [B, N, C].

    ln_params: ((gq, bq), (gk, bk), (gv, bv)) LayerNorm affines, fp32 [C].
    wq/wk/wv: bias-free [C, C]; wp/bp: output projection [C, C], [C].
    """
    n, c = xf.shape[1], xf.shape[2]
    scale = head_dim ** -0.5
    (gq, bq), (gk, bk), (gv, bv) = ln_params
    if not supported(n, c, head_dim, xf.dtype) and not interpret:
        return _reference(xf, ln_params, wq, wk, wv, wp, bp, height, width,
                          pairing, head_dim, scale, use_rope)
    op = _make_op(height, width, pairing, head_dim, float(scale),
                  bool(use_rope), bool(interpret))
    return op(xf, gq, bq, gk, bk, gv, bv, wq, wk, wv, wp, bp)
