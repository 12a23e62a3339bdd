"""Round-2b perf scouting: stage2 (N=4096) attention variants and ConvFFN
decomposition at the three transformer-stage shapes.

The round-2 stage attribution (scripts/bench_stage_ablation.py) leaves three
buckets above 90 ms at the 54.4 img/s build: stage2 (attn x3 @64^2 c384,
209 ms), stage0 ResBlocks (123.6 ms), stage4 (attn x6 @16^2 c1536, 123 ms).
This times the candidate levers before any kernel is written:

  A. stage2 attention core: XLA full vs flash(1024x1024) vs flash whole-K
     (block_k = N, no online-softmax rescale, K/V resident across q blocks).
  B. ConvFFN at each stage shape vs the sum of its bare matmuls/convs
     (the fused-kernel upper bound: if the gap is small, XLA has already
     fused the elementwise and a Pallas ConvFFN cannot win).

Usage: python scripts/bench_round2b.py
"""

import jax
import jax.numpy as jnp

from bench_util import report, setup_cache
from bench_util import timed as _timed

setup_cache()

BATCH = 32


def timed(fn, *args, iters=20):
    dt, flops, _ = _timed(fn, *args, iters=iters)
    return dt, flops


def bench_stage2_attention():
    from deepl_project_tpu.ops.attention import core_attention
    from deepl_project_tpu.ops.pallas.flash_attention import flash_attention

    rng = jax.random.PRNGKey(0)
    n, nh, hd = 4096, 6, 64
    scale = hd ** -0.5
    q = jax.random.normal(rng, (BATCH, n, nh, hd), jnp.bfloat16)
    print(f"== stage2 attention core: N={n} h{nh} d{hd} b{BATCH} ==",
          flush=True)

    dt, fl = timed(lambda q: core_attention(q, q, q, scale, impl="auto"), q)
    report("auto dispatch (current)", dt, fl)
    dt, fl = timed(lambda q: core_attention(q, q, q, scale, impl="xla"), q)
    report("XLA full", dt, fl)
    for bq, bk in ((1024, 1024), (512, 4096), (256, 4096), (1024, 4096),
                   (512, 2048), (2048, 4096)):
        try:
            dt, fl = timed(
                lambda q, bq=bq, bk=bk: flash_attention(q, q, q, scale,
                                                        block_q=bq,
                                                        block_k=bk), q)
            report(f"flash {bq}x{bk}", dt, fl)
        except Exception as e:  # VMEM overflow etc.
            print(f"  flash {bq}x{bk}: {type(e).__name__}: {str(e)[:90]}",
                  flush=True)


def bench_ffn_decomposition():
    from deepl_project_tpu.ops.ffn import ConvFFN
    from deepl_project_tpu.ops.norms import RMSNorm

    rng = jax.random.PRNGKey(0)
    for s, c in ((64, 384), (32, 768), (16, 1536)):
        n = s * s
        ch = c  # mlp_ratio 1 -> conv width == dim
        hidden = 4 * c
        print(f"== ConvFFN decomposition {s}x{s} c{c} (N={n}) b{BATCH} ==",
              flush=True)
        x = jax.random.normal(rng, (BATCH, s, s, c), jnp.bfloat16)
        xf = x.reshape(BATCH, n, c)

        norm = RMSNorm(c, dtype=jnp.bfloat16)
        pn = norm.init(rng, x)["params"]
        ffn = ConvFFN(c, mlp_ratio=1.0, dtype=jnp.bfloat16)
        pf = ffn.init({"params": rng}, x)["params"]

        dt_full, fl_full = timed(
            lambda pn, pf, x: ffn.apply(
                {"params": pf}, norm.apply({"params": pn}, x)), pn, pf, x)
        report("RMSNorm + ConvFFN (in-model form)", dt_full, fl_full)

        # The bare matmuls/convs only (MXU floor at XLA's own conv/matmul
        # efficiency): proj_in, head matmul, conv3x3, fold matmul.
        w_in = jax.random.normal(rng, (c, hidden), jnp.bfloat16) * 0.02
        w_head = jax.random.normal(rng, (hidden, 2 * ch), jnp.bfloat16) * 0.02
        w_conv = jax.random.normal(rng, (3, 3, ch, ch), jnp.bfloat16) * 0.02
        w_fold = jax.random.normal(rng, (ch, c), jnp.bfloat16) * 0.02

        def matmuls_only(xf, x, w_in, w_head, w_conv, w_fold):
            y = jnp.dot(xf, w_in, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            yw = jnp.dot(y, w_head, preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
            z = yw[..., :ch].reshape(BATCH, s, s, ch)
            z = jax.lax.conv_general_dilated(
                z, w_conv, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o = jnp.dot(z.reshape(BATCH, n, ch), w_fold,
                        preferred_element_type=jnp.float32)
            return o + yw[..., ch:]

        dt_mm, fl_mm = timed(matmuls_only, xf, x, w_in, w_head, w_conv,
                             w_fold)
        report("bare matmuls+conv (XLA floor)", dt_mm, fl_mm)
        print(f"  -> elementwise/fusion overhead: {1e3*(dt_full-dt_mm):.2f} "
              f"ms ({100*(dt_full-dt_mm)/dt_full:.0f}% of sublayer)",
              flush=True)

        # Individual pieces for attribution.
        def proj_in(xf, w_in):
            return jnp.dot(xf, w_in, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
        dt, fl = timed(proj_in, xf, w_in)
        report("proj_in matmul [N,c]@[c,4c]", dt, fl)

        y = jax.random.normal(rng, (BATCH, n, hidden), jnp.bfloat16)
        dt, fl = timed(lambda y, w: jnp.dot(
            y, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            y, w_head)
        report("head matmul [N,4c]@[4c,2c]", dt, fl)

        z = jax.random.normal(rng, (BATCH, s, s, ch), jnp.bfloat16)
        dt, fl = timed(lambda z, w: jax.lax.conv_general_dilated(
            z, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            z, w_conv)
        report("conv3x3 [s,s,c]->[s,s,c]", dt, fl)

        dt, fl = timed(lambda y: jax.nn.gelu(y, approximate=True), y)
        report("gelu on [N,4c] (one pass)", dt, fl)


if __name__ == "__main__":
    bench_stage2_attention()
    bench_ffn_decomposition()
