"""Sub-op breakdown of the transformer-stage blocks (stage3/stage4 shapes).

The round-1 audit showed enc stage3 (attn x4 @32^2 c768) at 1.25x of its
roofline floor and stage4 (attn x6 @16^2 c1536) at 1.90x — but only at
whole-stage granularity. This times the pieces: full block, attention
sublayer, LN-trio+QKV projections, attention core, output proj, ConvFFN —
so the fused-kernel work (ROADMAP round 2) targets the real time sinks.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_block_breakdown.py
"""

import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 32


import functools

import bench_util
from bench_util import timed as _timed

report = functools.partial(bench_util.report, width=34)


def timed(fn, *args, iters=20):
    dt, flops, _ = _timed(fn, *args, iters=iters)
    return dt, flops


def main():
    from deepl_project_tpu.ops.attention import AttentionRoPE, core_attention
    from deepl_project_tpu.ops.blocks import TransVAEBlock
    from deepl_project_tpu.ops.ffn import ConvFFN
    from deepl_project_tpu.ops.norms import LayerNorm
    from deepl_project_tpu.ops.rope import apply_rope2d

    rng = jax.random.PRNGKey(0)
    for s, c in ((32, 768), (16, 1536)):
        n, nh, hd = s * s, c // 64, 64
        print(f"== stage shape {s}x{s} c{c} (N={n}, heads={nh}) b{BATCH} ==",
              flush=True)
        x = jax.random.normal(rng, (BATCH, s, s, c), jnp.bfloat16)
        xf = x.reshape(BATCH, n, c)

        block = TransVAEBlock(c, head_dim=hd, dtype=jnp.bfloat16)
        p = block.init({"params": rng}, x)["params"]
        dt, fl = timed(lambda p, x: block.apply({"params": p}, x), p, x)
        report("full block", dt, fl)

        attn = AttentionRoPE(c, head_dim=hd, dtype=jnp.bfloat16)
        pa = attn.init({"params": rng}, x)["params"]
        dt, fl = timed(lambda p, x: attn.apply({"params": p}, x), pa, x)
        report("attention sublayer (all)", dt, fl)

        # LN trio + QKV projections only (the pre-attention stack).
        ln = LayerNorm(c, dtype=jnp.bfloat16)
        pl_ = ln.init(rng, xf)["params"]
        wq = jax.random.normal(rng, (c, c), jnp.bfloat16) * 0.02

        def ln_qkv(pl_, xf, wq):
            outs = []
            for _ in range(3):
                outs.append(ln.apply({"params": pl_}, xf) @ wq)
            return outs

        dt, fl = timed(ln_qkv, pl_, xf, wq)
        report("LN trio + 3 QKV matmuls", dt, fl)

        # RoPE on q,k.
        q4 = jax.random.normal(rng, (BATCH, n, nh, hd), jnp.bfloat16)

        def rope2(q4):
            return apply_rope2d(q4, s, s), apply_rope2d(q4, s, s)

        dt, fl = timed(rope2, q4)
        report("RoPE on q and k", dt, fl)

        # Attention core via the production dispatch (inference 'auto').
        dt, fl = timed(
            lambda q: core_attention(q, q, q, hd ** -0.5, impl="auto"), q4)
        report("attention core (auto dispatch)", dt, fl)

        # Output projection.
        wp = jax.random.normal(rng, (c, c), jnp.bfloat16) * 0.02
        dt, fl = timed(lambda xf, wp: xf @ wp, xf, wp)
        report("out proj matmul", dt, fl)

        ffn = ConvFFN(c, mlp_ratio=1.0, dtype=jnp.bfloat16)
        pf = ffn.init({"params": rng}, x)["params"]
        dt, fl = timed(lambda p, x: ffn.apply({"params": p}, x), pf, x)
        report("ConvFFN sublayer", dt, fl)


if __name__ == "__main__":
    main()
