"""Round-2c scouting: full stage2 block accounting + resample/stem/head ops.

bench_round2b.py showed ConvFFN at XLA's matmul floor and XLA winning the
N=4096 attention core. What remains unexplained: stage2's per-block time
beyond (attention core + FFN), and the 87 ms 'resamples + stem/heads'
bucket at 31-41% MFU. This times those directly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_round2c.py
"""

import functools

import jax
import jax.numpy as jnp

import bench_util
from bench_util import setup_cache, timed

setup_cache()

BATCH = 32
report = functools.partial(bench_util.report, width=46)


def bench_stage2_block():
    from deepl_project_tpu.ops.blocks import TransVAEBlock

    rng = jax.random.PRNGKey(0)
    s, c = 64, 384
    print(f"== full TransVAEBlock {s}x{s} c{c} b{BATCH} ==", flush=True)
    x = jax.random.normal(rng, (BATCH, s, s, c), jnp.bfloat16)
    block = TransVAEBlock(c, head_dim=64, dtype=jnp.bfloat16,
                          attention_impl="auto")
    p = block.init({"params": rng}, x)["params"]
    dt, fl, by = timed(lambda p, x: block.apply({"params": p}, x), p, x)
    report("full block (auto)", dt, fl, by)

    from deepl_project_tpu.ops.attention import AttentionRoPE
    attn = AttentionRoPE(c, head_dim=64, dtype=jnp.bfloat16, impl="auto")
    pa = attn.init({"params": rng}, x)["params"]
    dt, fl, by = timed(lambda p, x: attn.apply({"params": p}, x), pa, x)
    report("attention sublayer alone", dt, fl, by)

    # The fused qkv+rope kernel alone.
    from deepl_project_tpu.ops.pallas.fused_attention_block import (
        fused_qkv_rope)
    xf = x.reshape(BATCH, s * s, c)
    ln = tuple((jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))
               for _ in range(3))
    wq = jax.random.normal(rng, (c, c), jnp.float32) * 0.02

    def qkv(xf, wq):
        return fused_qkv_rope(xf, ln, wq, wq, wq, s, s)

    dt, fl, by = timed(qkv, xf, wq)
    report("fused LN+QKV+RoPE kernel", dt, fl, by)

    # fold/unfold transposes around the attention core.
    q4 = jax.random.normal(rng, (BATCH, s * s, 6, 64), jnp.bfloat16)

    def fold3(q4):
        def f(t):
            return t.transpose(0, 2, 1, 3).reshape(BATCH * 6, s * s, 64)
        return f(q4), f(q4 + 1), f(q4 + 2)

    dt, fl, by = timed(fold3, q4)
    report("fold transposes x3 [B,N,h,d]->[bh,N,d]", dt, fl, by)


def bench_resamples():
    from deepl_project_tpu.ops.resample import Downsample, Upsample
    from deepl_project_tpu.ops.norms import GroupNorm, gn_groups

    rng = jax.random.PRNGKey(0)
    print("== resample / stem / head ops (encoder+decoder path) b32 ==",
          flush=True)

    # Encoder: stem conv 3->192 @256, down 192->192 @256->128,
    # down 192->384 @128->64 (DC), down 384->768 @64->32 (DC),
    # down 768->1536 @32->16 (DC).   Decoder mirrors with Upsample.
    stem_x = jax.random.normal(rng, (BATCH, 256, 256, 3), jnp.bfloat16)
    wstem = jax.random.normal(rng, (3, 3, 3, 192), jnp.bfloat16) * 0.02
    dt, fl, by = timed(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), stem_x, wstem)
    report("stem conv3x3 3->192 @256", dt, fl, by)

    for cin, cout, res, use_dc in ((192, 192, 256, False), (192, 384, 128, True),
                                   (384, 768, 64, True), (768, 1536, 32, True)):
        x = jax.random.normal(rng, (BATCH, res, res, cin), jnp.bfloat16)
        down = Downsample(cin, cout, dtype=jnp.bfloat16)
        p = down.init({"params": rng}, x)["params"]
        dt, fl, by = timed(lambda p, x, m=down: m.apply({"params": p}, x),
                           p, x)
        report(f"Downsample {cin}->{cout} @{res}", dt, fl, by)

    for cin, cout, res in ((1536, 768, 16), (768, 384, 32), (384, 192, 64),
                           (192, 192, 128)):
        x = jax.random.normal(rng, (BATCH, res, res, cin), jnp.bfloat16)
        up = Upsample(cin, cout, dtype=jnp.bfloat16)
        p = up.init({"params": rng}, x)["params"]
        dt, fl, by = timed(lambda p, x, m=up: m.apply({"params": p}, x),
                           p, x)
        report(f"Upsample {cin}->{cout} @{res}", dt, fl, by)

    # Decoder output head: GN -> SiLU -> conv3x3 192->3 @256.
    x = jax.random.normal(rng, (BATCH, 256, 256, 192), jnp.bfloat16)
    gn = GroupNorm(gn_groups(192), 192, dtype=jnp.bfloat16)
    pg = gn.init(rng, x)["params"]
    wout = jax.random.normal(rng, (3, 3, 192, 3), jnp.bfloat16) * 0.02

    def head(pg, x, wout):
        h = jax.nn.silu(gn.apply({"params": pg}, x))
        return jax.lax.conv_general_dilated(
            h, wout, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt, fl, by = timed(head, pg, x, wout)
    report("out head GN+SiLU+conv 192->3 @256", dt, fl, by)

    # GN+SiLU standalone at the hot CNN shape (what ResBlocks pay between convs)
    def gnsilu(pg, x):
        return jax.nn.silu(gn.apply({"params": pg}, x))

    dt, fl, by = timed(gnsilu, pg, x)
    report("GN+SiLU @256 c192 standalone", dt, fl, by)


if __name__ == "__main__":
    bench_stage2_block()
    bench_resamples()
