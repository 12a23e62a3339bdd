"""Flash-attention block-size sweep at the stage-2 shape (N=4096) — VERDICT
r4/r5 item 2: stage 2 is the largest step bucket (29%, XLA full attention at
~12.4 ms/call, ~34% MFU vs the 50% ceiling set by d=64 on the 128-lane MXU).
The r2 sweep only tried the 1024x1024 default (16.4 ms, lost to XLA); this
sweeps asymmetric blocks including whole-row K (one KV iteration = no online
-softmax rescale passes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_flash_n4096.py
"""

import jax
import jax.numpy as jnp

from bench_util import setup_cache
from bench_util import timed as _timed

setup_cache()


def main():
    from deepl_project_tpu.ops.attention import (xla_attention,
                                                 xla_attention_chunked)
    from deepl_project_tpu.ops.pallas.flash_attention import flash_attention

    rng = jax.random.PRNGKey(0)
    for b, n, h, d in [(32, 4096, 6, 64), (32, 1024, 12, 64)]:
        ks = jax.random.split(rng, 3)
        q, k, v = (jax.random.normal(key, (b, n, h, d), jnp.bfloat16)
                   for key in ks)
        scale = d ** -0.5
        flops = 4 * b * h * n * n * d
        print(f"-- b={b} n={n} h={h} d={d}", flush=True)

        rows = [("xla_full", lambda q, k, v: xla_attention(q, k, v, scale))]
        if n > 2048:
            rows.append(("xla_chunked2048",
                         lambda q, k, v: xla_attention_chunked(
                             q, k, v, scale, chunk=2048)))
        blocks = [(256, n), (512, n), (1024, n), (512, 2048), (1024, 2048),
                  (2048, 1024), (1024, 1024), (n, 512), (n, 256)]
        for bq, bk in blocks:
            if n % bq or n % bk:
                continue
            rows.append((f"pallas_q{bq}_k{bk}",
                         lambda q, k, v, bq=bq, bk=bk: flash_attention(
                             q, k, v, scale, block_q=bq, block_k=bk,
                             vmem_limit_mb=100)))
        for name, fn in rows:
            try:
                dt = _timed(fn, q, k, v, iters=20)[0]
                print(f"  {name:20s} {dt*1e3:8.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:20s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
