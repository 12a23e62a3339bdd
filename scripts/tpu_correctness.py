"""On-chip correctness checks for the TPU-only code paths.

The pytest suite runs on the virtual CPU platform (tests/conftest.py), so the
Pallas kernels and TPU dispatch bands are exercised there only via fallbacks.
This script runs the real-TPU equivalences: run it on hardware after touching
ops/pallas/*, the dispatch logic, or the fused resample paths.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_correctness.py
Exit code 0 = all checks passed.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FAILURES = []


def check(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    from deepl_project_tpu.ops.attention import core_attention, xla_attention
    from deepl_project_tpu.ops.pallas.flash_attention import flash_attention
    from deepl_project_tpu.ops.resample import Downsample, Upsample

    rng = jax.random.PRNGKey(0)

    # 1. Pallas flash attention forward vs XLA at the model's N values.
    for b, n, h in [(4, 1024, 12), (2, 4096, 6), (1, 16384, 6)]:
        d = 64
        ks = jax.random.split(rng, 3)
        q, k, v = (jax.random.normal(key, (b, n, h, d), jnp.bfloat16)
                   for key in ks)
        scale = d ** -0.5
        ref = jax.jit(lambda q, k, v: xla_attention(q, k, v, scale))(q, k, v)
        out = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))(q, k, v)
        e = rel_err(out, ref)
        check(f"flash fwd N={n}", e < 2e-2, f"rel_err={e:.2e}")

    # 2. Pallas flash attention backward vs XLA backward (custom VJP).
    for n, h in [(1024, 4), (4096, 2)]:
        b, d = 2, 64
        ks = jax.random.split(jax.random.fold_in(rng, n), 3)
        q, k, v = (jax.random.normal(key, (b, n, h, d), jnp.float32)
                   for key in ks)
        scale = d ** -0.5

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(xla_attention(q, k, v, scale) ** 2)

        g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
        e = max(rel_err(a, b2) for a, b2 in zip(g1, g2))
        check(f"flash bwd N={n}", e < 2e-2, f"rel_err={e:.2e}")

    # 2b. Whole-head small-attention kernel vs XLA.
    from deepl_project_tpu.ops.pallas.small_attention import small_attention

    for b, n, h in [(4, 256, 8), (2, 1024, 12)]:
        d = 64
        ks = jax.random.split(jax.random.fold_in(rng, 7 * n), 3)
        q, k, v = (jax.random.normal(key, (b, n, h, d), jnp.bfloat16)
                   for key in ks)
        scale = d ** -0.5
        ref = jax.jit(lambda q, k, v: xla_attention(q, k, v, scale))(q, k, v)
        out = jax.jit(lambda q, k, v: small_attention(q, k, v, scale))(q, k, v)
        e = rel_err(out, ref)
        check(f"small-attn N={n}", e < 2e-2, f"rel_err={e:.2e}")

    # 2c. Fused attention sublayer (LN trio + QKV + RoPE + attn + proj in
    # one kernel) vs the composable module path at the stage-3/4 shapes.
    from deepl_project_tpu.ops.attention import AttentionRoPE

    for s, c in [(32, 768), (16, 1536)]:
        hd = 64
        x = jax.random.normal(jax.random.fold_in(rng, s),
                              (2, s, s, c), jnp.bfloat16)
        mod_f = AttentionRoPE(c, head_dim=hd, impl="fused")
        mod_x = AttentionRoPE(c, head_dim=hd, impl="xla")
        p = mod_x.init({"params": rng}, x)["params"]
        out_f = jax.jit(lambda p, x: mod_f.apply({"params": p}, x))(p, x)
        out_x = jax.jit(lambda p, x: mod_x.apply({"params": p}, x))(p, x)
        e = rel_err(out_f, out_x)
        check(f"fused sublayer {s}x{s} c{c}", e < 2e-2, f"rel_err={e:.2e}")

    # 3. Dispatch bands: auto / auto_train vs explicit XLA on TPU.
    for impl in ("auto", "auto_train"):
        for n, h in [(1024, 12), (4096, 6)]:
            b, d = 2, 64
            ks = jax.random.split(jax.random.fold_in(rng, n + 1), 3)
            q, k, v = (jax.random.normal(key, (b, n, h, d), jnp.bfloat16)
                       for key in ks)
            scale = d ** -0.5
            ref = jax.jit(lambda q, k, v: xla_attention(q, k, v, scale))(
                q, k, v)
            out = jax.jit(lambda q, k, v: core_attention(
                q, k, v, scale, impl=impl))(q, k, v)
            e = rel_err(out, ref)
            check(f"dispatch {impl} N={n}", e < 2e-2, f"rel_err={e:.2e}")

    # 4. Fused resample paths vs literal op order, bf16 on TPU.
    x = jax.random.normal(rng, (2, 32, 32, 64), jnp.bfloat16)
    up_f = Upsample(64, 32, fuse_main=True)
    up_p = Upsample(64, 32, fuse_main=False)
    p = up_p.init(rng, x)
    e = rel_err(up_f.apply(p, x), up_p.apply(p, x))
    check("fused upsample", e < 2e-2, f"rel_err={e:.2e}")
    dn_f = Downsample(64, 128, fuse_dc=True)
    dn_p = Downsample(64, 128, fuse_dc=False)
    p = dn_p.init(rng, x)
    e = rel_err(dn_f.apply(p, x), dn_p.apply(p, x))
    check("fused downsample DC", e < 2e-2, f"rel_err={e:.2e}")

    # 5. Whole-model: auto dispatch vs forced-XLA forward (tiny @256).
    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.models import init_params

    cfg = get_config("tiny", 16, 32)
    m_auto = TransVAE(cfg)
    m_xla = TransVAE(cfg.replace(attention_impl="xla_chunked"))
    params = init_params(m_auto, rng, image_size=256, batch=1)
    xi = jax.random.uniform(jax.random.PRNGKey(1), (2, 256, 256, 3),
                            jnp.bfloat16)
    r1, _, _ = jax.jit(lambda p, x: m_auto.apply({"params": p}, x,
                                                 sample=False))(params, xi)
    r2, _, _ = jax.jit(lambda p, x: m_xla.apply({"params": p}, x,
                                                sample=False))(params, xi)
    e = rel_err(r1, r2)
    check("tiny@256 model auto vs xla", e < 5e-2, f"rel_err={e:.2e}")

    print(f"\n{len(FAILURES)} failures" if FAILURES else "\nALL CHECKS PASSED",
          flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
