"""In-model stage cost attribution by depth ablation.

Isolated per-stage micro-benches (profile_stages.py) overcount: in the real
compiled graph XLA fuses norms/rope/transposes into neighbours, so summing
cold pieces does not reflect in-model cost. Every TransVAE stage is
dimension-preserving (only the Downsample/Upsample between stages changes
shape), so setting one stage's depth to 0 keeps the graph valid — the delta
vs baseline is that stage's TRUE marginal cost (encoder+decoder side
together, since depths apply to both). The all-zero-depths config leaves
just conv stem/heads + resamples: the resample/overhead floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stage_ablation.py
"""

import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
RES = 256


def timed(model, params, x, iters=10):
    @jax.jit
    def full(params, x):
        r, mu, lv = model.apply({"params": params}, x, sample=False)
        return r

    compiled = full.lower(params, x).compile()
    fetch = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    float(fetch(compiled(params, x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(params, x)
        float(fetch(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.models import init_params

    base_cfg = get_config("large", 16, 32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, RES, RES, 3),
                           jnp.bfloat16)

    depths = tuple(base_cfg.depths)
    variants = [("baseline", depths)]
    for i in range(len(depths)):
        d = list(depths)
        d[i] = 0
        variants.append((f"stage{i}_depth0", tuple(d)))
    variants.append(("all_depth0", tuple(0 for _ in depths)))

    results = {}
    for name, d in variants:
        cfg = base_cfg.replace(depths=d)
        model = TransVAE(cfg)
        params = init_params(model, rng, image_size=RES, batch=1)
        dt = timed(model, params, x)
        results[name] = dt
        print(f"{name:18s} {dt*1e3:8.2f} ms", flush=True)

    base = results["baseline"]
    print("\n== marginal stage costs (enc+dec sides combined) ==")
    for name, dt in results.items():
        if name.startswith("stage"):
            i = int(name[5])
            print(f"stage{i} (depth {depths[i]}): {1e3*(base-dt):8.2f} ms "
                  f"({100*(base-dt)/base:4.1f}% of step)", flush=True)
    print(f"resample+stem floor (all_depth0): "
          f"{1e3*results['all_depth0']:8.2f} ms "
          f"({100*results['all_depth0']/base:4.1f}% of step)")


if __name__ == "__main__":
    main()
