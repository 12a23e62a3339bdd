"""Training-step attribution: where do the milliseconds go under remat?

The inference side got profile-guided optimization (bench_stage_ablation.py);
training never did (round-2 verdict Weak-2: 33% MFU train vs 54% inference).
This is the training analogue, with two modes:

  decomp — split one config's step time into forward-loss / grads(fwd+bwd) /
           full step (+optimizer), plus an inference forward for reference.
           The bwd:fwd ratio exposes how much remat recompute costs.
  stages — per-stage marginal cost of the FULL train step by depth ablation
           (same methodology as bench_stage_ablation.py: every stage is
           dimension-preserving, so depth=0 keeps the graph valid and the
           delta vs baseline is that stage's true fwd+bwd+remat cost).

Config is env-parameterized like probe_large_train.py:
  PROBE_VARIANT=large PROBE_REMAT=1 PROBE_REMAT_POLICY=dots PROBE_SCAN=1
  PROBE_ATTN=auto_train PROBE_OPTIMIZER=adafactor PROBE_MU_DTYPE=
Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py \
      decomp [res] [batch]
  ... scripts/profile_train.py stages [res] [batch]

Each measurement does a scalar readback per timing window (the tunnel does
not honor block_until_ready). Results append to RESULTS/ via record_run.py.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def env_flag(name, default):
    return os.environ.get(name, "1" if default else "0") not in ("0", "")


def build_cfg(variant=None):
    from deepl_project_tpu import get_config

    return get_config(variant or os.environ.get("PROBE_VARIANT", "large"),
                      16, 32).replace(
        remat=env_flag("PROBE_REMAT", True),
        remat_policy=os.environ.get("PROBE_REMAT_POLICY", "dots"),
        scan_blocks=env_flag("PROBE_SCAN", True),
        norm_latents=True,
        remat_resample=env_flag("PROBE_REMAT_RESAMPLE", True),
        attention_impl=os.environ.get("PROBE_ATTN", "auto_train"))


def make_parts(cfg, res, batch):
    """Build (full_step, grads_only, loss_fwd, infer_fwd) compiled fns +
    their args, sharing one param set."""
    from deepl_project_tpu import TransVAE
    from deepl_project_tpu.losses.vae_loss import LossWeights, transvae_loss
    from deepl_project_tpu.models import init_params
    from deepl_project_tpu.training import (init_train_state, make_optimizer,
                                            make_train_step)

    model = TransVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = {"model": init_params(model, rng, image_size=res, batch=1)}
    tx = make_optimizer(learning_rate=1e-4, warmup_steps=100,
                        mu_dtype=os.environ.get("PROBE_MU_DTYPE"),
                        optimizer=os.environ.get("PROBE_OPTIMIZER", "adafactor"))
    state = init_train_state(params, tx)
    weights = LossWeights(l1=1.0, kl=1e-8)
    step = make_train_step(model, tx, weights=weights, donate=False)

    def loss_fwd(params, x, rng):
        recon, mu, logvar = model.apply({"params": params["model"]}, x,
                                        rngs={"sample": rng})
        return transvae_loss(recon, x, mu, logvar, weights)["total"]

    grads_only = jax.jit(lambda p, x, r: jax.tree_util.tree_reduce(
        lambda a, g: a + jnp.sum(jnp.abs(g).astype(jnp.float32)),
        jax.grad(loss_fwd)(p, x, r), 0.0))
    loss_only = jax.jit(loss_fwd)

    def infer(params, x):
        r, _, _ = model.apply({"params": params["model"]}, x, sample=False)
        return jnp.sum(r.astype(jnp.float32))

    infer_fwd = jax.jit(infer)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, res, res, 3),
                           jnp.float32)
    return state, x, rng, step, grads_only, loss_only, infer_fwd


def bench(fn, fetch, iters=8, reps=3):
    fetch(fn())  # warmup (compile happened in .lower/.compile or first call)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        fetch(out)  # readback fence
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def record(name, payload):
    os.makedirs("RESULTS", exist_ok=True)
    path = os.path.join("RESULTS", f"{name}.json")
    payload["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"recorded -> {path}")


def mode_decomp(res, batch):
    cfg = build_cfg()
    state, x, rng, step, grads_only, loss_only, infer_fwd = make_parts(
        cfg, res, batch)

    t_infer = bench(lambda: infer_fwd(state.params, x), float)
    print(f"inference fwd        {t_infer*1e3:8.1f} ms", flush=True)
    t_loss = bench(lambda: loss_only(state.params, x, rng), float)
    print(f"loss fwd (train fwd) {t_loss*1e3:8.1f} ms", flush=True)
    t_grad = bench(lambda: grads_only(state.params, x, rng), float)
    print(f"grads (fwd+bwd)      {t_grad*1e3:8.1f} ms", flush=True)
    t_step = bench(lambda: step(state, x, rng),
                   lambda o: float(o[1]["total"]))
    print(f"full train step      {t_step*1e3:8.1f} ms", flush=True)

    bwd = t_grad - t_loss
    opt = t_step - t_grad
    print(f"\nfwd {t_loss*1e3:.1f} ms | bwd(+remat recompute) {bwd*1e3:.1f} ms "
          f"(bwd:fwd {bwd/max(t_loss,1e-9):.2f}x) | "
          f"optimizer+clip tail {opt*1e3:.1f} ms")
    print(f"step {t_step*1e3:.1f} ms = {batch/t_step:.2f} img/s", flush=True)
    record(f"train_decomp_{os.environ.get('PROBE_VARIANT','large')}"
           f"_{res}b{batch}_{os.environ.get('PROBE_REMAT_POLICY','dots')}"
           f"{'' if env_flag('PROBE_REMAT', True) else '_noremat'}",
           {"res": res, "batch": batch,
            "config": {k: os.environ.get(k) for k in os.environ
                       if k.startswith("PROBE_")},
            "infer_ms": t_infer*1e3, "loss_fwd_ms": t_loss*1e3,
            "grads_ms": t_grad*1e3, "step_ms": t_step*1e3,
            "bwd_ms": bwd*1e3, "opt_ms": opt*1e3,
            "img_per_s": batch/t_step})


def mode_stages(res, batch):
    base_cfg = build_cfg()
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
        state, x, rng, step, *_ = make_parts(cfg, res, batch)
        dt = bench(lambda: step(state, x, rng),
                   lambda o: float(o[1]["total"]))
        results[name] = dt
        print(f"{name:18s} {dt*1e3:8.1f} ms", flush=True)

    base = results["baseline"]
    print("\n== marginal per-stage TRAIN cost (enc+dec, fwd+bwd+remat) ==")
    marginals = {}
    for name, dt in results.items():
        if name.startswith("stage"):
            i = int(name[5])
            marginals[f"stage{i}_ms"] = (base - dt) * 1e3
            print(f"stage{i} (depth {depths[i]}): {1e3*(base-dt):8.1f} ms "
                  f"({100*(base-dt)/base:4.1f}% of step)", flush=True)
    print(f"resample+stem+opt floor (all_depth0): "
          f"{1e3*results['all_depth0']:8.1f} ms "
          f"({100*results['all_depth0']/base:4.1f}%)")
    record(f"train_stages_{os.environ.get('PROBE_VARIANT','large')}"
           f"_{res}b{batch}",
           {"res": res, "batch": batch, "depths": list(depths),
            "step_ms": {k: v*1e3 for k, v in results.items()}, **marginals})


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "decomp"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    {"decomp": mode_decomp, "stages": mode_stages}[mode](res, batch)
