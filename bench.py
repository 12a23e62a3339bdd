"""Headline benchmark: encode+decode images/sec/chip, TransVAE-L f16d32 @256px.

Matches BASELINE.json's metric ("encode+decode images/sec/chip at 256px (large
variant)"). The reference publishes no wall-clock throughput (SURVEY.md §6) —
the north star is ≥3x an A100-class chip. With no measurable A100 on hand, the
A100 estimate assumes an A100 sustains 40% MFU of 312 bf16 TFLOPs (a strong,
favourable-to-A100 assumption) over the REFERENCE architecture's analytic
FLOPs/image — pinned from the PyTorch reference via FlopCounterMode
(scripts/reference_flops.py; utils/flops.py), NOT this repo's compiled FLOPs,
so exact FLOP-reduction optimizations here don't move the target.
vs_baseline = measured / (3 x estimated A100 img/s).

vs_baseline_ceiling contextualizes that ratio: it is what a v5e would score at
100% MFU on THIS implementation's compiled FLOPs — i.e. the hardware ceiling
of the metric on one v5e chip. A single 197-TF/s v5e cannot reach 3x a
124.8-TF/s-effective A100 on a compute-bound model; the ceiling (~0.6) is the
"speed of light" the measured vs_baseline should be read against.

Extra fields on the same single JSON line (BENCH_QUANT=0 to skip):
int8_resblock_* — the measured int8 PTQ serving lever (scope=resblock,
+~7% at the headline shape with −0.04 dB PSNR; PERFORMANCE.md "Int8 PTQ").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: repeat bench runs skip the multi-minute XLA compile.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Swept 8/16/32/64 on v5e: 26.6/32.8/40.8/42.2 img/s pre-optimization; with
# the Pallas mid-band dispatch + fused resample paths, 64 regressed to 44.65
# vs 46.35 at 32; re-swept after the round-2 fused sublayer/FFN-fold/convT
# work: 51.0 at 64 vs 51.9 at 32 — 32 stays optimal. BENCH_BATCH overrides.
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
RES = int(os.environ.get("BENCH_RES", "256"))
VARIANT = "large"
# Param dtype for the headline model. fp32 params are the training layout;
# bf16 halves param HBM traffic for the weight-streaming stages (the profile
# audit measured 51% HBM utilization). BENCH_PARAM_DTYPE overrides for A/B.
PARAM_DTYPE = os.environ.get("BENCH_PARAM_DTYPE", "float32")
RUN_QUANT = os.environ.get("BENCH_QUANT", "1") != "0"
A100_BF16_PEAK_TFLOPS = 312.0
A100_ASSUMED_MFU = 0.40
V5E_BF16_PEAK_TFLOPS = 197.0  # per chip


def _time_compiled(compiled, params, x, iters=15, windows=3):
    # NOTE: block_until_ready does not truly synchronize through the axon
    # tunnel — a host fetch is the only reliable fence, so timing ends with a
    # scalar readback and uses enough iterations to amortize the ~25ms RTT.
    fetch = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    float(fetch(compiled(params, x)))  # warmup
    best = float("inf")
    for _ in range(windows):  # best-of-N windows: tunnel timing is noisy
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(params, x)
        float(fetch(out))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def _bench_model(model, params, x):
    @jax.jit
    def encode_decode(params, x):
        recon, mu, logvar = model.apply({"params": params}, x, sample=False)
        return recon

    compiled = encode_decode.lower(params, x).compile()
    cost = compiled.cost_analysis()
    flops_total = float(cost.get("flops", 0.0)) if cost else 0.0
    dt = _time_compiled(compiled, params, x)
    return BATCH / dt, dt, flops_total / BATCH


def main():
    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.models import init_params

    cfg = get_config(VARIANT, 16, 32)
    if PARAM_DTYPE != "float32":
        cfg = cfg.replace(param_dtype=PARAM_DTYPE)
    model = TransVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = init_params(model, rng, image_size=RES, batch=1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, RES, RES, 3),
                           jnp.bfloat16)

    images_per_sec, dt, flops_per_image = _bench_model(model, params, x)

    from deepl_project_tpu.utils.flops import reference_flops_per_image

    ref_flops_per_image = reference_flops_per_image(VARIANT, 16, 32, RES)

    a100_img_s = (A100_BF16_PEAK_TFLOPS * 1e12 * A100_ASSUMED_MFU /
                  ref_flops_per_image)
    vs_baseline = images_per_sec / (3.0 * a100_img_s)
    # Hardware ceiling of this metric on one v5e: 100% MFU over the compiled
    # FLOPs this implementation actually executes per image.
    v5e_peak_img_s = (V5E_BF16_PEAK_TFLOPS * 1e12 / flops_per_image
                      if flops_per_image else 0.0)
    vs_baseline_ceiling = (v5e_peak_img_s / (3.0 * a100_img_s)
                           if flops_per_image else None)
    mfu = (images_per_sec * flops_per_image /
           (V5E_BF16_PEAK_TFLOPS * 1e12) if flops_per_image else None)

    record = {
        "metric": f"encode+decode images/sec/chip, TransVAE-{VARIANT} "
                  f"f16d32 @{RES}px bf16 batch {BATCH}",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 4),
        "vs_baseline_ceiling": round(vs_baseline_ceiling, 4),
        "mfu": round(mfu, 4),
        "step_ms": round(1e3 * dt, 2),
        "param_dtype": PARAM_DTYPE,
        "tflops_per_image": round(flops_per_image / 1e12, 4),
        "ref_tflops_per_image": round(ref_flops_per_image / 1e12, 4),
        "est_a100_images_per_sec_at_40pct_mfu": round(a100_img_s, 2),
        "device": str(jax.devices()[0]),
    }

    if RUN_QUANT:
        # The int8 PTQ serving lever, same shape/protocol (scope=resblock:
        # the measured winner at the compute-bound headline shape).
        try:
            from deepl_project_tpu.quantize import quantize_model

            calib = [x[:8].astype(jnp.float32)]
            qmodel, qparams = quantize_model(cfg, params, calib,
                                             scope="resblock")
            q_img_s, q_dt, _ = _bench_model(qmodel, qparams, x)
            record["int8_resblock_images_per_sec"] = round(q_img_s, 2)
            record["int8_resblock_vs_baseline"] = round(
                q_img_s / (3.0 * a100_img_s), 4)
            record["int8_resblock_delta_pct"] = round(
                100.0 * (q_img_s / images_per_sec - 1.0), 1)
            # r5: int8 scope=resblock IS the single-chip serving default
            # (cli/serve.py resolve_quantize; −0.04 dB measured) — surface it
            # as such, not only as a side-lever.
            record["serving_default"] = "int8 scope=resblock (-0.04 dB)"
            record["serving_default_images_per_sec"] = round(q_img_s, 2)
            record["serving_default_vs_baseline"] = round(
                q_img_s / (3.0 * a100_img_s), 4)
        except Exception as e:  # never let the lever break the headline
            record["int8_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(record))


if __name__ == "__main__":
    main()
