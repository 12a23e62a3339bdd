"""Serving CLI: batched TransVAE inference over HTTP (npy payloads).

Beyond the reference (which ships only scripts): a production entry point for
the deployment/serving use the rebuild targets. See deepl_project_tpu/serving.py
for the batching/compile-cache design.

Usage:
  python -m deepl_project_tpu.cli.serve --checkpoint out/vae --port 8471
  python -m deepl_project_tpu.cli.serve --variant tiny            # random init

  curl -s localhost:8471/healthz
  python - <<'PY'
  import io, urllib.request, numpy as np
  x = np.random.rand(2, 256, 256, 3).astype(np.float32)
  buf = io.BytesIO(); np.save(buf, x)
  r = urllib.request.urlopen("http://localhost:8471/reconstruct",
                             data=buf.getvalue())
  print(np.load(io.BytesIO(r.read())).shape)
  PY
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve TransVAE inference")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (config + params); omit for random "
                        "init of --variant (testing)")
    p.add_argument("--variant", default="tiny")
    p.add_argument("--compression_ratio", type=int, default=16)
    p.add_argument("--latent_dim", type=int, default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--batch_window_ms", type=float, default=3.0)
    p.add_argument("--warmup_resolution", type=int, default=0,
                   help="if set, pre-compile encode/decode/reconstruct at "
                        "this resolution before accepting traffic")
    p.add_argument("--warmup_ops", default="encode,decode,reconstruct",
                   help="comma-separated ops to pre-compile across the full "
                        "batch-bucket ladder at --warmup_resolution")
    p.add_argument("--warmup_dtypes", default="float32",
                   help="comma-separated response encodings to pre-compile "
                        "(float32, float16, uint8)")
    p.add_argument("--warmup_uint8_inputs", action="store_true",
                   help="pre-compile for uint8 request payloads (the natural "
                        "decoded-image dtype; quarters the upload bytes)")
    p.add_argument("--tls_cert", default=None,
                   help="PEM certificate path; with --tls_key, serve HTTPS "
                        "(TLS 1.2+).")
    p.add_argument("--tls_key", default=None,
                   help="PEM private-key path for --tls_cert.")
    p.add_argument("--compile_cache_dir", default=None,
                   help="Persistent XLA compile cache directory. A restarted "
                        "server skips the multi-minute warmup compiles "
                        "(bucket ladder hits the cache), so deploys restart "
                        "warm.")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX platform (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this sets it programmatically)")
    p.add_argument("--auth_token", default=None,
                   help="require 'Authorization: Bearer <token>' on POSTs "
                        "(/healthz stays open); also read from "
                        "DEEPL_SERVE_TOKEN")
    p.add_argument("--max_request_mb", type=int, default=64,
                   help="reject request bodies larger than this (HTTP 413)")
    p.add_argument("--max_queue", type=int, default=256,
                   help="bounded request queue; excess requests get HTTP 503")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="multi-chip serving: tensor-parallel axis size; the "
                        "remaining devices form a data axis that fans "
                        "batches out (1 = single device)")
    p.add_argument("--mesh_sharding", default="tensor",
                   choices=["tensor", "fsdp", "replicate"],
                   help="param placement on the serving mesh")
    p.add_argument("--quantize", default=None, choices=["int8", "none"],
                   help="post-training quantization of the serving path. "
                        "Unset = AUTO: single-chip serving defaults to int8 "
                        "scope=resblock (+7.4%% throughput at batch 32 for a "
                        "measured -0.04 dB PSNR; PERFORMANCE.md 'Int8 PTQ "
                        "serving path'); multi-chip (--mesh_model > 1) "
                        "defaults to 'none' so params stay tensor-parallel "
                        "bf16. 'none' always serves pure bf16. Calibrated on "
                        "synthetic batches at --warmup_resolution or 256px")
    p.add_argument("--quantize_scope", default="resblock",
                   choices=["all", "resblock", "ffn"],
                   help="module families int8 covers; 'resblock' (default) "
                        "wins in the batched compute-bound regime, 'all' in "
                        "the weight-HBM-bound small-batch / big-variant "
                        "regime (PERFORMANCE.md 'Int8 PTQ serving path')")
    p.add_argument("--param_dtype", default=None, choices=["bfloat16"],
                   help="serve with bf16 params — required to fit the huge "
                        "(2.49B) / giant (4.84B) variants in one 16 GB chip "
                        "(measured 16.07 / 8.02 img/s @256; PERFORMANCE.md)")
    return p


def resolve_quantize(quantize: str | None, mesh_model: int) -> str:
    """The serving default (r5): int8 scope=resblock on a single chip
    (+7.4% at b32 for -0.04 dB, PERFORMANCE.md 'Int8 PTQ serving path');
    pure bf16 on a multi-chip mesh so params stay tensor-parallel."""
    if quantize is None:
        return "int8" if mesh_model == 1 else "none"
    return quantize


def main(argv=None):
    args = build_parser().parse_args(argv)
    # Fail fast (before checkpoint load + multi-minute warmup compiles).
    if bool(args.tls_cert) != bool(args.tls_key):
        raise SystemExit("--tls_cert and --tls_key must be given together")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache_dir:
        import os

        os.makedirs(args.compile_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.compile_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from ..config import get_config
    from ..models import TransVAE, init_params
    from ..serving import InferenceEngine, make_http_server

    if args.checkpoint:
        from ..training.checkpoint import load_config, restore_model_params

        cfg = load_config(args.checkpoint)
        if args.param_dtype:
            cfg = cfg.replace(param_dtype=args.param_dtype)
        model = TransVAE(cfg)
        params = restore_model_params(args.checkpoint)
        if args.param_dtype:
            import jax.numpy as jnp
            import numpy as _np

            target = jnp.dtype(args.param_dtype)
            params = jax.tree_util.tree_map(
                lambda a: a.astype(target)
                if _np.issubdtype(_np.asarray(a).dtype, _np.floating) else a,
                params)
    else:
        cfg = get_config(args.variant, args.compression_ratio, args.latent_dim)
        if args.param_dtype:
            cfg = cfg.replace(param_dtype=args.param_dtype)
        model = TransVAE(cfg)
        params = init_params(model, jax.random.PRNGKey(0), image_size=64)
        print("[serve] WARNING: no --checkpoint; serving random weights")

    if args.quantize is None:  # AUTO: int8-resblock single-chip, bf16 on mesh
        args.quantize = resolve_quantize(args.quantize, args.mesh_model)
        print(f"[serve] quantize=auto -> {args.quantize}"
              + (" scope=" + args.quantize_scope
                 if args.quantize == "int8" else " (multi-chip mesh)"))
    if args.quantize == "none":
        args.quantize = None
    if args.quantize == "int8":
        from ..data.datasets import synthetic_shapes_dataset
        from ..quantize import quantize_model

        res = args.warmup_resolution or 256
        imgs = list(synthetic_shapes_dataset(res, num_samples=8, seed=0))
        batches = [np.stack(imgs[j:j + 4]) for j in (0, 4)]
        model, params = quantize_model(cfg, params, batches,
                                       scope=args.quantize_scope)
        print(f"[serve] int8-quantized scope={args.quantize_scope} "
              f"(calibrated on synthetic batches at {res}px)")

    mesh = None
    if args.mesh_model > 1:
        if args.quantize:
            # int8 param trees don't follow the TransVAE path rules the
            # tensor/fsdp shardings key on; replicate them instead.
            args.mesh_sharding = "replicate"
        from ..parallel.mesh import create_mesh

        mesh = create_mesh(model=args.mesh_model)
        print(f"[serve] multi-chip mesh "
              f"{dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"params={args.mesh_sharding}")
    engine = InferenceEngine(model, params, max_batch=args.max_batch,
                             batch_window_ms=args.batch_window_ms,
                             max_queue=args.max_queue, mesh=mesh,
                             param_sharding=args.mesh_sharding)
    if args.warmup_resolution:
        ops = tuple(o for o in args.warmup_ops.split(",") if o)
        dts = tuple(None if d in ("float32", "") else d
                    for d in args.warmup_dtypes.split(","))
        engine.warmup(args.warmup_resolution, ops=ops, dtypes=dts,
                      uint8_inputs=args.warmup_uint8_inputs)
        print(f"[serve] warmed up {ops} at {args.warmup_resolution}px "
              f"across batch buckets up to {args.max_batch}")
    engine.start()
    import os

    token = args.auth_token or os.environ.get("DEEPL_SERVE_TOKEN") or None
    server = make_http_server(engine, args.host, args.port, auth_token=token,
                              max_request_bytes=args.max_request_mb << 20,
                              tls_cert=args.tls_cert, tls_key=args.tls_key)
    scheme = "https" if args.tls_cert else "http"
    print(f"[serve] {cfg.variant} on {scheme}://{args.host}:{args.port} "
          f"(device {jax.devices()[0]}, "
          f"auth {'on' if token else 'off'})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
