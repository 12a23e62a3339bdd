"""Full-variant converted-checkpoint rehearsal (round-2 verdict item 6).

The torch->JAX converter was parity-tested on small goldens only; a real
release converts a full-size checkpoint. This script exercises the whole
release chain on the full tiny_f16d32 (44M params):

  1. Build the REFERENCE TransVAE tiny in torch (random weights, full
     architecture, ref: transvae/models/transvae.py:107-153), save a real
     ``.pt`` in the reference checkpoint layout
     {epoch, global_step, model_state_dict, args} (ref: train.py:753-769).
  2. Compute torch goldens: encode @256 AND @512 (extrapolation through
     converted weights, rope_pairing='reference'), decode of a fixed z.
  3. Convert via utils.convert.load_reference_checkpoint, run the JAX model
     (float32, norm_latents=False = exact reference structure), assert
     mu/logvar/recon parity at both resolutions.
  4. Save the converted params as an orbax checkpoint dir (+config.json) and
     run cli.evaluate end-to-end from it (the "switch to this framework"
     user path, ref from_pretrained: transvae.py:248-267).

Writes RESULTS/convert_rehearsal.json. Exit code 0 = whole chain green.

Usage: PYTHONPATH=/root/repo python scripts/convert_rehearsal.py
       [--workdir /tmp/convert_rehearsal] [--skip_eval]
CPU-only by design (torch has no TPU here; JAX side forced to CPU so both
run fp32 on the same host) — expect several minutes of XLA compiles.
"""

import argparse
import importlib.util
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

REF_PATH = "/root/reference/transvae-implementation"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_reference_package():
    """Import the reference package under an alias (golden-producing only —
    nothing is copied); stub its lpips dependency first."""
    import types

    if "lpips" not in sys.modules:
        lpips_stub = types.ModuleType("lpips")
        lpips_stub.LPIPS = None
        sys.modules["lpips"] = lpips_stub
    pkg_dir = os.path.join(REF_PATH, "transvae")
    spec = importlib.util.spec_from_file_location(
        "ref_transvae", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    module = importlib.util.module_from_spec(spec)
    sys.modules["ref_transvae"] = module
    spec.loader.exec_module(module)
    return module


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/convert_rehearsal")
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--res_hi", type=int, default=512)
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    report = {"variant": "tiny_f16d32", "res": [256, args.res_hi]}

    # ---- Phase 1: reference model in torch, save .pt ----
    import numpy as np
    import torch

    load_reference_package()
    from ref_transvae.models.transvae import TransVAE as RefTransVAE

    torch.manual_seed(0)
    t0 = time.time()
    ref = RefTransVAE({"depths": [3, 3, 3, 3, 3],
                       "base_dims": [128, 128, 256, 256, 512],
                       "mlp_ratio": 1.0, "head_dim": 64},
                      variant="tiny", compression_ratio=16,
                      latent_dim=32).eval()
    n_params = sum(t.numel() for t in ref.state_dict().values())
    print(f"[torch] reference tiny built: {n_params/1e6:.1f}M tensors "
          f"({time.time()-t0:.1f}s)", flush=True)
    report["ref_params_m"] = n_params / 1e6

    pt_path = os.path.join(args.workdir, "transvae_tiny_f16d32.pt")
    torch.save({"epoch": 0, "global_step": 0,
                "model_state_dict": ref.state_dict(),
                "args": {"variant": "tiny", "compression_ratio": 16,
                         "latent_dim": 32}}, pt_path)
    print(f"[torch] saved reference-layout checkpoint: {pt_path} "
          f"({os.path.getsize(pt_path)/1e6:.0f} MB)", flush=True)

    # ---- Phase 2: torch goldens at 256 and res_hi ----
    goldens = {}
    rs = np.random.RandomState(7)
    with torch.no_grad():
        for res in (256, args.res_hi):
            x = rs.rand(1, res, res, 3).astype(np.float32)
            t0 = time.time()
            mu, logvar = ref.encode(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
            goldens[res] = {
                "x": x,
                "mu": np.transpose(mu.numpy(), (0, 2, 3, 1)),
                "logvar": np.transpose(logvar.numpy(), (0, 2, 3, 1))}
            print(f"[torch] encode @{res}: mu {tuple(mu.shape)} "
                  f"({time.time()-t0:.1f}s)", flush=True)
        z = rs.randn(1, 16, 16, 32).astype(np.float32)
        t0 = time.time()
        recon = ref.decode(torch.from_numpy(np.transpose(z, (0, 3, 1, 2))))
        golden_recon = np.transpose(recon.numpy(), (0, 2, 3, 1))
        print(f"[torch] decode z16: recon {tuple(recon.shape)} "
              f"({time.time()-t0:.1f}s)", flush=True)
    del ref

    # ---- Phase 3: convert + JAX parity at both resolutions ----
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.utils.convert import load_reference_checkpoint

    cfg = get_config("tiny_f16d32", dtype="float32",
                     attention_impl="xla").replace(norm_latents=False)
    assert cfg.rope_pairing == "reference"
    t0 = time.time()
    params = load_reference_checkpoint(pt_path, cfg)
    print(f"[convert] .pt -> flax params in {time.time()-t0:.1f}s", flush=True)
    model = TransVAE(cfg)

    for res in (256, args.res_hi):
        g = goldens[res]
        t0 = time.time()
        mu_j, logvar_j = model.apply({"params": params},
                                     jnp.asarray(g["x"]), method="encode")
        mu_err = float(np.max(np.abs(np.asarray(mu_j) - g["mu"])))
        lv_err = float(np.max(np.abs(np.asarray(logvar_j) - g["logvar"])))
        print(f"[parity] encode @{res}: max|mu| err {mu_err:.2e}, "
              f"max|logvar| err {lv_err:.2e} ({time.time()-t0:.1f}s)",
              flush=True)
        report[f"mu_err_{res}"] = mu_err
        report[f"logvar_err_{res}"] = lv_err
        scale = float(np.max(np.abs(g["mu"])))
        assert mu_err <= 2e-3 * max(1.0, scale), (res, mu_err, scale)
        assert lv_err <= 2e-3 * max(1.0, float(np.max(np.abs(g["logvar"]))))

    t0 = time.time()
    recon_j = model.apply({"params": params}, jnp.asarray(z), method="decode")
    rec_err = float(np.max(np.abs(np.asarray(recon_j) - golden_recon)))
    print(f"[parity] decode: max err {rec_err:.2e} ({time.time()-t0:.1f}s)",
          flush=True)
    report["recon_err"] = rec_err
    assert rec_err <= 2e-3 * max(1.0, float(np.max(np.abs(golden_recon))))

    # ---- Phase 4: orbax checkpoint + cli.evaluate from it ----
    from deepl_project_tpu.training import (init_train_state, make_optimizer)
    from deepl_project_tpu.training.checkpoint import save_checkpoint

    ckpt_dir = os.path.join(args.workdir, "converted_ckpt")
    tx = make_optimizer(learning_rate=1e-4, warmup_steps=0)
    state = init_train_state({"model": params}, tx)
    save_checkpoint(ckpt_dir, step=0, state=state, epoch=0, config=cfg)
    print(f"[ckpt] converted checkpoint saved -> {ckpt_dir}", flush=True)

    if not args.skip_eval:
        from deepl_project_tpu.cli.evaluate import main as eval_main

        out_dir = os.path.join(args.workdir, "eval_out")
        eval_main(["--checkpoint", ckpt_dir, "--data", "shapes",
                   "--resolution", "256", "--batch_size", "2",
                   "--num_batches", "2", "--output_dir", out_dir])
        with open(os.path.join(out_dir, "metrics.json")) as f:
            metrics = json.load(f)
        report["eval_psnr_mean"] = metrics.get("psnr", {}).get("mean")
        print(f"[eval] cli.evaluate from converted ckpt: "
              f"PSNR {report['eval_psnr_mean']}", flush=True)

    os.makedirs(os.path.join(REPO, "RESULTS"), exist_ok=True)
    report["ok"] = True
    report["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(os.path.join(REPO, "RESULTS", "convert_rehearsal.json"),
              "w") as f:
        json.dump(report, f, indent=1)
    print("REHEARSAL OK:", json.dumps(report))


if __name__ == "__main__":
    main()
