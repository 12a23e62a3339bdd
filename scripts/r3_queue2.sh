#!/bin/bash
# Round-3 phase 2: training-step profiling, DiT generation-FID trajectory,
# int8 serving load test. Same discipline as r3_queue.sh: strictly one jax
# process at a time, per-step timeout bounds, probes between steps.
#
# Usage: nohup bash scripts/r3_queue2.sh > runs/r3_queue2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p runs RESULTS /tmp/jax_cache

stamp() { date -u "+%Y-%m-%dT%H:%M:%S"; }
probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
print('probe ok', float((x @ x).astype(jnp.float32).sum()))" \
    || { echo "[$(stamp)] PROBE FAILED rc=$? — waiting 120s"; sleep 120; }
}
run() {
  local bound=$1 tag=$2; shift 2
  echo "[$(stamp)] START $tag"
  timeout "$bound" "$@"
  echo "[$(stamp)] END $tag rc=$?"
  probe
}

# ---- 1. Training-step attribution at the VERDICT target (large@256 b8) ----
PROBE_VARIANT=large PROBE_REMAT=1 PROBE_REMAT_POLICY=dots PROBE_SCAN=1 \
PROBE_ATTN=auto_train PROBE_OPTIMIZER=adamw \
run 3600 profile_train_decomp python scripts/profile_train.py decomp 256 8

PROBE_VARIANT=large PROBE_REMAT=1 PROBE_REMAT_POLICY=dots PROBE_SCAN=1 \
PROBE_ATTN=auto_train PROBE_OPTIMIZER=adamw \
run 5400 profile_train_stages python scripts/profile_train.py stages 256 8

# ---- 2. DiT-S generation-FID trajectory on the trained tiny@256 tokenizer --
run 7200 dit_fid python -m deepl_project_tpu.cli.train_dit \
    --dit_variant S --vae_variant tiny --vae_compression 16 \
    --vae_checkpoint runs/tiny256_vf01/checkpoints \
    --data shapes --resolution 256 --batch_size 64 \
    --total_steps 3000 --warmup_steps 200 --lr 2e-4 \
    --fid_every 500 --fid_samples 128 --save_every 3000 \
    --output_dir runs/dit_s_tiny256
python scripts/record_run.py --run_dir runs/dit_s_tiny256 \
    --name dit_s_tiny256_fid || true

# ---- 3. Int8 serving load test (large variant, resblock scope) -------------
serve_and_load() { # serve_and_load <tag> <extra server flags...>
  local tag=$1; shift
  echo "[$(stamp)] START serve_$tag"
  python -m deepl_project_tpu.cli.serve --variant large --port 8471 \
      --max_batch 8 --warmup_resolution 256 --warmup_ops reconstruct \
      --warmup_dtypes uint8 --warmup_uint8_inputs \
      --compile_cache_dir /tmp/jax_cache "$@" > runs/serve_$tag.log 2>&1 &
  local spid=$!
  echo $spid > /tmp/serve_$tag.pid
  # Wait for warmup (healthz up); bound at 20 min.
  for i in $(seq 1 120); do
    sleep 10
    if curl -s -m 5 http://127.0.0.1:8471/healthz > /dev/null 2>&1; then
      break
    fi
    if ! kill -0 $spid 2>/dev/null; then echo "server died"; break; fi
  done
  sleep 5
  timeout 300 python scripts/serve_load_test.py --clients 6 --batch 4 \
      --resolution 256 --seconds 40 --name serving_load_$tag
  kill $spid 2>/dev/null
  sleep 10
  kill -9 $spid 2>/dev/null
  echo "[$(stamp)] END serve_$tag"
  probe
}
serve_and_load int8_resblock --quantize int8 --quantize_scope resblock
serve_and_load bf16

echo "[$(stamp)] QUEUE2 DONE"
