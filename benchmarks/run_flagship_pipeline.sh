#!/usr/bin/env bash
# Flagship-scale end-to-end training through the REAL input pipeline
# (VERDICT round-2 item 2): run.sh "big" config on the packed 110k-QA /
# 224px-uint8 synthetic dataset (benchmarks/make_flagship_dataset.py),
# ≥2k steps on the chip, with a mid-run SIGTERM checkpoint + resume.
#
# Usage: bash benchmarks/run_flagship_pipeline.sh [ROOT] [OUT]
set -euo pipefail
ROOT="${1:-/root/data_flagship}"
OUT="${2:-/root/runs/flagship_pipeline}"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache

COMMON=(
  --dataset "$ROOT/packed_train" --val_dataset "$ROOT/packed_val"
  --vocab "$ROOT/vocab_iq.json" --cat2name "$ROOT/cat2name.json"
  --emb_dim 300 --hidden_dim 1024 --latent_dim 1024 --pwffn_dim 2048
  --num_layers 6 --num_heads 8 --batch_size 64 --input_mode cat
  --num_pretraining_steps 600 --full_kl_step 1000
  --val_check_interval 500 --limit_val_batches 20
  --checkpoint_every 1000 --steps_per_dispatch 10
  --output_dir "$OUT" --no_checkpoint_at_end
)

echo "=== phase A: 1200 steps, then SIGTERM (graceful checkpoint) ==="
timeout -s TERM 2700 python -m blt_vqg_tpu.cli.train_iq "${COMMON[@]}" \
  --total_training_steps 1200 2>&1 | tee "$OUT.phaseA.log" || true

echo "=== phase B: resume to 2200 steps ==="
timeout 2700 python -m blt_vqg_tpu.cli.train_iq "${COMMON[@]}" \
  --total_training_steps 2200 --resume 2>&1 | tee "$OUT.phaseB.log"

echo "=== samples/s trail ==="
grep -o "([0-9.]* samples/s)" "$OUT.phaseA.log" "$OUT.phaseB.log" | tail -20
