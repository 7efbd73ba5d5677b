#!/usr/bin/env bash
# Flagship-scale LEARNABLE-data training through the REAL input pipeline.
#
# Companion to run_flagship_pipeline.sh (which proved throughput on
# random-token data): this run proves the framework LEARNS a real
# multimodal mapping at reference scale.  Dataset from
# `make_flagship_dataset.py --learnable`: every question is a
# deterministic 6-word template of (background color, square color,
# answer category) — exactly the inputs the model observes under
# input_mode=cat — so a correct model drives BLEU up on held-out val
# images (fresh nuisance noise, same attribute scheme).
#
# Config = run.sh "big" flag-for-flag (reference run.sh:1-10): hidden/
# latent 1024, pwffn 2048, 6L, 8H, batch 64, 6k pretraining steps, cat
# input; then 2k latent-phase steps (full_kl_step 1000).
#
# Usage: bash benchmarks/run_flagship_learnable.sh [ROOT] [OUT]
set -euo pipefail
ROOT="${1:-/root/data_flagship_learn}"
OUT="${2:-/root/runs/flagship_learnable}"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache

timeout 10800 python -m blt_vqg_tpu.cli.train_iq \
  --dataset "$ROOT/packed_train" --val_dataset "$ROOT/packed_val" \
  --vocab "$ROOT/vocab_iq.json" --cat2name "$ROOT/cat2name.json" \
  --emb_dim 300 --hidden_dim 1024 --latent_dim 1024 --pwffn_dim 2048 \
  --num_layers 6 --num_heads 8 --batch_size 64 --input_mode cat \
  --num_pretraining_steps 6000 --total_training_steps 8000 \
  --full_kl_step 1000 \
  --val_check_interval 500 --limit_val_batches 20 \
  --checkpoint_every 2000 --steps_per_dispatch 10 \
  --output_dir "$OUT" --no_checkpoint_at_end \
  2>&1 | tee "$OUT.log"

echo "=== val BLEU trail ==="
grep -E "Bleu_4|Bleu_1|validation @" "$OUT.log" | tail -60
