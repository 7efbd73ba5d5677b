#!/usr/bin/env bash
# Flagship v2: compositional-generalization corpus + latent-decay fix
# (VERDICT r3 #2/#3/#4).
#
# Deltas vs run_flagship_learnable.sh (round 3):
#   - corpus built with --holdout-frac 0.15: val draws ONLY (attribute x
#     category) combos never seen in training, so val BLEU measures
#     compositional generalization and is un-saturated (round-3 corpus
#     showed every combo in training; BLEU-4 97 hit its ceiling).
#   - 3,000 latent-phase steps (was 2,000) to give the decay room to show.
#   - --kl_floor: free-bits floor on the total KL — the round-4 fix for
#     the latent-phase decay (benchmarks/latent_decay.md).
#   - --latent_diagnostics: per-val z stats + prior/posterior decode BLEU
#     gap land in the metrics JSONL (zdiag_ prefix).
#
# Usage: bash benchmarks/run_flagship_v2.sh [ROOT] [OUT]
set -euo pipefail
ROOT="${1:-/root/data_flagship_v2}"
OUT="${2:-/root/runs/flagship_v2}"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache

timeout 14400 python -m blt_vqg_tpu.cli.train_iq \
  --dataset "$ROOT/packed_train" --val_dataset "$ROOT/packed_val" \
  --vocab "$ROOT/vocab_iq.json" --cat2name "$ROOT/cat2name.json" \
  --emb_dim 300 --hidden_dim 1024 --latent_dim 1024 --pwffn_dim 2048 \
  --num_layers 6 --num_heads 8 --batch_size 64 --input_mode cat \
  --num_pretraining_steps 6000 --total_training_steps 9000 \
  --full_kl_step 1000 --kl_floor 6.0 \
  --val_check_interval 500 --limit_val_batches 20 \
  --latent_diagnostics \
  --checkpoint_every 3000 --steps_per_dispatch 10 \
  --output_dir "$OUT" --no_checkpoint_at_end \
  2>&1 | tee "$OUT.log"

echo "=== val BLEU trail ==="
grep -E "Bleu_4|validation @" "$OUT.log" | paste - - | tail -20
