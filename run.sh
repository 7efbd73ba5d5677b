#!/usr/bin/env bash
# Canonical "big" training config (reference run.sh:1-10 flag-for-flag):
# hidden/latent 1024, pwffn 2048, 6 layers, 8 heads, batch 64, 6k pretrain
# steps, category-conditioned input.
python -m blt_vqg_tpu.cli.train_iq \
    --emb_dim 300 \
    --hidden_dim 1024 \
    --latent_dim 1024 \
    --pwffn_dim 2048 \
    --num_layers 6 \
    --num_heads 8 \
    --batch_size 64 \
    --num_pretraining_steps 6000 \
    --input_mode cat \
    --print_note "from fresh. normal posterior attachment. img recon loss. z into decoder outputs" \
    "$@"
