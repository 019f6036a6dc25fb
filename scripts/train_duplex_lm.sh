#!/bin/bash
# SPMD training run (reference train_vanilla_latest.py invocation).
python train_duplex_lm.py \
    --dataset output/lm_dataset_train.txt \
    --output_dir output/duplex-lm-run1 \
    --codec_embed_file output/codec_embed.npy \
    --batch_size 8 --max_seq_len 2048 --max_steps 20000 \
    --persist_embeddings "$@"
