#!/bin/bash
# Codes + transcripts -> LM text dataset + metadata + splits
# (reference prep_lm_dataset_magicodec.sh + tools/split_lm_dataset.py).
set -e
python prep_lm_dataset.py \
    --codes_path data/audio/codes/rtca-tpu-codec/0.1s_2.0s/mono \
    --transcripts_path data/transcripts \
    --unicode_offset 0xE000 \
    --save_path output/lm_dataset.txt "$@"
python tools/split_lm_dataset.py --dataset_path output/lm_dataset.txt
