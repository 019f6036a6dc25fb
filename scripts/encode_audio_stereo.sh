#!/bin/bash
# Batched corpus encode, mono downmix + per-channel stereo outputs
# (reference encode_audio_stereo.sh; the 4-GPU corpus sharding of
# encode_audio_gpu_{1..4}.sh is unnecessary — one XLA job batches the
# sliding windows onto the accelerator).
python encode_audio.py \
    --audio_path data/audio/raw \
    --output_path data/audio/codes/rtca-tpu-codec/0.1s_2.0s/stereo \
    --codec_checkpoint "${CODEC_CHECKPOINT:?set CODEC_CHECKPOINT}" \
    --chunk_secs 0.1 --context_secs 2.0 --batch_size 256 \
    --stereo "$@"
