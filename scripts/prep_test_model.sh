#!/bin/bash
# Deployment chain (reference prep_test_model.sh:19-34). On TPU there is no
# format conversion: persist the codec projections into the embedding matrix
# and the resulting orbax params dir loads directly into the decode engine
# (the GGUF F16/q8_0/Q4_K_M steps are obviated; int8 decode weights are a
# runtime flag: RealtimeAgentResources(quantize_int8=True) / bench --int8).
set -e
CHECKPOINT=${1:?usage: prep_test_model.sh <run_dir>/params.orbax}
python persist_codec_embeddings.py --checkpoint "$CHECKPOINT"
echo "deployable params: ${CHECKPOINT%/}-vanilla"
