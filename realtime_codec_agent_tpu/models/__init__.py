from .codec import CodecConfig, JaxCodecModel, tiny_codec_config
from .llama import (
    DuplexLMConfig,
    init_lm_params,
    llama32_1b_config,
    qwen25_config,
    tiny_lm_config,
    forward,
    logits_from_hidden,
    set_codec_embeddings,
    persist_codec_embeddings,
)
