"""Model/tokenizer resource bundle for the realtime agent.

Rebuild of the reference resource loader (realtime_agent_resources.py:9-49),
with two structural TPU wins:

- **No aux model instance.** The reference loads llama.cpp TWICE (main +
  ``logits_all=True`` aux for teacher-forced scoring, :19-33). Our engine
  scores with a separate cacheless jitted program over the SAME weights, so
  ``aux_llm`` is just an alias — half the HBM.
- **Self-play shares weights.** ``clone_for_self_play`` (:41-49) creates a new
  engine (its own KV cache + sampler state) over the same device-resident
  param pytree; a second agent costs only its KV cache.

Weights come from a checkpoint directory (orbax, written by our trainer) or
random initialization (benchmarks/tests; performance is weight-independent).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from ..audio_tokenizer import AudioTokenizer
from ..lm.engine import DuplexLMEngine
from ..models.codec import CodecConfig, JaxCodecModel, tiny_codec_config
from ..models.llama import (
    DuplexLMConfig,
    init_lm_params,
    llama32_1b_config,
    tiny_lm_config,
)
from ..tokenization import CodecTextTokenizer
from .asr import load_asr


class RealtimeAgentResources:
    def __init__(
        self,
        llm_model_path: Optional[str] = None,
        # Default sized to the agent's context POLICY, not llama.cpp headroom:
        # 80 s max audio (8,000 stereo tokens) + header + generous inline-text
        # budget + the incremental-rebuild window fits well under 12k, and the
        # agent's occupancy-triggered emergency trim guarantees no overflow
        # even in text-heavy sessions. The per-frame decode attention streams
        # the WHOLE static cache, so rightsizing it (12288+2048 slack vs the
        # reference's 16384+2048, realtime_agent_resources.py:13) cuts that
        # read ~22% for identical tokens. Pass 16384 for reference-exact
        # headroom (the serving server does).
        llm_n_ctx: int = 12288,
        codec_model=None,
        codec_config: Optional[CodecConfig] = None,
        lm_config: Optional[DuplexLMConfig] = None,
        whisper_model: Optional[object] = "small.en",
        tokenizer: Optional[CodecTextTokenizer] = None,
        tiny: bool = False,
        seed: int = 0,
        quantize_int8: bool = False,
        quantize_int4: bool = False,
        _shared_lm_params=None,
    ):
        # every entrypoint that builds resources gets the persistent compile
        # cache (idempotent config update): a cold single-process client
        # otherwise recompiles the full program set on every launch
        from ..utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
        if quantize_int8 and quantize_int4:
            raise ValueError("quantize_int8 and quantize_int4 are exclusive")
        self.quantize_int8 = quantize_int8
        self.quantize_int4 = quantize_int4
        self.llm_model_path = llm_model_path
        self.llm_model_dir = os.path.dirname(llm_model_path) if llm_model_path else None
        self.llm_n_ctx = llm_n_ctx
        self.tiny = tiny
        self.seed = seed

        # codec + streaming tokenizer
        if isinstance(codec_model, JaxCodecModel):
            pass
        elif isinstance(codec_model, str):
            codec_model = JaxCodecModel.load(codec_model, config=codec_config)
        elif codec_model is None:
            codec_config = codec_config or (tiny_codec_config() if tiny else CodecConfig())
            codec_model = JaxCodecModel.random_init(codec_config, seed=seed)
        self.audio_tokenizer = AudioTokenizer(codec_model=codec_model)

        # text+codec tokenizer
        if tokenizer is not None:
            self.tokenizer = tokenizer
        elif self.llm_model_dir and os.path.exists(
            os.path.join(self.llm_model_dir, "codec_tokenizer.json")
        ):
            self.tokenizer = CodecTextTokenizer.load(self.llm_model_dir)
        else:
            self.tokenizer = CodecTextTokenizer(
                codebook_size=self.audio_tokenizer.codebook_size
            )

        # duplex LM engine
        self.lm_config = lm_config or self._default_lm_config()
        if _shared_lm_params is not None:
            lm_params = _shared_lm_params
        elif llm_model_path:
            if not os.path.exists(llm_model_path):
                raise FileNotFoundError(f"LM checkpoint not found: {llm_model_path}")
            lm_params = self._load_checkpoint(llm_model_path)
        else:
            lm_params = init_lm_params(jax.random.PRNGKey(seed), self.lm_config)
        if _shared_lm_params is None:
            from ..models.llama import (
                fuse_lm_params_for_decode,
                quantize_params_int4,
                quantize_params_int8,
            )

            if quantize_int8:
                # int8 decode weights: the TPU counterpart of the reference's
                # q8_0 GGUF deployment artifact (prep_test_model.sh:27-31)
                lm_params = jax.jit(quantize_params_int8)(lm_params)
            elif quantize_int4:
                # int4 decode weights (Q4_K_M counterpart): native GGUF Q4_K
                # leaves pass through bit-exact; dense leaves (safetensors /
                # orbax / the artifact's Q6_K tensors) quantize to affine
                # int4 groups here
                lm_params = jax.jit(quantize_params_int4)(lm_params)
            # fuse QKV and gate|up once at load: 4 matmuls per decode layer
            # instead of 7 (skinny decode GEMVs are per-op-overhead-bound).
            # RTCA_FUSE_QKV=0 keeps the canonical layout (A/B benchmarking)
            if os.environ.get("RTCA_FUSE_QKV", "1") != "0":
                lm_params = jax.jit(fuse_lm_params_for_decode)(lm_params)
        self.lm_params = lm_params
        self.llm = DuplexLMEngine(lm_params, self.lm_config)
        # teacher-forced scoring runs caclelessly on the same engine/weights
        self.aux_llm = self.llm

        self.whisper_model = load_asr(whisper_model)

    def _default_lm_config(self) -> DuplexLMConfig:
        vocab = self.tokenizer.vocab_size
        vocab = ((vocab + 7) // 8) * 8  # resize_token_embeddings pad_to_multiple_of=8
        if self.tiny:
            return tiny_lm_config(
                vocab_size=vocab,
                codebook_size=self.audio_tokenizer.codebook_size,
                max_context=self.llm_n_ctx,
            )
        # deployment scale: at least the Llama-3.2 text vocab (128256) +
        # specials + codec region, so benchmarks with the byte-fallback
        # tokenizer still exercise full-size embed/lm_head/sampler
        deployed_vocab = ((128256 + 10 + self.audio_tokenizer.codebook_size + 7) // 8) * 8
        return llama32_1b_config(
            vocab_size=max(vocab, deployed_vocab), max_context=self.llm_n_ctx
        )

    def _load_checkpoint(self, path: str):
        """Load LM weights from an orbax checkpoint dir (written by our
        trainer), an HF Llama checkpoint dir (config.json + safetensors,
        via models/convert.load_hf_llama), or the reference's shipped GGUF
        artifact itself (F16/q8_0, prep_test_model.sh:27-34, via
        models/gguf.load_gguf_llama)."""
        if path.endswith(".gguf"):
            from ..models.gguf import load_gguf_llama

            params, cfg = load_gguf_llama(
                path,
                max_context=self.llm_n_ctx,
                int4=self.quantize_int4,
                codec_vocab_start=self.lm_config.codec_vocab_start,
            )
            self.lm_config = cfg
            return params
        if os.path.isdir(path) and os.path.exists(os.path.join(path, "config.json")):
            from ..models.convert import load_hf_llama

            params, cfg = load_hf_llama(
                path,
                max_context=self.llm_n_ctx,
                codec_vocab_start=self.lm_config.codec_vocab_start,
            )
            self.lm_config = cfg
            return params
        from ..train.checkpoint import load_params

        return load_params(path, self.lm_config)

    def clone_for_self_play(self) -> "RealtimeAgentResources":
        """Second agent over the SAME weights: new engine (KV + sampler state),
        shared codec/tokenizer/params (reference realtime_agent_resources.py:41-49)."""
        clone = object.__new__(RealtimeAgentResources)
        clone.quantize_int8 = self.quantize_int8
        clone.quantize_int4 = self.quantize_int4
        clone.llm_model_path = self.llm_model_path
        clone.llm_model_dir = self.llm_model_dir
        clone.llm_n_ctx = self.llm_n_ctx
        clone.tiny = self.tiny
        clone.seed = self.seed
        clone.audio_tokenizer = AudioTokenizer(
            codec_model=self.audio_tokenizer.codec_model
        )
        clone.tokenizer = self.tokenizer
        clone.lm_config = self.lm_config
        clone.lm_params = self.lm_params
        clone.llm = DuplexLMEngine(self.lm_params, self.lm_config)
        clone.aux_llm = clone.llm
        clone.whisper_model = self.whisper_model
        return clone

    def clone_to_device(self, device) -> "RealtimeAgentResources":
        """Full replica COMMITTED to another chip: weights + codec copied via
        ``jax.device_put`` so every program built over the clone runs there.

        This is the duplex-serving capacity axis: concurrent full-duplex
        calls are INDEPENDENT, so multi-chip serving is replicated per-chip
        pools with zero collectives — the idiomatic TPU layout when nothing
        needs to communicate (vs. the reference's one-GPU-process-per-call,
        inference_client_fastrtc_v2.py:143)."""
        clone = object.__new__(RealtimeAgentResources)
        clone.quantize_int8 = self.quantize_int8
        clone.quantize_int4 = self.quantize_int4
        clone.llm_model_path = self.llm_model_path
        clone.llm_model_dir = self.llm_model_dir
        clone.llm_n_ctx = self.llm_n_ctx
        clone.tiny = self.tiny
        clone.seed = self.seed
        with jax.default_device(device):
            codec_src = self.audio_tokenizer.codec_model
            codec_copy = JaxCodecModel(
                jax.device_put(codec_src.params, device), codec_src.config
            )
            clone.audio_tokenizer = AudioTokenizer(codec_model=codec_copy)
            clone.tokenizer = self.tokenizer
            clone.lm_config = self.lm_config
            clone.lm_params = jax.device_put(self.lm_params, device)
            clone.llm = DuplexLMEngine(clone.lm_params, clone.lm_config)
            clone.aux_llm = clone.llm
        clone.whisper_model = self.whisper_model
        return clone
