"""Pluggable ASR interface for external user-channel transcription.

The reference binds whisper.cpp via pywhispercpp (realtime_agent_resources.py:36-39,
realtime_agent_v2.py:415-430). On TPU the ASR engine is pluggable: anything
with ``transcribe(audio_f32_16k) -> str`` works. ``WhisperCppASR`` wraps
pywhispercpp when present; ``load_asr`` gates the import so the framework runs
without it (use_whisper is auto-disabled by the agent when no ASR is loaded).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


class ASRModel:
    """Interface: transcribe 16 kHz float32 mono audio to text."""

    def transcribe(self, audio: np.ndarray, temperature: float = 0.0) -> str:
        raise NotImplementedError


class WhisperCppASR(ASRModel):
    """whisper.cpp backend (greedy, single segment, no context — matching the
    reference's call, realtime_agent_v2.py:421-428)."""

    def __init__(self, model_name: str = "small.en"):
        from pywhispercpp.model import Model

        self._model = Model(model_name)

    def transcribe(self, audio: np.ndarray, temperature: float = 0.0) -> str:
        segments = self._model.transcribe(
            audio,
            temperature=temperature,
            language="en",
            no_context=True,
            single_segment=True,
            print_progress=False,
        )
        return " ".join(segment.text for segment in segments)


class JaxWhisperASR(ASRModel):
    """On-TPU Whisper backend: the full pipeline (log-mel -> encoder ->
    KV-cached greedy while_loop decode) runs as jitted JAX programs
    (models/whisper.py), so external transcription shares the TPU with the
    duplex LM instead of a host CPU whisper.cpp process (reference
    realtime_agent_resources.py:36-39). Greedy, single segment, no context —
    the same call surface as the reference's whisper.cpp invocation
    (realtime_agent_v2.py:421-428)."""

    def __init__(self, model, tokenizer):
        """model: models.whisper.JaxWhisperModel; tokenizer: anything with
        decode(ids, skip_special_tokens=True) over Whisper's vocab."""
        self._model = model
        self._tokenizer = tokenizer

    @classmethod
    def from_hf_checkpoint(
        cls,
        model_name_or_path: str,
        local_files_only: bool = True,
        max_new_tokens: int = 128,
        window_secs=None,
    ) -> "JaxWhisperASR":
        """Build from a local HF Whisper checkpoint: torch weights convert to
        the JAX pytree once at load; torch is not used at inference.
        ``window_secs`` (e.g. [5, 10, 30]) enables bucketed encoder windows —
        short transcriptions pad to the smallest bucket instead of the
        canonical 30 s, cutting encode cost ~proportionally."""
        from transformers import WhisperForConditionalGeneration, WhisperTokenizer

        from ..models.whisper import JaxWhisperModel

        hf_model = WhisperForConditionalGeneration.from_pretrained(
            model_name_or_path, local_files_only=local_files_only
        )
        tokenizer = WhisperTokenizer.from_pretrained(
            model_name_or_path, local_files_only=local_files_only
        )
        return cls(
            JaxWhisperModel.from_hf(
                hf_model, max_new_tokens=max_new_tokens, window_secs=window_secs
            ),
            tokenizer,
        )

    def transcribe(self, audio: np.ndarray, temperature: float = 0.0) -> str:
        # greedy decode regardless of temperature (the reference calls
        # whisper.cpp with temperature=0.0)
        ids = self._model.transcribe_ids(np.asarray(audio, dtype=np.float32))
        return self._tokenizer.decode(ids, skip_special_tokens=True).strip()


class TransformersWhisperASR(ASRModel):
    """HF Whisper backend (torch CPU — installed in this image): loads a
    local checkpoint directory or hub id via WhisperForConditionalGeneration.
    Greedy single-segment decoding matches the reference whisper.cpp call
    surface (realtime_agent_v2.py:421-428)."""

    def __init__(
        self,
        model_name_or_path: str = None,
        model=None,
        processor=None,
        local_files_only: bool = True,
    ):
        import torch

        if model is None or processor is None:
            from transformers import WhisperForConditionalGeneration, WhisperProcessor

            # local_files_only by default: a hub fetch with network timeouts
            # inside realtime-agent startup would stall the session; pass
            # False explicitly to allow downloading
            model = WhisperForConditionalGeneration.from_pretrained(
                model_name_or_path, local_files_only=local_files_only
            )
            processor = WhisperProcessor.from_pretrained(
                model_name_or_path, local_files_only=local_files_only
            )
        self._torch = torch
        self._model = model.eval()
        self._processor = processor

    def transcribe(self, audio: np.ndarray, temperature: float = 0.0) -> str:
        inputs = self._processor(
            np.asarray(audio, dtype=np.float32), sampling_rate=16000, return_tensors="pt"
        )
        with self._torch.no_grad():
            ids = self._model.generate(
                inputs.input_features,
                do_sample=temperature > 0,
                temperature=temperature if temperature > 0 else None,
                max_new_tokens=128,
            )
        return self._processor.batch_decode(ids, skip_special_tokens=True)[0].strip()


def load_asr(model: Optional[object]) -> Optional[ASRModel]:
    """None stays None; an ASRModel passes through; a string tries the
    on-TPU JAX Whisper first (local HF checkpoint converted to a pytree),
    then whisper.cpp (pywhispercpp), then the torch-CPU HF backend."""
    if model is None or isinstance(model, ASRModel):
        return model
    if isinstance(model, str):
        import logging

        log = logging.getLogger(__name__)
        name = model if "/" in model or os.path.isdir(model) else f"openai/whisper-{model}"
        try:
            return JaxWhisperASR.from_hf_checkpoint(name)
        except Exception as ex:
            # conversion/OOM failures here must not be silent: the session
            # would quietly fall back to a slower backend
            log.warning("JaxWhisperASR load failed for %r (%s); trying fallbacks", name, ex)
        try:
            return WhisperCppASR(model)
        except ImportError:
            pass
        try:
            return TransformersWhisperASR(name)
        except Exception:
            import warnings

            warnings.warn(
                f"no ASR backend available for '{model}' (pywhispercpp missing, "
                "HF Whisper weights not found locally) — native transcription "
                "will be used (use_whisper disabled)."
            )
            return None
    raise TypeError(f"Unsupported ASR model: {type(model)}")
