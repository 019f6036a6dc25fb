"""Pluggable ASR interface for external user-channel transcription.

The reference binds whisper.cpp via pywhispercpp (realtime_agent_resources.py:36-39,
realtime_agent_v2.py:415-430). On TPU the ASR engine is pluggable: anything
with ``transcribe(audio_f32_16k) -> str`` works. ``WhisperCppASR`` wraps
pywhispercpp when present; ``load_asr`` gates the import so the framework runs
without it (use_whisper is auto-disabled by the agent when no ASR is loaded).
"""
from __future__ import annotations

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


def load_asr(model: Optional[object]) -> Optional[ASRModel]:
    """None stays None; a string loads whisper.cpp if available; an ASRModel
    passes through."""
    if model is None or isinstance(model, ASRModel):
        return model
    if isinstance(model, str):
        try:
            return WhisperCppASR(model)
        except ImportError:
            import warnings

            warnings.warn(
                f"pywhispercpp not installed; ASR model '{model}' unavailable — "
                "native transcription will be used (use_whisper disabled)."
            )
            return None
    raise TypeError(f"Unsupported ASR model: {type(model)}")
