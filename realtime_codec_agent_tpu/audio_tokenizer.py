"""Streaming audio <-> unicode-codes bridge on the TPU-native codec.

API-compatible rebuild of reference realtime_codec_agent/audio_tokenizer.py
(tokenize_audio:68, detokenize_audio:106, chunked_tokenize_audio:52,
get_codec_embeddings:152, reset_context:44, _compute_framerate:181).

TPU-first difference: with ``fixed_context=True`` (default) the rolling 2 s
encode context is a fixed-size buffer initialized with silence (zeros) and the
decode context is pre-filled with encoded-silence codes, so *every* streaming
call hits one already-compiled XLA program with a static shape — no per-length
recompilation at session start. The reference instead grows the context from
empty (audio_tokenizer.py:44-46), which on TPU would compile a new program for
each of the first ~20 chunk counts; set ``fixed_context=False`` for that exact
legacy semantics (still correct, just recompiles during warmup).

For any chunk cadence, once the context is saturated the two modes produce
identical tokens: the reference trims to ``max(len(chunk), context)`` so
pre-warmup state never influences post-warmup output beyond the context
window.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple, Union

import numpy as np

from .models.codec import CodecConfig, JaxCodecModel
from .units.codes import (
    UNICODE_OFFSET_LARGE,
    chars_to_codes,
    codes_to_chars,
    deinterleave_channels,
    drop_hanging_channel_codes,
    interleave_channels,
)
from .utils.audio_utils import prep_audio


class AudioTokenizer:
    def __init__(
        self,
        codec_model: Union[str, JaxCodecModel, None] = None,
        num_channels: int = 1,
        context_secs: float = 2.0,
        unicode_offset: int = UNICODE_OFFSET_LARGE,
        codec_config: Optional[CodecConfig] = None,
        fixed_context: bool = True,
        framerate_probe_secs: Optional[float] = None,
        seed: int = 0,
    ):
        if isinstance(codec_model, JaxCodecModel):
            self.codec_model = codec_model
        elif isinstance(codec_model, str):
            # checkpoint path (.npz / dir / torch state_dict); fails loudly on
            # a missing or malformed checkpoint
            self.codec_model = JaxCodecModel.load(codec_model, config=codec_config)
        elif codec_model is None:
            # explicit random-init of the configured architecture
            # (tests / weight-independent benchmarks)
            self.codec_model = JaxCodecModel.random_init(codec_config, seed=seed)
        else:
            raise TypeError(f"Unsupported codec_model: {type(codec_model)}")

        self.num_channels = num_channels
        self.num_codebooks = 1
        self.codebook_size = self.codec_model.codebook_size
        self.context_secs = context_secs
        self.unicode_offset = unicode_offset
        self.fixed_context = fixed_context

        self.sampling_rate = self.codec_model.sample_rate
        # Probe the frame rate by encoding silence (reference
        # audio_tokenizer.py:181-187 uses 10 s). Default: probe with exactly the
        # context window so the probe shares the streaming path's compiled
        # shape — identical result for any integral samples-per-frame.
        self.framerate_probe_secs = (
            framerate_probe_secs if framerate_probe_secs is not None else context_secs
        )
        self.framerate = self._compute_framerate()

        self.context_samples = int(self.context_secs * self.sampling_rate)
        self.context_frames = int(self.context_secs * self.framerate * self.num_channels)

        if fixed_context:
            # silence fill for the decode context: codes of encoded silence
            silence_codes = self._encode_silence(self.context_secs)[0, 0]
            ch_chars = codes_to_chars(
                silence_codes[None, :], self.codebook_size, unicode_offset=self.unicode_offset
            )
            self._silence_context_str = interleave_channels([ch_chars] * self.num_channels)

        self.reset_context()

    # -- context management -------------------------------------------------
    def reset_context(self):
        if self.fixed_context:
            self.tokenize_context = np.zeros(
                (self.num_channels, self.context_samples), dtype=np.float32
            )
            self.detokenize_context = self._silence_context_str
        else:
            self.tokenize_context = np.zeros((self.num_channels, 0), dtype=np.float32)
            self.detokenize_context = ""

    def get_audio_codes_str_secs(self, audio_codes_str: str) -> float:
        return len(audio_codes_str) / (self.framerate * self.num_channels)

    # -- encode -------------------------------------------------------------
    def chunked_tokenize_audio(
        self, audio: Union[Tuple[int, np.ndarray], np.ndarray], chunk_size_secs: float
    ) -> str:
        if isinstance(audio, np.ndarray):
            sr = self.sampling_rate
        else:
            sr, audio = audio
        chunk_size_samples = int(chunk_size_secs * sr)
        parts: List[str] = []
        for start in range(0, audio.shape[-1], chunk_size_samples):
            chunk = audio[..., start : start + chunk_size_samples]
            parts.append(self.tokenize_audio((sr, chunk)))
        return "".join(parts)

    def tokenize_audio(self, audio: Union[Tuple[int, np.ndarray], np.ndarray]) -> str:
        audio = prep_audio(audio, self.sampling_rate, self.num_channels)
        audio = audio.reshape(self.num_channels, -1)

        # roll the context: keep the last max(len(chunk), context) samples
        # (reference audio_tokenizer.py:72-74)
        self.tokenize_context = np.concatenate((self.tokenize_context, audio), axis=-1)
        self.tokenize_context = self.tokenize_context[
            ..., -max(audio.shape[-1], self.context_samples) :
        ]

        codes = self.codec_model.encode(self.tokenize_context)  # (C, F)

        if self.fixed_context and self.tokenize_context.shape[-1] > self.context_samples:
            # an oversize chunk blew past the window; restore the fixed shape
            self.tokenize_context = self.tokenize_context[..., -self.context_samples :]

        channels_chars = [
            codes_to_chars(ch[None, :], self.codebook_size, unicode_offset=self.unicode_offset)
            for ch in codes
        ]
        audio_codes_str = interleave_channels(channels_chars)

        # keep only the frames belonging to the new audio (reference :98-101)
        audio_secs = audio.shape[-1] / self.sampling_rate
        audio_frames = int(audio_secs * self.framerate * self.num_channels)
        return audio_codes_str[-audio_frames:]

    # -- decode -------------------------------------------------------------
    def detokenize_audio(
        self, audio_codes_str: str, preroll_samples: int = 0
    ) -> Tuple[Tuple[int, np.ndarray], str, int]:
        audio_codes_str, end_hanging = drop_hanging_channel_codes(
            audio_codes_str, self.num_channels
        )

        # roll the decode context (reference audio_tokenizer.py:110-113)
        self.detokenize_context += audio_codes_str
        self.detokenize_context = self.detokenize_context[
            -max(len(audio_codes_str), self.context_frames) :
        ]

        channel_strs = deinterleave_channels(self.detokenize_context, self.num_channels)
        codes = np.stack(
            [
                chars_to_codes(
                    s, self.num_codebooks, self.codebook_size, unicode_offset=self.unicode_offset
                )[0]
                for s in channel_strs
            ]
        )  # (C, F)
        output_audio = self.codec_model.decode(codes)  # (C, F*hop)

        if self.fixed_context and len(self.detokenize_context) > self.context_frames:
            self.detokenize_context = self.detokenize_context[-self.context_frames :]

        # keep only the samples for the new codes (+preroll) (reference :141-145;
        # unlike the reference we return 0 samples -- not the whole context --
        # when audio_samples == 0, avoiding the `[-0:]` slicing footgun)
        audio_secs = self.get_audio_codes_str_secs(audio_codes_str)
        audio_samples = int(audio_secs * self.sampling_rate) + preroll_samples
        output_audio = output_audio[..., output_audio.shape[-1] - audio_samples :]
        preroll_samples = max(0, preroll_samples - audio_samples + output_audio.shape[-1])

        output_audio = output_audio[0] if self.num_channels == 1 else output_audio
        return (self.sampling_rate, output_audio), end_hanging, preroll_samples

    # -- embedding bridge ---------------------------------------------------
    def get_codec_embeddings(self) -> np.ndarray:
        """Projected codebook (V, codebook_dim) — the LM embedding bridge table
        (reference audio_tokenizer.py:151-159)."""
        return self.codec_model.get_projected_codebook()

    # -- probes -------------------------------------------------------------
    def _encode_silence(self, secs: float) -> np.ndarray:
        audio = np.zeros((1, int(secs * self.sampling_rate)), dtype=np.float32)
        codes = self.codec_model.encode(audio)  # (1, F)
        return codes[:, None, :]  # (1, num_codebooks=1, F), reference shape

    def _compute_framerate(self) -> float:
        test_secs = self.framerate_probe_secs
        audio_codes = self._encode_silence(test_secs)
        samples = int(test_secs * self.sampling_rate)
        samples_per_frame = math.ceil(samples / audio_codes.shape[-1])
        return self.sampling_rate / samples_per_frame

    # legacy-name passthrough used by clients/tests of the reference
    def _prep_audio_for_tokenization(self, audio) -> np.ndarray:
        return prep_audio(audio, self.sampling_rate, self.num_channels)
