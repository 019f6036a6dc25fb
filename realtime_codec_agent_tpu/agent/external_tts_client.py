"""HTTP client for the external TTS server's codec-chunk line stream.

Capability rebuild of the reference client (external_tts_client.py:8-77).
WAV serialization uses the stdlib ``wave`` module (soundfile is not available
in this image; 16-bit PCM WAV is byte-identical for this purpose).
"""
from __future__ import annotations

import base64
import io
import struct
import wave
from typing import Optional, Tuple

import numpy as np
import requests


def encode_wav_base64(audio: Tuple[int, np.ndarray]) -> str:
    sample_rate, data = audio
    data = np.asarray(data)
    if data.dtype != np.int16:
        data = np.clip(data, -1.0, 1.0)
        data = (data * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1 if data.ndim == 1 else data.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(data.T.tobytes() if data.ndim > 1 else data.tobytes())
    return base64.b64encode(buf.getvalue()).decode("utf-8")


def decode_wav_base64(wav_b64: str) -> Tuple[int, np.ndarray]:
    raw = base64.b64decode(wav_b64)
    with wave.open(io.BytesIO(raw), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(n)
    if width != 2:
        raise ValueError(f"only 16-bit PCM WAV supported, got width {width}")
    data = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768.0
    if ch > 1:
        data = data.reshape(-1, ch).T
    return sr, data


class ExternalTTSClient:
    def __init__(self, server_url: str = "http://127.0.0.1:8001", chunk_size_secs: float = 0.1):
        self.server_url = server_url.rstrip("/")
        self.session_id = "default_session"
        self.chunk_size_secs = chunk_size_secs
        self.stream_resp: Optional[requests.Response] = None
        self.stream = None

    def set_voice_enrollment(
        self,
        voice_enrollment: Optional[Tuple[int, np.ndarray]] = None,
        prompt_text: Optional[str] = None,
    ) -> None:
        wav_base64 = encode_wav_base64(voice_enrollment) if voice_enrollment is not None else None
        resp = requests.post(
            f"{self.server_url}/set_voice_enrollment",
            json={
                "session_id": self.session_id,
                "wav_base64": wav_base64,
                "prompt_text": prompt_text,
            },
        )
        resp.raise_for_status()

    def prep_stream(self, text: str) -> None:
        try:
            self.close_stream()
            self.stream_resp = requests.post(
                f"{self.server_url}/stream",
                json={
                    "session_id": self.session_id,
                    "text": text,
                    "chunk_size_secs": self.chunk_size_secs,
                },
                stream=True,
            )
            self.stream_resp.raise_for_status()
            self.stream = self.stream_resp.iter_lines(decode_unicode=True)
        except Exception:
            try:
                self.close_stream()
            except Exception:
                pass
            raise

    def next_chunk(self) -> Optional[str]:
        if self.stream is None:
            return None
        try:
            chunk = next(self.stream, None)
            if chunk is None:
                self.close_stream()
            return chunk
        except Exception:
            try:
                self.close_stream()
            except Exception:
                pass
            raise

    def close_stream(self) -> None:
        if self.stream_resp is not None:
            self.stream_resp.close()
            self.stream_resp = None
            self.stream = None
