"""HTTP client for the external TTS server's codec-chunk line stream.

Capability rebuild of the reference client (external_tts_client.py:8-77) with
two deliberate upgrades the reference lacks: every request carries a
(connect, read) timeout, and idempotent POSTs retry with exponential backoff
on transport errors. WAV serialization uses the stdlib ``wave`` module
(soundfile is not available in this image; 16-bit PCM WAV is byte-identical
for this purpose).

Wire protocol (forced by the server, tts_server.py): POST /set_voice_enrollment
with {session_id, wav_base64, prompt_text}; POST /stream with {session_id,
text, chunk_size_secs} returning newline-delimited codec-unicode chunk strings.
"""
from __future__ import annotations

import base64
import io
import time
import wave
from typing import Iterator, Optional, Tuple

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
    """Talks to the TTS server; owns at most one live chunk stream at a time.

    ``connect_timeout``/``read_timeout`` bound every HTTP call (the read
    timeout also bounds how long ``next_chunk`` can block waiting for the
    server to synthesize the next line). ``max_retries`` bounds re-attempts
    of stream setup and enrollment on transport-level failures; chunk reads
    are never retried (a mid-stream failure must surface, since chunks
    already consumed cannot be replayed).
    """

    def __init__(
        self,
        server_url: str = "http://127.0.0.1:8001",
        chunk_size_secs: float = 0.1,
        connect_timeout: float = 5.0,
        read_timeout: float = 30.0,
        max_retries: int = 2,
        retry_backoff_secs: float = 0.25,
    ):
        self.server_url = server_url.rstrip("/")
        self.session_id = "default_session"
        self.chunk_size_secs = chunk_size_secs
        self.timeout = (connect_timeout, read_timeout)
        self.max_retries = max_retries
        self.retry_backoff_secs = retry_backoff_secs
        self._resp: Optional[requests.Response] = None
        self._lines: Optional[Iterator[str]] = None

    # -- transport -----------------------------------------------------------

    def _post_with_retry(self, endpoint: str, payload: dict, stream: bool = False) -> requests.Response:
        """POST ``payload``; on connection/timeout errors retry up to
        ``max_retries`` times with exponential backoff. HTTP error statuses
        raise immediately (the server saw the request — retrying could
        duplicate work)."""
        url = f"{self.server_url}/{endpoint.lstrip('/')}"
        attempt = 0
        while True:
            try:
                resp = requests.post(url, json=payload, stream=stream, timeout=self.timeout)
            except (requests.ConnectionError, requests.Timeout):
                if attempt >= self.max_retries:
                    raise
                time.sleep(self.retry_backoff_secs * (2**attempt))
                attempt += 1
                continue
            resp.raise_for_status()
            return resp

    # -- public API (parity with the reference client) -----------------------

    def set_voice_enrollment(
        self,
        voice_enrollment: Optional[Tuple[int, np.ndarray]] = None,
        prompt_text: Optional[str] = None,
    ) -> None:
        payload = {
            "session_id": self.session_id,
            "wav_base64": None if voice_enrollment is None else encode_wav_base64(voice_enrollment),
            "prompt_text": prompt_text,
        }
        self._post_with_retry("set_voice_enrollment", payload).close()

    def prep_stream(self, text: str) -> None:
        """Open a fresh chunk stream for ``text``, replacing any live one."""
        self.close_stream()
        resp = self._post_with_retry(
            "stream",
            {
                "session_id": self.session_id,
                "text": text,
                "chunk_size_secs": self.chunk_size_secs,
            },
            stream=True,
        )
        self._resp = resp
        self._lines = resp.iter_lines(decode_unicode=True)

    def next_chunk(self) -> Optional[str]:
        """One codec-unicode line, or None at end-of-stream (which closes it).

        A transport failure mid-stream closes the stream and propagates —
        callers treat it the same as any TTS outage (agent.py falls back to
        silence)."""
        if self._lines is None:
            return None
        try:
            line = next(self._lines, None)
        except Exception:
            self.close_stream()
            raise
        if line is None:
            self.close_stream()
        return line

    def close_stream(self) -> None:
        resp, self._resp, self._lines = self._resp, None, None
        if resp is not None:
            try:
                resp.close()
            except Exception:
                pass

    # Back-compat aliases: a couple of call sites/tests historically reached
    # for the response object by its old attribute name.
    @property
    def stream_resp(self) -> Optional[requests.Response]:
        return self._resp

    @property
    def stream(self) -> Optional[Iterator[str]]:
        return self._lines
