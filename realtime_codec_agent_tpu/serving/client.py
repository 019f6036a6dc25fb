"""Completions client: HTTP (OpenAI-compatible) or in-process backend.

The demo scripts drive either a running CompletionServer/vLLM-style endpoint
or an in-process CompletionBackend through the same interface (reference
demos used the openai sdk against vLLM, run_demo.py:74-92).
"""
from __future__ import annotations

import json
from typing import Iterator, Optional, Sequence

import requests


class CompletionsClient:
    def __init__(self, base_url: Optional[str] = None, backend=None, api_key: str = "empty"):
        if (base_url is None) == (backend is None):
            raise ValueError("provide exactly one of base_url or backend")
        self.base_url = base_url.rstrip("/") if base_url else None
        self.backend = backend
        self.api_key = api_key

    def get_model_name(self) -> Optional[str]:
        if self.backend is not None:
            return self.backend.model_name
        try:
            resp = requests.get(f"{self.base_url}/models", timeout=10)
            resp.raise_for_status()
            models = [m for m in resp.json()["data"] if m.get("object") == "model"]
            return models[0]["id"] if models else None
        except requests.exceptions.ConnectionError:
            return None

    def stream_completion(
        self,
        prompt: str,
        max_tokens: int = 256,
        temperature: float = 1.0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        seed: Optional[int] = None,
        stop: Optional[Sequence[str]] = None,
    ) -> Iterator[str]:
        if self.backend is not None:
            yield from self.backend.generate(
                prompt,
                max_tokens=max_tokens,
                temperature=temperature,
                top_p=top_p,
                min_p=min_p,
                seed=seed,
                stop=stop,
            )
            return
        payload = {
            "model": self.get_model_name(),
            "prompt": prompt,
            "max_tokens": max_tokens,
            "temperature": temperature,
            "top_p": top_p,
            "seed": seed,
            "stop": list(stop) if stop else None,
            "stream": True,
            "skip_special_tokens": False,
            "spaces_between_special_tokens": False,
        }
        if min_p > 0:
            payload["min_p"] = min_p
        resp = requests.post(
            f"{self.base_url}/completions",
            headers={"Authorization": f"Bearer {self.api_key}"},
            json=payload,
            stream=True,
            timeout=600,
        )
        resp.raise_for_status()
        for line in resp.iter_lines(decode_unicode=True):
            if not line or not line.startswith("data:"):
                continue
            data = line[len("data:") :].strip()
            if data == "[DONE]":
                break
            text = json.loads(data)["choices"][0]["text"]
            if text:
                yield text

    def complete(self, prompt: str, **kwargs) -> str:
        return "".join(self.stream_completion(prompt, **kwargs))

    def complete_with_reason(self, prompt: str, **kwargs):
        """(text, finish_reason) — 'stop' for stop-string/EOS, 'length' otherwise."""
        if self.backend is not None:
            text = "".join(
                self.backend.generate(
                    prompt,
                    max_tokens=kwargs.get("max_tokens", 256),
                    temperature=kwargs.get("temperature", 1.0),
                    top_p=kwargs.get("top_p", 1.0),
                    min_p=kwargs.get("min_p", 0.0),
                    presence_penalty=kwargs.get("presence_penalty", 0.0),
                    frequency_penalty=kwargs.get("frequency_penalty", 0.0),
                    seed=kwargs.get("seed"),
                    stop=kwargs.get("stop"),
                )
            )
            return text, self.backend.last_finish_reason
        payload = {
            "model": self.get_model_name(),
            "prompt": prompt,
            "stream": False,
            "skip_special_tokens": False,
            "spaces_between_special_tokens": False,
        }
        payload.update({k: v for k, v in kwargs.items() if v is not None})
        if isinstance(payload.get("stop"), str):
            payload["stop"] = [payload["stop"]]
        resp = requests.post(
            f"{self.base_url}/completions",
            headers={"Authorization": f"Bearer {self.api_key}"},
            json=payload,
            timeout=600,
        )
        resp.raise_for_status()
        choice = resp.json()["choices"][0]
        return choice["text"], choice.get("finish_reason", "stop")
