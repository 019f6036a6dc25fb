"""Scripted fake LM engine for agent state-machine tests.

The duplex agent's frame logic (realtime_agent_v2.py:332-372 in the reference)
is testable with a stub that returns audio / end_audio / speaker / text tokens
on cue — no model weights involved.
"""
from typing import List, Optional, Sequence

import numpy as np


class FakeLMEngine:
    def __init__(self, script: Optional[List[int]] = None, default_token: int = 0):
        self.script: List[int] = list(script or [])
        self.default_token = default_token
        self._n_tokens = 0
        self._input_ids: List[int] = []
        self.eval_calls: List[List[int]] = []
        self.sample_count = 0
        self.end_audio_prob = 0.0
        self.speaker_probs = (0.5, 0.5)
        self.sampler_inits: List[dict] = []

    # -- engine interface ---------------------------------------------------
    @property
    def n_tokens(self) -> int:
        return self._n_tokens

    @n_tokens.setter
    def n_tokens(self, value: int) -> None:
        assert 0 <= value <= self._n_tokens
        self._n_tokens = value
        del self._input_ids[value:]

    def reset(self) -> None:
        self._n_tokens = 0
        self._input_ids = []

    def init_sampler_for_generate(self, **kwargs) -> None:
        self.sampler_inits.append(kwargs)

    def eval(self, tokens: Sequence[int]) -> None:
        tokens = list(tokens)
        self.eval_calls.append(tokens)
        self._input_ids.extend(tokens)
        self._n_tokens += len(tokens)

    def _pop(self) -> int:
        self.sample_count += 1
        if self.sample_count > 2000:
            raise RuntimeError("FakeLMEngine runaway sampling (scripted test desync?)")
        if self.script:
            return self.script.pop(0)
        return self.default_token

    def sample(self, idx=None) -> int:
        return self._pop()

    def eval_and_sample(self, tokens: Sequence[int]) -> int:
        self.eval(tokens)
        return self._pop()

    def generate(self, tokens, reset=False):
        tokens = list(tokens)
        while True:
            token = self.eval_and_sample(tokens)
            yield token
            tokens = [token]

    def get_logprobs(self, ctx_input_ids, input_ids) -> np.ndarray:
        return np.zeros(len(input_ids), dtype=np.float32)

    def last_probs(self, token_ids) -> np.ndarray:
        # first id queried is end_audio (measure_event_prob); two ids => the
        # (agent, user) speaker probe
        if len(token_ids) == 1:
            return np.array([self.end_audio_prob], dtype=np.float32)
        return np.array(self.speaker_probs, dtype=np.float32)

    def get_last_logits(self) -> np.ndarray:
        raise NotImplementedError


class FakeResources:
    """RealtimeAgentResources stand-in: real codec/audio tokenizer + real text
    tokenizer, fake LM."""

    def __init__(self, audio_tokenizer, tokenizer, llm: FakeLMEngine):
        self.audio_tokenizer = audio_tokenizer
        self.tokenizer = tokenizer
        self.llm = llm
        self.aux_llm = llm
        self.whisper_model = None
        self.llm_model_dir = None
