"""Batched decode engine: N independent sequences, one device program/step.

The reference leans on vLLM for concurrent serving (run_demo*.py against an
OpenAI-compatible endpoint, SURVEY §2.2); the round-1 backend serialized
requests behind a lock. This engine decodes up to ``batch_size`` sequences
per forward: each row has its own cache region, offset, sampler settings,
PRNG stream, and penalty window — all batched into one jitted step
(models/llama.forward_decode already supports per-row positions/validity).

Slots are independent: ``prefill_row`` loads a prompt into one row (the
other rows' caches are untouched — row-sliced prefill), ``step`` advances
every active row by one token. The continuous-batching serving loop lives in
serving/batched_backend.py.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import (
    DuplexLMConfig,
    commit_kv,
    commit_kv_rows,
    forward_decode,
    logits_from_hidden,
)
from ..ops.sampling import PENALTY_WINDOW, sample_token

PREFILL_BUCKETS = (32, 128, 512, 2048)


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"prompt longer than {PREFILL_BUCKETS[-1]} tokens")


class BatchedDecodeEngine:
    def __init__(
        self,
        params,
        cfg: DuplexLMConfig,
        batch_size: int = 8,
        max_context: Optional[int] = None,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.batch = batch_size
        self.max_context = max_context or min(cfg.max_context, 4096)
        dtype = jnp.dtype(cfg.compute_dtype)
        kv_shape = (
            cfg.num_layers, batch_size, self.max_context,
            cfg.num_kv_heads, cfg.head_dim,
        )
        self._k = jnp.zeros(kv_shape, dtype)
        self._v = jnp.zeros(kv_shape, dtype)
        self.offsets = np.zeros(batch_size, dtype=np.int64)  # host mirror
        self.last_tokens = np.zeros(batch_size, dtype=np.int64)
        self._base_key = jax.random.PRNGKey(seed)
        self._steps = np.zeros(batch_size, dtype=np.int64)
        self._nonces = np.zeros(batch_size, dtype=np.int64)
        # per-row sampler scalars: [top_p, min_p, temp, rep, freq, pres, min_id]
        self.scalars = np.tile(
            np.array([1.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0], np.float32),
            (batch_size, 1),
        )
        self._windows = np.zeros((batch_size, PENALTY_WINDOW), np.int64)
        self._window_counts = np.zeros(batch_size, dtype=np.int64)
        self._build_jits()

    # ------------------------------------------------------------------- jits
    def _build_jits(self):
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1, 2), static_argnames=("row",))
        def prefill_row(params, k, v, tokens, offset, last_idx, row):
            # row-sliced: only this row's cache region is read/written
            k_row = jax.lax.dynamic_slice_in_dim(k, row, 1, axis=1)
            v_row = jax.lax.dynamic_slice_in_dim(v, row, 1, axis=1)
            positions = offset + jnp.arange(tokens.shape[1])
            hidden, nk, nv = forward_decode(
                params, tokens, cfg, k_row, v_row, positions
            )
            k_row, v_row = commit_kv(k_row, v_row, nk, nv, offset)
            k = jax.lax.dynamic_update_slice_in_dim(k, k_row, row, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(v, v_row, row, axis=1)
            last_h = jax.lax.dynamic_index_in_dim(hidden[0], last_idx, axis=0)
            logits = logits_from_hidden(params, last_h, cfg)[0]
            return logits, k, v

        @functools.partial(jax.jit, donate_argnums=(1, 2), static_argnames=("top_k",))
        def step(
            params, k, v, tokens, offsets, active, base_key, nonces, steps,
            scalars, windows, window_counts, top_k,
        ):
            """One token for every row: eval tokens (B,1) at per-row offsets,
            sample per-row. Inactive rows write to a trash slot."""
            b = tokens.shape[0]
            cache_len = k.shape[2]
            trash = cache_len - 1
            positions = offsets[:, None]  # (B,1)
            hidden, nk, nv = forward_decode(
                params, tokens, cfg, k, v, positions, cache_valid=offsets
            )
            logits = logits_from_hidden(params, hidden[:, -1], cfg)  # (B,V)

            wmask = (
                jnp.arange(PENALTY_WINDOW)[None, :]
                >= PENALTY_WINDOW - window_counts[:, None]
            ).astype(jnp.float32)
            keys = jax.vmap(
                lambda n, s: jax.random.fold_in(jax.random.fold_in(base_key, n), s)
            )(nonces, steps)
            zero_bias = jnp.zeros((b, 4), jnp.int32)
            zero_vals = jnp.zeros((b, 4), jnp.float32)
            next_tokens = jax.vmap(
                lambda lg, key, sc, wi, wm: sample_token(
                    lg, key, sc, zero_bias[0], zero_vals[0], wi, wm, top_k=top_k
                )
            )(logits, keys, scalars, windows, wmask)

            commit_off = jnp.where(active, offsets, trash)
            k, v = commit_kv_rows(k, v, nk, nv, commit_off)
            return next_tokens, k, v

        self._prefill_fn = prefill_row
        self._step_fn = step

    # ------------------------------------------------------------------ slots
    def reset_row(self, row: int) -> None:
        self.offsets[row] = 0
        self.last_tokens[row] = 0
        self._steps[row] = 0
        self._nonces[row] += 1
        self._windows[row] = 0
        self._window_counts[row] = 0

    def set_row_sampler(
        self, row: int, top_p=1.0, min_p=0.0, temp=1.0, repeat_penalty=1.0,
        frequency_penalty=0.0, presence_penalty=0.0, min_token_id=0,
    ) -> None:
        self.scalars[row] = [
            top_p, min_p, temp, repeat_penalty, frequency_penalty,
            presence_penalty, float(min_token_id),
        ]

    def prefill_row(self, row: int, prompt_ids: Sequence[int]) -> None:
        """Load a prompt into one slot; the final prompt token becomes the
        row's pending token (evaled by its first step)."""
        prompt_ids = [int(t) for t in prompt_ids]
        if len(prompt_ids) + 1 >= self.max_context:
            raise ValueError("prompt too long for the serving cache")
        self.reset_row(row)
        self._nonces[row] += 1
        head, last = prompt_ids[:-1], prompt_ids[-1]
        if head:
            b = _bucket(len(head))
            padded = np.zeros((1, b), np.int32)
            padded[0, : len(head)] = head
            _, self._k, self._v = self._prefill_fn(
                self.params, self._k, self._v, jnp.asarray(padded),
                jnp.int32(0), jnp.int32(len(head) - 1), row,
            )
        self.offsets[row] = len(head)
        self.last_tokens[row] = last
        tail = prompt_ids[-PENALTY_WINDOW:]
        self._windows[row] = 0
        self._windows[row, PENALTY_WINDOW - len(tail):] = tail
        self._window_counts[row] = len(tail)

    def step(self, active: Sequence[bool], top_k: int = 0) -> List[int]:
        """Advance every row one token (inactive rows are no-ops); returns
        the sampled token per row."""
        active_arr = np.asarray(active, dtype=bool)
        tokens, self._k, self._v = self._step_fn(
            self.params,
            self._k,
            self._v,
            jnp.asarray(self.last_tokens[:, None].astype(np.int32)),
            jnp.asarray(self.offsets.astype(np.int32)),
            jnp.asarray(active_arr),
            self._base_key,
            jnp.asarray(self._nonces.astype(np.int32)),
            jnp.asarray(self._steps.astype(np.int32)),
            jnp.asarray(self.scalars),
            jnp.asarray(self._windows.astype(np.int32)),
            jnp.asarray(self._window_counts.astype(np.int32)),
            int(top_k) if top_k else 1024,
        )
        tokens = np.asarray(jax.device_get(tokens))
        out: List[int] = []
        for r in range(self.batch):
            tok = int(tokens[r])
            out.append(tok)
            if active_arr[r]:
                # the newly sampled token becomes the pending one and (like
                # the sequential engine's make_window over mirror+pending)
                # joins the penalty window for the NEXT sample
                self._windows[r] = np.roll(self._windows[r], -1)
                self._windows[r, -1] = tok
                self._window_counts[r] = min(
                    self._window_counts[r] + 1, PENALTY_WINDOW
                )
                self.offsets[r] += 1
                self._steps[r] += 1
                self.last_tokens[r] = tok
        return out
