"""Batched decode engine: N independent sequences, one device program/step.

The reference leans on vLLM for concurrent serving (run_demo*.py against an
OpenAI-compatible endpoint, SURVEY §2.2); the round-1 backend serialized
requests behind a lock. This engine decodes up to ``batch_size`` sequences
per forward: each row has its own cache region, offset, sampler settings,
PRNG stream, and penalty window — all batched into one jitted step
(models/llama.forward_decode supports per-row positions/validity).

The step's bookkeeping (pending token, offset, step counter, penalty window)
is DEVICE-CARRIED, so consecutive steps chain without waiting for the
previous step's sampled tokens to reach the host: ``step_async`` dispatches
against the device state and returns the token handles, ``resolve`` fetches
them one step later — the device tunnel's fixed per-fetch fee overlaps the
next step's compute (the same dispatch-first pattern as the realtime agent's
pipelined chunks). The continuous-batching serving loop lives in
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
        self._base_key = jax.random.PRNGKey(seed)
        # device-carried per-row decode state (chained across steps)
        self.dstate = {
            "last": jnp.zeros((batch_size,), jnp.int32),     # pending token
            "off": jnp.zeros((batch_size,), jnp.int32),      # cache offset
            "step": jnp.zeros((batch_size,), jnp.int32),     # PRNG step
            "win": jnp.zeros((batch_size, PENALTY_WINDOW), jnp.int32),
            "wcount": jnp.zeros((batch_size,), jnp.int32),
        }
        # host mirrors (refreshed on resolve; used for admission/inspection)
        self.offsets = np.zeros(batch_size, dtype=np.int64)
        self._nonces = np.zeros(batch_size, dtype=np.int64)
        # per-row sampler scalars:
        # [top_p, min_p, temp, rep, freq, pres, min_id, dyn_top_k]
        self.scalars = np.tile(
            np.array([1.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0], np.float32),
            (batch_size, 1),
        )
        # per-row PRNG bases: request seeds make rows reproducible; unseeded
        # rows derive a fresh stream per slot reuse
        self._row_keys = np.stack(
            [np.asarray(jax.random.fold_in(self._base_key, r)) for r in range(batch_size)]
        )
        self._build_jits()

    # ------------------------------------------------------------------- jits
    def _build_jits(self):
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill_row(params, k, v, dstate, tokens, n_prompt, last_token, row):
            # row-sliced: only this row's cache region is read/written
            k_row = jax.lax.dynamic_slice_in_dim(k, row, 1, axis=1)
            v_row = jax.lax.dynamic_slice_in_dim(v, row, 1, axis=1)
            positions = jnp.arange(tokens.shape[1])
            hidden, nk, nv = forward_decode(
                params, tokens, cfg, k_row, v_row, positions
            )
            k_row, v_row = commit_kv(k_row, v_row, nk, nv, 0)
            k = jax.lax.dynamic_update_slice_in_dim(k, k_row, row, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(v, v_row, row, axis=1)
            # reset this row's chained state: pending = final prompt token,
            # offset = prompt length - 1, window = trailing prompt tokens
            # (win_src[p] = prompt token p: the padded head with the final
            # token written at its true position n_prompt-1)
            win_src = jnp.concatenate([tokens[0], jnp.zeros((1,), jnp.int32)])
            win_src = win_src.at[n_prompt - 1].set(last_token)
            idx = jnp.arange(PENALTY_WINDOW) - PENALTY_WINDOW + n_prompt
            win = jnp.where(idx >= 0, win_src[jnp.clip(idx, 0, win_src.shape[0] - 1)], 0)
            dstate = {
                "last": dstate["last"].at[row].set(last_token),
                "off": dstate["off"].at[row].set(n_prompt - 1),
                "step": dstate["step"].at[row].set(0),
                "win": dstate["win"].at[row].set(win),
                "wcount": dstate["wcount"].at[row].set(
                    jnp.minimum(n_prompt, PENALTY_WINDOW)
                ),
            }
            return k, v, dstate

        @functools.partial(
            jax.jit, static_argnames=("top_k", "steps", "cache_bucket")
        )
        def step(
            params, k, v, dstate, active, row_keys, scalars, top_k,
            steps=1, cache_bucket=None,
        ):
            """``steps`` tokens for every row in ONE program: each scan
            iteration evals the pending tokens at per-row offsets, samples
            per-row, and advances the device-carried state for active rows
            (inactive rows freeze). steps=S is token-identical to S
            consecutive single steps with the same active mask (the per-token
            PRNG/penalty schedule is per-row state, not per-dispatch) but pays
            the tunnel's fixed per-fetch fee once per S tokens.

            KV discipline (same as the agent's fused path): the big cache is
            READ-ONLY here — in-dispatch K/V accumulate in a (L,B,steps)
            side buffer attended via ``extra_kv`` (a slot becomes attendable
            only once its true position overwrites the sentinel), and the
            caller commits the side buffer in ONE separate donated scatter
            (``_commit_fn``). Because the cache is not donated in this
            program, slicing it to ``cache_bucket`` (a power-of-two >= the
            occupancy high-water mark) is a free view: attention traffic
            scales with how FULL rows are, not with cache capacity — at low
            occupancy this is most of the step's HBM traffic."""
            if cache_bucket is None:
                cache_bucket = k.shape[2]
            k_big = jax.lax.slice_in_dim(k, 0, cache_bucket, axis=2)
            v_big = jax.lax.slice_in_dim(v, 0, cache_bucket, axis=2)
            zero_bias = jnp.zeros((4,), jnp.int32)
            zero_vals = jnp.zeros((4,), jnp.float32)
            n_l, bsz = k.shape[0], k.shape[1]
            kh, dh = k.shape[3], k.shape[4]
            start_off = dstate["off"]  # cache contents end here, per row
            pos_sentinel = jnp.int32(2 ** 30)  # > any real position: masked
            side_k0 = jnp.zeros((n_l, bsz, steps, kh, dh), k.dtype)
            side_v0 = jnp.zeros_like(side_k0)
            side_pos0 = jnp.full((bsz, steps), pos_sentinel, jnp.int32)

            def body(carry, i):
                dstate, side_k, side_v, side_pos = carry
                offsets = dstate["off"]
                tokens = dstate["last"][:, None]
                positions = offsets[:, None]  # (B,1)
                hidden, nk, nv = forward_decode(
                    params, tokens, cfg, k_big, v_big, positions,
                    cache_valid=start_off,
                    extra_kv=(side_k, side_v), extra_pos=side_pos,
                )
                logits = logits_from_hidden(params, hidden[:, -1], cfg)  # (B,V)

                wmask = (
                    jnp.arange(PENALTY_WINDOW)[None, :]
                    >= PENALTY_WINDOW - dstate["wcount"][:, None]
                ).astype(jnp.float32)
                keys = jax.vmap(jax.random.fold_in)(row_keys, dstate["step"])
                next_tokens = jax.vmap(
                    lambda lg, key, sc, wi, wm: sample_token(
                        lg, key, sc, zero_bias, zero_vals, wi, wm, top_k=top_k
                    )
                )(logits, keys, scalars, dstate["win"], wmask)

                # stash this micro-step's K/V in side slot i; inactive rows
                # keep the sentinel so their slot is never attended
                side_k = jax.lax.dynamic_update_index_in_dim(
                    side_k, nk[:, :, 0], i, axis=2
                )
                side_v = jax.lax.dynamic_update_index_in_dim(
                    side_v, nv[:, :, 0], i, axis=2
                )
                side_pos = jax.lax.dynamic_update_index_in_dim(
                    side_pos, jnp.where(active, offsets, pos_sentinel), i, axis=1
                )

                # chain the per-row state (frozen for inactive rows): the
                # sampled token becomes pending and joins the penalty window —
                # matching the sequential engine's make_window over
                # mirror+pending
                rolled = jnp.concatenate(
                    [dstate["win"][:, 1:], next_tokens[:, None]], axis=1
                )
                act = active
                dstate = {
                    "last": jnp.where(act, next_tokens, dstate["last"]),
                    "off": jnp.where(act, offsets + 1, offsets),
                    "step": jnp.where(act, dstate["step"] + 1, dstate["step"]),
                    "win": jnp.where(act[:, None], rolled, dstate["win"]),
                    "wcount": jnp.where(
                        act,
                        jnp.minimum(dstate["wcount"] + 1, PENALTY_WINDOW),
                        dstate["wcount"],
                    ),
                }
                return (dstate, side_k, side_v, side_pos), next_tokens

            (dstate, side_k, side_v, _), toks = jax.lax.scan(
                body, (dstate, side_k0, side_v0, side_pos0),
                jnp.arange(steps),
            )
            if steps == 1:
                return toks[0], dstate, side_k, side_v
            return jnp.swapaxes(toks, 0, 1), dstate, side_k, side_v  # (B, steps)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def commit_rows(k, v, side_k, side_v, start_off, active):
            """The dispatch's ONE cache write: scatter every row's side-buffer
            K/V at [start_off, start_off+steps); inactive rows' slots land on
            the trash index (repeated writes, last wins — same semantics as
            the old per-micro-step trash commit). In-place on donation."""
            s = side_k.shape[2]
            trash = k.shape[2] - 1
            idx = jnp.where(
                active[:, None],
                start_off[:, None] + jnp.arange(s)[None, :],
                trash,
            )  # (B, S)
            rows = jnp.arange(k.shape[1])[:, None]
            k = k.at[:, rows, idx].set(side_k)
            v = v.at[:, rows, idx].set(side_v)
            return k, v

        self._prefill_fn = prefill_row
        self._step_fn = step
        self._commit_fn = commit_rows

    # ------------------------------------------------------------------ slots
    def max_prompt_len(self) -> int:
        """Longest admissible prompt: its padded prefill bucket plus at least
        one decode slot (and the trash slot) must fit the serving cache."""
        limit = 0
        for b in PREFILL_BUCKETS:
            if b + 2 <= self.max_context:
                limit = b
        return min(limit + 1, self.max_context - 2)  # +1: the unpadded last token

    def row_capacity_left(self, row: int) -> int:
        """Decode steps remaining before this row hits the cache end (the
        trash slot occupies the final index)."""
        return int(self.max_context - 2 - self.offsets[row])

    def set_row_sampler(
        self, row: int, top_p=1.0, min_p=0.0, temp=1.0, repeat_penalty=1.0,
        frequency_penalty=0.0, presence_penalty=0.0, min_token_id=0,
        top_k=0, seed=None,
    ) -> None:
        self.scalars[row] = [
            top_p, min_p, temp, repeat_penalty, frequency_penalty,
            presence_penalty, float(min_token_id), float(top_k or 0),
        ]
        if seed is not None:
            self._row_keys[row] = np.asarray(jax.random.PRNGKey(int(seed)))
        else:
            self._nonces[row] += 1
            self._row_keys[row] = np.asarray(
                jax.random.fold_in(self._base_key, int(self._nonces[row]) * 997 + row)
            )

    def prefill_row(self, row: int, prompt_ids: Sequence[int]) -> None:
        """Load a prompt into one slot; the final prompt token becomes the
        row's pending token (evaled by its first step)."""
        prompt_ids = [int(t) for t in prompt_ids]
        if len(prompt_ids) > self.max_prompt_len():
            raise ValueError(
                f"prompt too long for the serving cache "
                f"({len(prompt_ids)} > {self.max_prompt_len()})"
            )
        self._nonces[row] += 1
        head, last = prompt_ids[:-1], prompt_ids[-1]
        b = _bucket(max(len(head), 1))
        padded = np.zeros((1, b), np.int32)
        padded[0, : len(head)] = head
        self._k, self._v, self.dstate = self._prefill_fn(
            self.params, self._k, self._v, self.dstate, jnp.asarray(padded),
            jnp.int32(len(prompt_ids)), jnp.int32(last), row,
        )
        self.offsets[row] = len(head)

    # ------------------------------------------------------------------ steps
    def step_async(self, active: Sequence[bool], top_k: int = 0, steps: int = 1):
        """Dispatch one batched ``steps``-token program against the
        device-carried state and return the sampled-token handles WITHOUT
        fetching ((B,) for steps=1, (B, steps) otherwise). Consecutive
        dispatches chain on device; fetch with ``resolve`` one dispatch later
        so the tunnel's per-fetch fee overlaps the next program's compute (and
        amortizes over ``steps`` tokens)."""
        active_arr = np.asarray(active, dtype=bool)
        start_off = self.dstate["off"]  # snapshot BEFORE the step chains it
        tokens, self.dstate, side_k, side_v = self._step_fn(
            self.params,
            self._k,
            self._v,
            self.dstate,
            jnp.asarray(active_arr),
            jnp.asarray(self._row_keys.astype(np.uint32)),
            jnp.asarray(self.scalars),
            top_k=int(top_k) if top_k else 1024,
            steps=int(steps),
            cache_bucket=self._cache_bucket(),
        )
        # the dispatch's single cache write (the step itself reads the cache
        # only); programs execute in dispatch order, so the next step sees
        # the committed rows
        self._k, self._v = self._commit_fn(
            self._k, self._v, side_k, side_v, start_off, jnp.asarray(active_arr)
        )
        self.offsets[active_arr] += steps  # mirror (content arrives at resolve)
        return tokens

    def prewarm(self, steps_list: Sequence[int] = (8,), top_k: int = 1024) -> None:
        """Compile every occupancy-bucket variant of the step + commit
        programs through the REAL dispatch path (keyword static args — an AOT
        lower().compile() hashes to a different program on this backend). An
        all-inactive mask freezes every row's state and routes the side
        buffer to the trash slot, so this is safe to run even mid-session;
        without it, a session growing past a bucket boundary cold-compiles
        for seconds over the device tunnel."""
        inactive = jnp.zeros((self.batch,), bool)
        keys = jnp.asarray(self._row_keys.astype(np.uint32))
        scalars = jnp.asarray(self.scalars)
        buckets = []
        b = 256
        while b < self.max_context:
            buckets.append(b)
            b *= 2
        buckets.append(self.max_context)
        for steps in steps_list:
            for bucket in buckets:
                _, self.dstate, side_k, side_v = self._step_fn(
                    self.params, self._k, self._v, self.dstate, inactive,
                    keys, scalars, top_k=top_k, steps=int(steps),
                    cache_bucket=bucket,
                )
                self._k, self._v = self._commit_fn(
                    self._k, self._v, side_k, side_v,
                    self.dstate["off"], inactive,
                )

    def _cache_bucket(self) -> int:
        """Power-of-two cache-read bound covering every row's occupancy.
        ``offsets`` is the dispatch-time mirror (advanced when a step is
        dispatched, not when it resolves), so it upper-bounds the device-side
        ``off`` of every in-flight program."""
        need = int(self.offsets.max()) if self.offsets.size else 0
        b = 256
        while b < need:
            b *= 2
        return min(b, self.max_context)

    def resolve(self, handles):
        """Fetch dispatched tokens: List[int] for a steps=1 dispatch,
        List[List[int]] (rows × steps) for a multi-step dispatch."""
        return np.asarray(jax.device_get(handles)).tolist()

    def step(self, active: Sequence[bool], top_k: int = 0, steps: int = 1):
        """Synchronous convenience: dispatch + immediate resolve."""
        return self.resolve(self.step_async(active, top_k=top_k, steps=steps))
