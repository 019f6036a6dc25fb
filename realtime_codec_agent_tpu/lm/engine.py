"""Jitted autoregressive decode engine for the duplex LM.

TPU-native replacement for the llama.cpp runtime the reference drives through
``LlamaForAlternatingCodeChannels`` (reference utils/llamacpp_utils.py:26-181):

- static-shape KV cache resident in HBM, written in place (buffer donation);
- bucketed jitted prefill (``eval``) so arbitrary-length teacher forcing hits a
  small fixed set of compiled programs;
- fused eval+sample decode step: one device round-trip per generated token,
  with the llama.cpp sampler chain running on-TPU (ops/sampling.py);
- explicit ``n_tokens`` get/set for KV rollback — the reference's
  ``llm.n_tokens -= 1`` + ``kv_cache_seq_rm`` surgery (llamacpp_utils.py:167-170,
  realtime_agent_v2.py:207-219, 465, 730) becomes a host-side length change;
  stale cache positions are simply overwritten by the next eval and are never
  attended (attention masks by position);
- teacher-forced scoring (``get_logprobs``) as a separate cacheless jitted
  program — the reference needed a SECOND llama.cpp instance with
  ``logits_all=True`` for this (realtime_agent_resources.py:26-33); here the
  same weights serve both roles, halving HBM.
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Generator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import (
    DuplexLMConfig,
    commit_kv,
    forward,
    forward_decode,
    logits_from_hidden,
)
from ..ops.sampling import (
    PENALTY_WINDOW,
    SamplerSettings,
    make_window,
    sample_token,
)

PREFILL_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)
SCORE_CHUNK = 256


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return PREFILL_BUCKETS[-1]


def view_granularity(cache_len: int) -> int:
    """Cache-view bucket size shared by every big-cache attention read
    (fused chunks, gen_until, the frames continuation, the event probe).
    Coarse (4096) by default so only a handful of program variants ever
    compile; ``RTCA_VIEW_GRAN`` overrides for A/B — finer buckets read less
    cache per step but compile more variants."""
    env = os.environ.get("RTCA_VIEW_GRAN")
    if env:
        return max(256, int(env))
    return 4096 if cache_len >= 8192 else max(256, cache_len // 4)


def cache_view_enabled() -> bool:
    """``RTCA_CACHE_VIEW=0`` disables occupancy-bucketed cache views (every
    attention read scans the full cache) for A/B."""
    return os.environ.get("RTCA_CACHE_VIEW", "1") == "1"


def view_buckets(cache_len: int) -> List[int]:
    """Every cache-view variant a session can request over its lifetime:
    each multiple of the granularity below cache_len, plus 0 (= full view).
    Prewarm iterates exactly this list and dispatch-time bucketing
    (``view_bucket_for``) rounds into it — ONE source, so the variants
    prewarmed and the variants live dispatches request cannot diverge
    (divergence reintroduces mid-run cold compiles; CLAUDE.md)."""
    if not cache_view_enabled():
        return [0]
    gran = view_granularity(cache_len)
    return sorted(set(range(gran, cache_len, gran))) + [0]


def view_bucket_for(need: int, cache_len: int) -> int:
    """Round an attention-read bound (tokens the next program may touch) up
    to its cache-view bucket; 0 = read the full cache."""
    if not cache_view_enabled():
        return 0
    gran = view_granularity(cache_len)
    view = ((need + gran - 1) // gran) * gran
    return 0 if view >= cache_len else view


def reachable_views(cache_len: int, max_need: Optional[int] = None) -> List[int]:
    """The view buckets a session whose attention-read bound never exceeds
    ``max_need`` tokens can actually request — prewarming the rest is pure
    wasted compile time (each cold variant is 10-60 s over the tunnel).
    ``None`` = unbounded (the full ``view_buckets`` list). A bench session's
    bound follows from its scripted length + trim policy; open-ended serving
    sessions must pass None."""
    views = view_buckets(cache_len)
    if max_need is None:
        return views
    cap = view_bucket_for(max_need, cache_len)
    if cap == 0:
        return views
    return [v for v in views if v != 0 and v <= cap]


class DuplexLMEngine:
    def __init__(
        self,
        params,
        cfg: DuplexLMConfig,
        seed: Optional[int] = 42,
        kv_slack: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.max_context = cfg.max_context
        cache_len = cfg.max_context + max(kv_slack, PREFILL_BUCKETS[-1])
        kv_shape = (cfg.num_layers, 1, cache_len, cfg.num_kv_heads, cfg.head_dim)
        dtype = jnp.dtype(cfg.compute_dtype)
        self._k = jnp.zeros(kv_shape, dtype)
        self._v = jnp.zeros(kv_shape, dtype)

        self._input_ids: List[int] = []
        self._n_tokens = 0
        self._last_logits = None  # device (V,) f32, logits at the last evaled position
        self._probe_token_ids = None  # (end_audio, agent_speaker, user_speaker)
        self._frame_probs = None  # (p_end, p_agent, p_user) from the last frames call
        self.settings = SamplerSettings(seed=seed)
        self._base_key = jax.random.PRNGKey(seed if seed is not None else 0)
        self._step = 0

        # incremental KV rebuild (context trim amortization): a shadow cache
        # filled a prefill slice at a time while the live cache keeps serving
        self._rb_tokens: Optional[List[int]] = None
        self._rb_progress = 0
        self._rb_k = None
        self._rb_v = None
        self._rb_logits = None

        self._build_jits()

    # ------------------------------------------------------------------ jits
    def _build_jits(self):
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, k, v, tokens, offset, last_idx):
            # read-only-cache forward + ONE in-place commit: XLA aliases the
            # donated cache buffers (the old per-layer update+stack pattern
            # copied the whole ~600 MB cache per call)
            positions = offset + jnp.arange(tokens.shape[1])
            hidden, nk, nv = forward_decode(params, tokens, cfg, k, v, positions)
            k, v = commit_kv(k, v, nk, nv, offset)
            last_h = jax.lax.dynamic_index_in_dim(hidden[0], last_idx, axis=0)
            logits = logits_from_hidden(params, last_h, cfg)[0]
            return logits, k, v

        @functools.partial(jax.jit, static_argnames=("top_k", "cache_view"))
        def decode_step(
            params, k, v, tokens, offset, key, scalars, bias_ids, bias_vals,
            window_ids, window_mask, top_k, cache_view=0,
        ):
            # READ-ONLY cache: the T new K/V commit in a separate donated
            # program (commit_contig), so the attention read slices to the
            # ``cache_view`` occupancy bucket for free — a T<=4 step
            # otherwise streams the ENTIRE static cache through HBM even
            # though positions >= offset are masked (same structure as
            # gen_until and the fused chunk).
            cache_len = k.shape[2]
            if cache_view and cache_view < cache_len:
                k, v = k[:, :, :cache_view], v[:, :, :cache_view]
            positions = offset + jnp.arange(tokens.shape[1])
            hidden, nk, nv = forward_decode(params, tokens, cfg, k, v, positions)
            logits = logits_from_hidden(params, hidden[:, -1], cfg)[0]
            token = sample_token(
                logits, key, scalars, bias_ids, bias_vals, window_ids, window_mask,
                top_k=top_k,
            )
            return token, logits, nk, nv

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def commit_contig(k, v, nk, nv, offset):
            # decode_step's single contiguous cache write (dispatch order
            # makes the next program see it)
            return commit_kv(k, v, nk, nv, offset)

        @functools.partial(jax.jit, static_argnames=("top_k",))
        def resample(logits, key, scalars, bias_ids, bias_vals, window_ids, window_mask, top_k):
            return sample_token(
                logits, key, scalars, bias_ids, bias_vals, window_ids, window_mask,
                top_k=top_k,
            )

        @jax.jit
        def score(params, tokens, targets):
            # tokens/targets: (B, Tb). Per-position logprob of targets under a
            # full causal forward, head applied in chunks to bound memory.
            # Rows are causally independent, so unrelated contexts batch into
            # ONE weight read (finalize_last_response scores its audio-first
            # and text-only contexts together this way).
            hidden, _ = forward(params, tokens, cfg)
            b, tb, h = hidden.shape
            flat_h = hidden.reshape(b * tb, h)
            flat_t = targets.reshape(b * tb)
            n = b * tb
            n_chunks = -(-n // SCORE_CHUNK)
            pad = n_chunks * SCORE_CHUNK - n
            h_p = jnp.pad(flat_h, ((0, pad), (0, 0)))
            t_p = jnp.pad(flat_t, (0, pad))

            def body(carry, blk):
                hb, tgt = blk
                logits = logits_from_hidden(params, hb, cfg)
                lp = jax.nn.log_softmax(logits, axis=-1)
                out = jnp.take_along_axis(lp, tgt[:, None], axis=-1)[:, 0]
                return carry, out

            _, lps = jax.lax.scan(
                body,
                None,
                (
                    h_p.reshape(n_chunks, SCORE_CHUNK, -1),
                    t_p.reshape(n_chunks, SCORE_CHUNK),
                ),
            )
            return lps.reshape(-1)[:n].reshape(b, tb)

        @jax.jit
        def probs_of(logits, ids):
            return jax.nn.softmax(logits)[ids]

        @functools.partial(jax.jit, static_argnames=("cache_view",))
        def event_probe(params, k, v, n_tokens, last_logits, probe_ids, pick_ids, cache_view=0):
            """P(probe trigger) at the last evaled position PLUS a speculative
            one-token lookahead (what follows if probe_ids were appended) in
            ONE read-only program: the cache is NOT donated and the new K/V is
            dropped, so no commit/rollback bookkeeping exists to undo. The
            attention read is sliced to the ``cache_view`` occupancy bucket —
            free on a read-only cache, and it stops the probe from streaming
            the entire static cache through HBM (same trick as the fused
            chunk, lm/duplex_session.py)."""
            cache_len = k.shape[2]
            if cache_view and cache_view < cache_len:
                k, v = k[:, :, :cache_view], v[:, :, :cache_view]
            p_now = jax.nn.softmax(last_logits)[probe_ids[0]]
            hidden, _, _ = forward_decode(
                params, probe_ids[None, :], cfg, k, v, n_tokens[None],
                cache_valid=n_tokens,
            )
            logits2 = logits_from_hidden(params, hidden[:, -1], cfg)[0]
            p_next = jax.nn.softmax(logits2)[pick_ids]
            return jnp.concatenate([p_now[None], p_next])

        @functools.partial(
            jax.jit, static_argnames=("top_k", "max_n", "cache_view")
        )
        def gen_until(
            params, k, v, n_tokens, first_token, base_key, step0,
            scalars, bias_ids, bias_vals, window_ids, window_count,
            stop_id, n_limit, top_k, max_n, cache_view=0,
        ):
            """Jitted multi-token generation (SURVEY §7 hard part 2): up to
            min(max_n, n_limit) sequential eval+sample steps in ONE device
            program, exiting the device loop as soon as stop_id is sampled
            (a bounded while_loop, so short generations don't pay for unused
            steps). K/V accumulates in a small side buffer against the
            READ-ONLY cache; the commit is a SEPARATE donated program
            (commit_contig) so the attention read can be sliced to the
            ``cache_view`` occupancy bucket for free — every step otherwise
            streams the ENTIRE static cache (~600 MB at the default capacity)
            through HBM even though positions >= n_tokens are masked. The
            PRNG/penalty-window schedule is identical to per-token
            eval_and_sample, so results match the stepwise path token-exactly.
            ``n_limit`` is dynamic: one compiled max_n bucket serves any
            remaining-token cap without overshoot."""
            from ..models.llama import forward_decode

            cache_len = k.shape[2]
            if cache_view and cache_view < cache_len:
                k, v = k[:, :, :cache_view], v[:, :, :cache_view]
            rejected = jnp.int32(2**30)
            kv_shape = (cfg.num_layers, 1, max_n, cfg.num_kv_heads, cfg.head_dim)
            dtype = jnp.dtype(cfg.compute_dtype)

            def cond(carry):
                i, _, _, _, _, _, _, done, _, _, _ = carry
                return (~done) & (i < max_n)

            def body(carry):
                i, small_k, small_v, small_pos, tok, wids, wcount, done, hit, last_logits, out_tokens = carry
                pos = n_tokens + i
                wmask = (
                    jnp.arange(PENALTY_WINDOW) >= PENALTY_WINDOW - wcount
                ).astype(jnp.float32)
                hidden, nk, nv = forward_decode(
                    params, tok[None, None], cfg, k, v, pos[None],
                    cache_valid=n_tokens,
                    extra_kv=(small_k, small_v), extra_pos=small_pos,
                )
                logits = logits_from_hidden(params, hidden[:, -1], cfg)[0]
                key = jax.random.fold_in(base_key, step0 + i)
                nxt = sample_token(
                    logits, key, scalars, bias_ids, bias_vals, wids, wmask,
                    top_k=top_k,
                )
                small_k = jax.lax.dynamic_update_slice(small_k, nk, (0, 0, i, 0, 0))
                small_v = jax.lax.dynamic_update_slice(small_v, nv, (0, 0, i, 0, 0))
                small_pos = small_pos.at[i].set(pos)
                # roll the sampled token into the penalty window (stepwise
                # make_window over the growing mirror does the same)
                wids = jnp.concatenate([wids[1:], nxt[None]])
                wcount = jnp.minimum(wcount + 1, PENALTY_WINDOW)
                out_tokens = out_tokens.at[i].set(nxt)
                hit = nxt == stop_id
                done = hit | (i + 1 >= n_limit)
                return (
                    i + 1, small_k, small_v, small_pos, nxt, wids, wcount,
                    done, hit, logits, out_tokens,
                )

            init = (
                jnp.int32(0),
                jnp.zeros(kv_shape, dtype),
                jnp.zeros(kv_shape, dtype),
                jnp.full((max_n,), rejected, jnp.int32),
                first_token,
                window_ids,
                window_count,
                n_limit <= 0,
                jnp.bool_(False),
                jnp.zeros((cfg.vocab_size,), jnp.float32),
                jnp.full((max_n,), -1, jnp.int32),
            )
            n_out, small_k, small_v, small_pos, _, _, _, _, hit, last_logits, out_tokens = (
                jax.lax.while_loop(cond, body, init)
            )
            # executed steps fill small slots [0, n_out) in order, so the
            # commit is CONTIGUOUS at n_tokens (commit_contig aliases the
            # donated cache in place; a scatter commit measured ~12 ms — XLA
            # copies the cache defensively around dynamic indices). The
            # unwritten tail commits zeros at positions >= the new n_tokens:
            # never attended (cache_valid masks), overwritten by later evals.
            return out_tokens, n_out, hit, last_logits, small_k, small_v

        @functools.partial(
            jax.jit, static_argnames=("top_k", "max_frames", "cache_view")
        )
        def frames_until_event(
            params, k, v, n_tokens, prev_pair, user_tokens, base_key, step0,
            scalars, bias_ids, bias_vals, window_ids, window_count,
            end_header, n_limit, probe_ids, top_k, max_frames, cache_view=0,
        ):
            """Audio-frame continuation as ONE program: repeatedly eval the
            pending (agent, user) pair and sample the next agent token,
            stopping when the sample is non-audio (<= end_header: an event)
            or after n_limit frames. Token/step/window/KV semantics are
            IDENTICAL to looping eval_and_sample([pair]) — including that the
            pair evaled at the event frame still commits (the event sample is
            part of the sequence). The duplex agent uses this to finish a
            chunk's remaining frames after an inline event without one host
            round-trip per frame.

            The event-probability probe rides each step as a causally-
            isolated THIRD token (probe_ids[0] = <|end_audio|>, same trick as
            the fused chunk program): its K/V never commit and the last
            active step's P(end_audio) + speaker lookahead come back with the
            result — the agent's end-of-chunk monitor needs no extra
            forward.

            The big cache is READ-ONLY here (the K/V commit is a separate
            donated contiguous program, commit_contig) so the attention read
            slices to the ``cache_view`` occupancy bucket for free — same
            structure as gen_until and the fused chunk."""
            cache_len = k.shape[2]
            if cache_view and cache_view < cache_len:
                k, v = k[:, :, :cache_view], v[:, :, :cache_view]
            kv_shape = (cfg.num_layers, 1, 2 * max_frames, cfg.num_kv_heads, cfg.head_dim)
            dtype = jnp.dtype(cfg.compute_dtype)
            rejected = jnp.int32(2**30)

            def cond(carry):
                i, done = carry[0], carry[-1]
                return (~done) & (i < max_frames)

            def body(carry):
                (i, small_k, small_v, small_pos, n, prev, wids, wcount,
                 out_tokens, last_logits, event_tok, probs3, done) = carry
                positions = n + jnp.arange(3)
                wmask = (
                    jnp.arange(PENALTY_WINDOW) >= PENALTY_WINDOW - wcount
                ).astype(jnp.float32)
                ids3 = jnp.concatenate([prev, probe_ids[:1]])
                hidden, nk, nv = forward_decode(
                    params, ids3[None, :], cfg, k, v, positions,
                    cache_valid=n_tokens,
                    extra_kv=(small_k, small_v), extra_pos=small_pos,
                )
                logits2 = logits_from_hidden(params, hidden[0, 1:3], cfg)
                logits = logits2[0]
                nk = nk[:, :, :2]
                nv = nv[:, :, :2]
                positions = positions[:2]
                key = jax.random.fold_in(base_key, step0 + i)
                a = sample_token(
                    logits, key, scalars, bias_ids, bias_vals, wids, wmask,
                    top_k=top_k,
                )
                # probe scalars for this step: P(end_audio | sample row) and
                # P(speaker | probe row); kept while the scan is active
                sample_probs = jax.nn.softmax(logits)
                probe_probs = jax.nn.softmax(logits2[1])
                new3 = jnp.stack(
                    [sample_probs[probe_ids[0]], probe_probs[probe_ids[1]],
                     probe_probs[probe_ids[2]]]
                )
                probs3 = jnp.where(done, probs3, new3)
                # the evaled pair ALWAYS commits (stepwise eval_and_sample
                # writes K/V before sampling); the probe row never does
                small_k = jax.lax.dynamic_update_slice(small_k, nk, (0, 0, 2 * i, 0, 0))
                small_v = jax.lax.dynamic_update_slice(small_v, nv, (0, 0, 2 * i, 0, 0))
                small_pos = jax.lax.dynamic_update_slice(small_pos, positions, (2 * i,))
                u_next = user_tokens[jnp.minimum(i, max_frames - 1)]
                rolled = jnp.concatenate([wids[2:], jnp.stack([a, u_next])])
                is_audio = a > end_header
                event_now = ~is_audio
                out_tokens = out_tokens.at[i].set(jnp.where(is_audio, a, -1))
                event_tok = jnp.where(event_now, a, event_tok)
                wids = jnp.where(is_audio, rolled, wids)
                wcount = jnp.where(
                    is_audio, jnp.minimum(wcount + 2, PENALTY_WINDOW), wcount
                )
                prev = jnp.where(is_audio, jnp.stack([a, u_next]), prev)
                done = event_now | (i + 1 >= n_limit)
                return (
                    i + 1, small_k, small_v, small_pos, n + 2, prev, wids,
                    wcount, out_tokens, logits, event_tok, probs3, done,
                )

            init = (
                jnp.int32(0),
                jnp.zeros(kv_shape, dtype),
                jnp.zeros(kv_shape, dtype),
                jnp.full((2 * max_frames,), rejected, jnp.int32),
                n_tokens,
                prev_pair,
                window_ids,
                window_count,
                jnp.full((max_frames,), -2, jnp.int32),
                jnp.zeros((cfg.vocab_size,), jnp.float32),
                jnp.int32(-1),
                jnp.zeros((3,), jnp.float32),
                n_limit <= 0,
            )
            (
                i_final, small_k, small_v, small_pos, n_final, prev, wids,
                wcount, out_tokens, last_logits, event_tok, probs3, done,
            ) = jax.lax.while_loop(cond, body, init)
            # executed frames fill small slots [0, 2*i_final) in order: the
            # commit is CONTIGUOUS at the program's n_tokens (see gen_until)
            return (
                out_tokens, i_final, event_tok, last_logits, probs3,
                small_k, small_v,
            )

        self._prefill_fn = prefill
        self._decode_fn = decode_step
        self._commit_contig_fn = commit_contig
        self._resample_fn = resample
        self._score_fn = score
        self._probs_fn = probs_of
        self._event_probe_fn = event_probe
        self._gen_until_fn = gen_until
        self._frames_fn = frames_until_event

    # ----------------------------------------------------------- state mgmt
    def _view_bucket(self, extra: int = 0) -> int:
        """Static attention-read bound for the next gen/frames/probe program:
        n_tokens plus headroom, rounded up to a coarse bucket so only a
        handful of program variants ever compile (0 = read the full cache).
        Those programs read the big cache READ-ONLY — their K/V commits in a
        separate donated program — so the slice is a free view; slicing a
        buffer donated in the SAME program makes XLA copy it defensively
        (round-1 negative result, docs/PERFORMANCE.md). RTCA_CACHE_VIEW=0
        restores the full-cache read for A/B."""
        return view_bucket_for(self._n_tokens + extra + 64, self._k.shape[2])

    @property
    def n_tokens(self) -> int:
        return self._n_tokens

    @n_tokens.setter
    def n_tokens(self, value: int) -> None:
        """KV rollback: later positions become unreachable (masked by position)
        and are overwritten by the next eval — no cache mutation needed."""
        if value < 0 or value > self._n_tokens:
            raise ValueError(f"n_tokens can only be rolled back (got {value}, have {self._n_tokens})")
        self._n_tokens = value
        del self._input_ids[value:]

    def reset(self) -> None:
        self._n_tokens = 0
        self._input_ids = []
        self._last_logits = None
        self._frame_probs = None
        self.rebuild_abort()

    def commit_external_eval(self, tokens: Sequence[int]) -> None:
        """Record tokens that were already evaled on-device by a fused program
        (lm/duplex_session.py) so the host mirror and n_tokens stay in sync."""
        tokens = [int(t) for t in tokens]
        self._input_ids.extend(tokens)
        self._n_tokens += len(tokens)
        self._frame_probs = None

    # -------------------------------------------- incremental cache rebuild
    # Context trims shift RoPE positions (post-trim tokens re-land right
    # after the preserved header, reference realtime_agent_v2.py:725-733), so
    # the trimmed KV must be re-prefilled. Doing that in one blocking call
    # stalls the realtime loop ~0.75 s at full scale. Instead the agent
    # rebuilds into a SHADOW cache one small prefill slice per chunk while
    # the live cache keeps serving, then swaps (agent/agent.py incremental
    # trim). Slices reuse the same compiled bucketed prefill programs (the
    # shadow buffers have identical shapes, so XLA reuses the executables).

    def rebuild_begin(self, tokens: Sequence[int]) -> None:
        """Start an incremental rebuild: ``tokens`` is the full post-trim
        sequence (header + trimmed suffix) to prefill into the shadow cache
        from position 0."""
        if self._rb_k is None:
            self._rb_k = jnp.zeros_like(self._k)
            self._rb_v = jnp.zeros_like(self._v)
        self._rb_tokens = [int(t) for t in tokens]
        self._rb_progress = 0
        self._rb_logits = None

    def rebuild_begin_from_live(self, tokens: Sequence[int], reuse_len: int) -> None:
        """Start an incremental rebuild whose prefix [0, reuse_len) is already
        correct in the LIVE cache — an in-place suffix edit at unchanged RoPE
        positions (the finalize splice, agent/agent.py finalize_last_response;
        reference realtime_agent_v2.py:725-733 recomputes synchronously).
        The shadow starts as a device-side copy of the live buffers (read-only
        on the live cache, ~1 ms HBM-bound at full scale, dispatch-only) and
        only [reuse_len, len(tokens)) is pumped across chunks."""
        tokens = [int(t) for t in tokens]
        if not (0 <= reuse_len <= min(len(tokens), self._n_tokens)):
            raise ValueError(
                f"reuse_len {reuse_len} out of range "
                f"(target {len(tokens)}, live {self._n_tokens})"
            )
        if tokens[:reuse_len] != self._input_ids[:reuse_len]:
            first_bad = next(
                i for i in range(reuse_len) if tokens[i] != self._input_ids[i]
            )
            raise AssertionError(
                "rebuild_begin_from_live: target prefix must match the live "
                f"mirror (first divergence at {first_bad}/{reuse_len}: "
                f"target {tokens[max(0, first_bad-3):first_bad+3]} vs mirror "
                f"{self._input_ids[max(0, first_bad-3):first_bad+3]}; "
                f"live n_tokens {self._n_tokens}, target len {len(tokens)})"
            )
        self._rb_k = jnp.copy(self._k)
        self._rb_v = jnp.copy(self._v)
        self._rb_tokens = tokens
        self._rb_progress = reuse_len
        self._rb_logits = None

    def rebuild_extend(self, tokens: Sequence[int]) -> None:
        """Append tokens to the rebuild target (sequence grew since begin)."""
        assert self._rb_tokens is not None, "rebuild_extend without rebuild_begin"
        self._rb_tokens.extend(int(t) for t in tokens)

    def rebuild_remaining(self) -> int:
        if self._rb_tokens is None:
            return 0
        return len(self._rb_tokens) - self._rb_progress

    def rebuild_abort(self) -> None:
        self._rb_tokens = None
        self._rb_progress = 0
        self._rb_logits = None

    def rebuild_pump(self, max_tokens: int) -> int:
        """Prefill up to ``max_tokens`` of the rebuild target into the shadow
        cache (dispatch only — nothing is fetched). Returns tokens remaining."""
        assert self._rb_tokens is not None, "rebuild_pump without rebuild_begin"
        budget = min(max_tokens, self.rebuild_remaining())
        while budget > 0:
            chunk = self._rb_tokens[self._rb_progress : self._rb_progress + min(budget, PREFILL_BUCKETS[-1])]
            b = _bucket(len(chunk))
            padded = np.zeros((1, b), dtype=np.int32)
            padded[0, : len(chunk)] = chunk
            self._rb_logits, self._rb_k, self._rb_v = self._prefill_fn(
                self.params,
                self._rb_k,
                self._rb_v,
                jnp.asarray(padded),
                jnp.int32(self._rb_progress),
                jnp.int32(len(chunk) - 1),
            )
            self._rb_progress += len(chunk)
            budget -= len(chunk)
        return self.rebuild_remaining()

    def rebuild_swap(self) -> None:
        """Install the fully-rebuilt shadow cache as the live cache: the
        engine state afterwards is exactly what a blocking ``eval`` of the
        rebuild target from scratch would have produced (mirror, n_tokens,
        last-position logits). The old live cache becomes the next shadow."""
        assert self._rb_tokens is not None and self.rebuild_remaining() == 0, (
            "rebuild_swap before the rebuild finished"
        )
        self._k, self._rb_k = self._rb_k, self._k
        self._v, self._rb_v = self._rb_v, self._v
        self._input_ids = list(self._rb_tokens)
        self._n_tokens = len(self._rb_tokens)
        self._last_logits = self._rb_logits
        self._frame_probs = None
        self._rb_tokens = None
        self._rb_progress = 0
        self._rb_logits = None

    # ------------------------------------------------------------- sampling
    def init_sampler_for_generate(
        self,
        top_k: int = 40,
        top_p: float = 0.95,
        min_p: float = 0.05,
        temp: float = 0.80,
        repeat_penalty: float = 1.0,
        frequency_penalty: float = 0.0,
        presence_penalty: float = 0.0,
        logit_bias: Optional[dict] = None,
        seed: Optional[int] = None,
        min_token_id: int = 0,
    ) -> None:
        self.settings = SamplerSettings(
            min_token_id=min_token_id,
            top_k=top_k,
            top_p=top_p,
            min_p=min_p,
            temp=temp,
            repeat_penalty=repeat_penalty,
            frequency_penalty=frequency_penalty,
            presence_penalty=presence_penalty,
            logit_bias=tuple((int(k), float(v)) for k, v in (logit_bias or {}).items()),
            seed=seed,
        )
        self._base_key = jax.random.PRNGKey(seed if seed is not None else 0)
        self._step = 0

    def _next_key(self):
        key = jax.random.fold_in(self._base_key, self._step)
        self._step += 1
        return key

    def _device_settings(self):
        """Device copies of the sampler scalars and bias tables, rebuilt only
        when the settings change — the device tunnel charges an RPC per
        host->device upload, so repeated decode/gen calls must not re-upload
        constants (same discipline as DuplexSession._device_settings)."""
        st = self.settings
        key = (
            st.top_k, st.top_p, st.min_p, st.temp, st.repeat_penalty,
            st.frequency_penalty, st.presence_penalty, st.logit_bias,
            st.min_token_id, st.seed,
        )
        if getattr(self, "_dev_settings_key", None) != key:
            self._dev_scalars = st.scalars()
            self._dev_bias = st.bias_arrays()
            self._dev_settings_key = key
        return self._dev_scalars, self._dev_bias

    # ----------------------------------------------------------------- eval
    def eval(self, tokens: Sequence[int]) -> None:
        """Teacher-forced append of tokens at position n_tokens (bucketed prefill)."""
        tokens = [int(t) for t in tokens]
        if not tokens:
            return
        if self._n_tokens + len(tokens) > self.max_context:
            raise RuntimeError(
                f"context overflow: {self._n_tokens} + {len(tokens)} > {self.max_context}"
            )
        pos = 0
        while pos < len(tokens):
            chunk = tokens[pos : pos + PREFILL_BUCKETS[-1]]
            b = _bucket(len(chunk))
            padded = np.zeros((1, b), dtype=np.int32)
            padded[0, : len(chunk)] = chunk
            logits, self._k, self._v = self._prefill_fn(
                self.params,
                self._k,
                self._v,
                jnp.asarray(padded),
                jnp.int32(self._n_tokens),
                jnp.int32(len(chunk) - 1),
            )
            self._last_logits = logits
            self._input_ids.extend(chunk)
            self._n_tokens += len(chunk)
            pos += len(chunk)
        self._frame_probs = None

    def sample(self, idx: Optional[int] = None) -> int:
        """Sample from the logits at the last evaled position."""
        if self._last_logits is None:
            raise RuntimeError("sample() before any eval()")
        scalars, (bias_ids, bias_vals) = self._device_settings()
        window_ids, window_mask = make_window(self._input_ids, PENALTY_WINDOW)
        token = self._resample_fn(
            self._last_logits,
            self._next_key(),
            scalars,
            bias_ids,
            bias_vals,
            window_ids,
            window_mask,
            top_k=self.settings.top_k,
        )
        return int(token)

    def eval_and_sample(self, tokens: Sequence[int]) -> int:
        """Fused eval+sample: ONE device call for the common decode step."""
        tokens = [int(t) for t in tokens]
        if not (1 <= len(tokens) <= 4):
            # uncommon: long teacher-forced run then sample
            self.eval(tokens)
            return self.sample()
        scalars, (bias_ids, bias_vals) = self._device_settings()
        window_ids, window_mask = make_window(
            self._input_ids + tokens, PENALTY_WINDOW
        )
        arr = jnp.asarray(np.array(tokens, dtype=np.int32)[None, :])
        offset = jnp.int32(self._n_tokens)
        token, logits, nk, nv = self._decode_fn(
            self.params,
            self._k,
            self._v,
            arr,
            offset,
            self._next_key(),
            scalars,
            bias_ids,
            bias_vals,
            window_ids,
            window_mask,
            self.settings.top_k,
            cache_view=self._view_bucket(),
        )
        self._k, self._v = self._commit_contig_fn(self._k, self._v, nk, nv, offset)
        self._last_logits = logits
        self._input_ids.extend(tokens)
        self._n_tokens += len(tokens)
        self._frame_probs = None
        return int(token)

    def eval_and_sample_frames(
        self, pending_pair: Sequence[int], user_tokens: Sequence[int],
        max_frames: int = 8, pending_evaled: int = 0,
    ) -> Tuple[List[int], Optional[int]]:
        """Duplex audio-frame continuation in ONE device call: token-exact
        equivalent of

            toks = []
            pair = pending_pair
            for u in user_tokens:
                a = self.eval_and_sample(pair)
                if a <= end_header: return toks, a       # event
                toks.append(a); pair = [a, u]
            return toks, None

        including PRNG/penalty-window/KV/step bookkeeping. ``pending_pair``
        holds the ids the first frame evals; on return the engine state
        matches the loop above exactly (the final sampled token — audio or
        event — is NOT evaled).

        ``pending_evaled=1`` serves the post-event epilogue where only ONE
        appended id (<|audio|>) is unevaled: the pair's first slot must then
        be the LAST ALREADY-EVALED id. The program re-evals it at its own
        position with the cache bound pulled one back — bit-identical K/V
        overwrite themselves, the second slot's logits equal a T=1 eval, and
        the separate eval_and_sample round trip disappears."""
        assert len(pending_pair) == 2
        assert pending_evaled in (0, 1)
        assert 1 <= len(user_tokens) <= max_frames
        if pending_evaled:
            assert self._input_ids and self._input_ids[-1] == int(pending_pair[0]), (
                "pending_evaled=1 requires pending_pair[0] == the last evaled id"
            )
        end_header = getattr(self, "_end_header_token_id", None)
        if end_header is None:
            raise RuntimeError(
                "eval_and_sample_frames needs set_end_header_token_id() first"
            )
        new_ids = [int(t) for t in pending_pair[pending_evaled:]]
        ids = self._input_ids + new_ids
        tail = ids[-PENALTY_WINDOW:]
        window = np.zeros((PENALTY_WINDOW,), np.int32)
        if tail:
            window[-len(tail):] = tail
        ut = np.zeros((max_frames,), np.int32)
        ut[: len(user_tokens)] = [int(t) for t in user_tokens]
        # the riding probe reports on (end_audio, agent, user); without a
        # registration the program still runs (the probe row costs no extra
        # weight reads) but its scalars are not exposed
        probe = self._probe_token_ids or (end_header, 0, 0)
        scalars, (bias_ids, bias_vals) = self._device_settings()
        offset = jnp.int32(self._n_tokens - pending_evaled)
        out, n_evaled, event_tok, last_logits, probs3, small_k, small_v = self._frames_fn(
            self.params,
            self._k,
            self._v,
            offset,
            jnp.asarray(np.array(pending_pair, np.int32)),
            jnp.asarray(ut),
            self._base_key,
            jnp.int32(self._step),
            scalars,
            bias_ids,
            bias_vals,
            jnp.asarray(window),
            jnp.int32(len(tail)),
            jnp.int32(end_header),
            jnp.int32(len(user_tokens)),
            jnp.asarray(np.array(probe, np.int32)),
            self.settings.top_k,
            max_frames,
            cache_view=self._view_bucket(),
        )
        self._k, self._v = self._commit_contig_fn(
            self._k, self._v, small_k, small_v, offset
        )
        out, n_evaled, event_tok, probs3 = jax.device_get(
            (out, n_evaled, event_tok, probs3)
        )
        n_evaled = int(n_evaled)
        hit_event = int(out[n_evaled - 1]) < 0 if n_evaled else False
        accepted = [int(t) for t in out[: n_evaled - 1 if hit_event else n_evaled]]
        evaled = list(new_ids)
        for j in range(n_evaled - 1):
            evaled += [accepted[j], int(ut[j])]
        self._input_ids.extend(evaled)
        self._n_tokens += len(evaled)
        self._step += n_evaled
        self._last_logits = last_logits
        self._frame_probs = (
            tuple(float(x) for x in probs3)
            if self._probe_token_ids is not None
            else None
        )
        return accepted, (int(event_tok) if hit_event else None)

    def prewarm_detours(
        self,
        gen_buckets: Sequence[int] = (32,),
        frames_bucket: Optional[int] = 8,
        include_probe: bool = True,
        include_decode: bool = True,
        decode_top_k: Optional[Sequence[int]] = None,
        deadline: Optional[float] = None,
        progress: Optional[Callable[[str], None]] = None,
        max_need: Optional[int] = None,
        views: Optional[Sequence[int]] = None,
    ) -> Dict[str, object]:
        """Compile every (program x cache-view bucket) variant of the detour
        programs — gen_until, the frames continuation, the event probe — plus
        their separate donated commit, through the REAL dispatch path (AOT
        lower().compile() hashes to a different program; CLAUDE.md). A
        session crossing a view-bucket boundary mid-run must never
        cold-compile. The compute programs read the live cache READ-ONLY and
        run with n_limit=0, so every prewarm execution is a no-op; the commit
        compiles against throwaway buffers (live dispatches donate the real
        ones later — prewarm must not).

        ``decode_top_k`` lists the static top_k values to compile the decode
        step for (top_k is a static arg: each distinct value is its own
        program). Default: just the current ``settings.top_k``. A server whose
        per-request sampler swaps top_k must prewarm every value it expects
        or the first differing request cold-compiles every view bucket.
        ``deadline`` (a ``time.monotonic()`` value) time-boxes the loop PER
        PROGRAM: one view bucket holds ~5 cold compiles at 10-60 s each over
        the tunnel, so a per-bucket check can overshoot a wall-clock budget
        by minutes (this exact overshoot nulled the round-3 driver gate).
        ``progress`` (if given) is called with a short label per PROGRAM —
        supervised benches use it as a liveness signal. ``max_need`` skips
        view buckets a bounded session can never request (see
        ``reachable_views``). Each program is SYNCED (one device_get) before
        the next dispatches: an unbounded in-flight dispatch queue can wedge
        the remote-device tunnel (see models/whisper.init_whisper_params),
        and the sync makes each progress tick mean "the previous compile
        finished", which is what a stall watchdog needs.

        ``views`` (explicit list) overrides the reachable-view derivation —
        DuplexSession.prewarm uses it to interleave fused and detour
        compiles VIEW-MAJOR, so warm coverage grows in usable units.

        Returns ``{"views": [fully-warmed view buckets], "complete": bool}``."""
        import time as _time

        cache_len = self._k.shape[2]
        if views is None:
            views = reachable_views(cache_len, max_need)
        scalars, (bias_ids, bias_vals) = self._device_settings()
        window = jnp.zeros((PENALTY_WINDOW,), jnp.int32)
        zero = jnp.int32(0)
        logits0 = jnp.zeros((self.cfg.vocab_size,), jnp.float32)
        decode_top_k = (
            (self.settings.top_k,) if decode_top_k is None
            else tuple(dict.fromkeys(int(k) for k in decode_top_k))
        )
        complete = True

        def ok(label: str) -> bool:
            nonlocal complete
            if deadline is not None and _time.monotonic() > deadline:
                complete = False
                return False
            if progress is not None:
                progress(label)
            return True

        smalls = {}
        warmed = []
        for view in views:
            view_full = True
            for max_n in gen_buckets:
                if not ok(f"gen{max_n} view={view}"):
                    view_full = False
                    break
                r = self._gen_until_fn(
                    self.params, self._k, self._v, zero, jnp.int32(1),
                    self._base_key, zero, scalars, bias_ids, bias_vals,
                    window, zero, zero, zero, self.settings.top_k, max_n,
                    cache_view=view,
                )
                smalls[max_n] = (r[4], r[5])
                jax.device_get(r[1])
            if frames_bucket and view_full and ok(f"frames view={view}"):
                r = self._frames_fn(
                    self.params, self._k, self._v, zero,
                    jnp.zeros((2,), jnp.int32),
                    jnp.zeros((frames_bucket,), jnp.int32),
                    self._base_key, zero, scalars, bias_ids, bias_vals,
                    window, zero, zero, zero, jnp.zeros((3,), jnp.int32),
                    self.settings.top_k, frames_bucket, cache_view=view,
                )
                smalls[2 * frames_bucket] = (r[5], r[6])
                jax.device_get(r[1])
            elif frames_bucket:
                view_full = False
            if include_probe and view_full and ok(f"probe view={view}"):
                r = self._event_probe_fn(
                    self.params, self._k, self._v, zero, logits0,
                    jnp.zeros((1,), jnp.int32), jnp.zeros((2,), jnp.int32),
                    cache_view=view,
                )
                jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])
            elif include_probe:
                view_full = False
            if include_decode and view_full:
                for tk_val in decode_top_k:
                    for t in (1, 2):  # stepwise eval_and_sample shapes (T=1 / pair)
                        if not ok(f"decode{t} k={tk_val} view={view}"):
                            view_full = False
                            break
                        wid, wmask = make_window([1], PENALTY_WINDOW)
                        r = self._decode_fn(
                            self.params, self._k, self._v,
                            jnp.zeros((1, t), jnp.int32), zero, self._base_key,
                            scalars, bias_ids, bias_vals, wid, wmask,
                            tk_val, cache_view=view,
                        )
                        smalls[f"decode{t}"] = (r[2], r[3])
                        jax.device_get(r[0])
                    if not view_full:
                        break
            elif include_decode:
                view_full = False
            if view_full:
                warmed.append(view)
            if not complete:
                break
        # one throwaway donated pair chained through every distinct commit
        # shape (the writes land in a dead buffer)
        if smalls:
            tk = jnp.zeros(self._k.shape, self._k.dtype)
            tv = jnp.zeros(self._v.shape, self._v.dtype)
            for nk, nv in smalls.values():
                tk, tv = self._commit_contig_fn(tk, tv, nk, nv, zero)
            jax.device_get(tv[0, 0, 0, 0, 0])  # sync before the timed region
        return {"views": warmed, "complete": complete}

    def set_end_header_token_id(self, token_id: int) -> None:
        """Register the audio/event boundary id (tokens > this are codec
        audio) for eval_and_sample_frames."""
        self._end_header_token_id = int(token_id)

    def set_probe_token_ids(self, end_audio_id: int, agent_id: int, user_id: int) -> None:
        """Register the ids the riding event probe reports on (the frames
        program then returns P(end_audio) + speaker lookahead for free)."""
        self._probe_token_ids = (int(end_audio_id), int(agent_id), int(user_id))

    def consume_frame_probs(self):
        """(p_end, p_agent, p_user) from the most recent frames program IF
        nothing has moved the position since; None otherwise. One-shot."""
        probs, self._frame_probs = self._frame_probs, None
        return probs

    def generate_until(
        self, first_token: int, stop_id: int, max_n: int = 64,
        n_limit: Optional[int] = None,
    ) -> Tuple[List[int], bool]:
        """Jitted multi-token generation: eval ``first_token`` (the pending
        appended-not-evaled id) then sample until ``stop_id``,
        ``min(max_n, n_limit)`` tokens, in ONE device call with on-device
        early exit. Token-exact equivalent of looping
        ``eval_and_sample(ids[-1:])`` (same PRNG + penalty-window schedule);
        the final sampled token is returned appended-not-evaled, matching the
        stepwise loop's state shape. ``n_limit`` (dynamic, defaults to max_n)
        caps the accepted tokens without a fresh compile per cap."""
        ids = self._input_ids + [int(first_token)]
        tail = ids[-PENALTY_WINDOW:]
        window = np.zeros((PENALTY_WINDOW,), np.int32)
        if tail:
            window[-len(tail):] = tail
        scalars, (bias_ids, bias_vals) = self._device_settings()
        offset = jnp.int32(self._n_tokens)
        out_tokens, n_out, done, last_logits, small_k, small_v = self._gen_until_fn(
            self.params,
            self._k,
            self._v,
            offset,
            jnp.int32(first_token),
            self._base_key,
            jnp.int32(self._step),
            scalars,
            bias_ids,
            bias_vals,
            jnp.asarray(window),
            jnp.int32(len(tail)),
            jnp.int32(stop_id),
            jnp.int32(max_n if n_limit is None else min(n_limit, max_n)),
            self.settings.top_k,
            max_n,
            cache_view=self._view_bucket(),
        )
        self._k, self._v = self._commit_contig_fn(
            self._k, self._v, small_k, small_v, offset
        )
        out, n, hit = jax.device_get((out_tokens, n_out, done))
        toks = [int(t) for t in out[: int(n)]]
        if not toks:
            return [], False
        # evaled on device: first_token + all sampled except the last
        evaled = [int(first_token)] + toks[:-1]
        self._input_ids.extend(evaled)
        self._n_tokens += len(evaled)
        self._step += len(toks)
        self._last_logits = last_logits
        self._frame_probs = None
        return toks, bool(hit)

    def generate(
        self, tokens: Sequence[int], reset: bool = False
    ) -> Generator[int, None, None]:
        """llama.cpp-style incremental generator: eval `tokens`, then yield a
        sampled token; each further next() evals the previously yielded token
        first (reference llamacpp_utils.py:97-181 usage pattern)."""
        if reset:
            self.reset()
        tokens = list(tokens)
        while True:
            token = self.eval_and_sample(tokens)
            yield token
            tokens = [token]

    # --------------------------------------------------------------- scoring
    def get_logprobs(self, ctx_input_ids: Sequence[int], input_ids: Sequence[int]) -> np.ndarray:
        """Teacher-forced logprobs of input_ids given ctx (aux-LM equivalent,
        reference llamacpp_utils.py:30-37). Cacheless full forward."""
        return self.get_logprobs_batch([(ctx_input_ids, input_ids)])[0]

    def get_logprobs_batch(
        self, pairs: Sequence[Tuple[Sequence[int], Sequence[int]]]
    ) -> List[np.ndarray]:
        """Score several independent (ctx, ids) sequences in ONE forward.
        Rows pad to a shared bucket; causal attention keeps them independent.
        The finalize-response ratio scores both of its contexts this way —
        one weight read and one device round-trip instead of two (the
        reference pays two aux-LM evals, realtime_agent_v2.py:620-692)."""
        for ctx, ids in pairs:
            if len(ctx) < 1:
                raise ValueError(
                    "get_logprobs_batch requires a non-empty ctx per pair "
                    "(an empty ctx would silently score the wrong slice)"
                )
        seqs = [
            [int(t) for t in ctx] + [int(t) for t in ids] for ctx, ids in pairs
        ]
        longest = max(len(s) for s in seqs)
        b = _bucket(longest)
        if longest > b:
            # power-of-two buckets beyond the prefill set: a fresh XLA compile
            # per distinct length would stall realtime events
            b = PREFILL_BUCKETS[-1]
            while b < longest:
                b *= 2
        tokens = np.zeros((len(seqs), b), dtype=np.int32)
        targets = np.zeros((len(seqs), b), dtype=np.int32)
        for i, seq in enumerate(seqs):
            tokens[i, : len(seq)] = seq
            targets[i, : len(seq) - 1] = seq[1:]
        lps = np.asarray(
            self._score_fn(self.params, jnp.asarray(tokens), jnp.asarray(targets))
        )
        outs = []
        for i, (ctx, ids) in enumerate(pairs):
            start = len(ctx) - 1
            outs.append(lps[i, start : start + len(list(ids))])
        return outs

    # ------------------------------------------------------------ logit taps
    def event_probs(
        self, trigger_id: int, next_ids: Sequence[int]
    ) -> Tuple[float, List[float]]:
        """P(trigger) at the last evaled position + P(each of next_ids |
        trigger appended), in ONE device round trip. Read-only: nothing
        commits and no rollback is needed — the equivalent
        last_probs + eval + last_probs + n_tokens-rollback dance costs three
        round trips (the agent's event-probability monitor, reference
        realtime_agent_v2.py:448-466)."""
        if self._last_logits is None:
            raise RuntimeError("no logits available")
        out = np.asarray(
            self._event_probe_fn(
                self.params,
                self._k,
                self._v,
                jnp.int32(self._n_tokens),
                self._last_logits,
                jnp.asarray([int(trigger_id)], jnp.int32),
                jnp.asarray(np.array(next_ids, np.int32)),
                cache_view=self._view_bucket(),
            )
        )
        return float(out[0]), [float(x) for x in out[1:]]

    def last_probs(self, token_ids: Sequence[int]) -> np.ndarray:
        """Softmax probabilities of selected tokens at the last evaled position
        (device-side softmax; only the selected scalars transfer to host)."""
        if self._last_logits is None:
            raise RuntimeError("no logits available")
        ids = jnp.asarray(np.array(token_ids, dtype=np.int32))
        return np.asarray(self._probs_fn(self._last_logits, ids))

    def get_last_logits(self) -> np.ndarray:
        if self._last_logits is None:
            raise RuntimeError("no logits available")
        return np.asarray(self._last_logits)
