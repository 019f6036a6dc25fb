"""Fused device-resident duplex chunk stepping.

The reference processes one 100 ms chunk with ~10 host<->device round-trips:
codec encode, >=5 llama.cpp eval+sample calls, an event-probability read, a
speculative speaker probe, codec decode (reference realtime_agent_v2.py:504-554
call stack; SURVEY.md §3.1 "the per-token host↔device ping-pong is the #1
thing the TPU rebuild eliminates"). This module collapses the entire
pure-audio chunk into ONE jitted XLA program:

    audio_chunk (1600 f32)
      -> streaming codec encode (device-resident 2 s ring context)
      -> lax.scan over frames: eval the (agent, user, <|end_audio|>) triple
         -> sample the agent token (full on-TPU sampler chain); the third
         token IS the speculative speaker probe, riding every step
         causally-isolated (so no separate probe forward exists); halting
         bookkeeping if a non-audio token (an end_audio event) appears
      -> streaming codec decode of the sampled agent tokens (device-resident
         code ring context) with crossfade preroll
    -> (out_audio, out_tokens, user_tokens, event_frame, probs, new state)

Performance structure (v3):
- The big KV cache is READ-ONLY inside the whole fused program
  (models/llama.forward_decode): per-frame K/V accumulate in a small
  (L,1,2F,KH,Dh) carry buffer and commit with ONE scatter in a SEPARATE
  donated program (_commit_chunk). Carrying the full cache through the scan
  copied ~600 MB per frame; and because the fused program never donates the
  cache, the attention read is sliced to an occupancy bucket (cache_view) —
  traffic scales with how full the session is, not with max_context.
- GQA attention never materializes head-repeated cache copies (grouped
  einsum + two-piece softmax).
- The codec quantizer tables (projected codebook, padded transpose,
  half-norms) are precomputed per model, not per chunk.
- PRNG keys derive as fold_in(base_key, step0 + frame) — the SAME schedule
  the stepwise engine uses, so a seeded run produces identical tokens whether
  a chunk executes fused or is replayed step-by-step after an event. The
  penalty window likewise advances per accepted frame on device, matching
  the stepwise window exactly.
- **Chained dispatch**: everything the next chunk needs from this one
  (pending pair, n_tokens, sampler step, penalty window, halted flag) lives
  in a device-resident CHAIN STATE, so back-to-back chunks dispatch without
  waiting for the previous chunk's results. The device tunnel charges ~30 ms
  to fetch any execution output; the pipelined agent overlaps that fetch
  with the next chunk's compute (agent/agent.py pipeline mode). If a chunk
  hits an event, its successor (dispatched speculatively with
  halted=True propagated on device) samples nothing and only encodes its
  audio — the host replays both chunks stepwise and resyncs the chain.

Only the scalars/audio the host needs cross the PCIe/tunnel boundary, once per
chunk. The codec contexts live HERE (on device) when fused stepping is active;
the host-side AudioTokenizer is bypassed for the hot path.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import codec as codec_lib
from ..models.llama import commit_kv_scatter, forward_decode, logits_from_hidden
from ..ops.sampling import PENALTY_WINDOW, sample_token
from .engine import DuplexLMEngine

# sentinel position for rejected (post-event) frame K/V entries: far beyond
# any real position, so position-based masks never attend them
REJECTED_POS = jnp.int32(2**30)


@dataclass
class FusedChunkResult:
    out_tokens: List[int]          # sampled agent tokens per frame (valid < event_frame)
    user_tokens: List[int]         # encoded user tokens per frame (always valid)
    event_frame: int               # first frame whose sample was non-audio (== n_frames if none)
    event_token: int               # the non-audio token sampled at event_frame (undefined if none)
    n_final: int                   # device n_tokens after the chunk
    halted_input: bool             # chunk ran as a no-op because the chain was halted
    p_end_audio: float             # P(<|end_audio|>) at the final evaled position
    p_event_agent: float           # speculative speaker probe: P(agent | end_audio)
    p_event_user: float            # speculative speaker probe: P(user | end_audio)
    audio: Optional[np.ndarray]    # decoded agent audio tail (chunk+preroll), fast path only


class DuplexSession:
    """Owns the fused chunk program + device-resident codec streaming state +
    the chain state for pipelined dispatch.

    Shares the KV cache and sampler state with a DuplexLMEngine; the engine
    remains the source of truth for n_tokens and the host token mirror, and
    ``sync_chain()`` pushes that host truth into the device chain whenever the
    host mutated it (events, trims, resets).
    """

    def __init__(
        self,
        engine: DuplexLMEngine,
        codec_model: codec_lib.JaxCodecModel,
        codec_vocab_start: int,
        end_header_token_id: int,
        end_audio_token_id: int,
        agent_speaker_token_id: int,
        user_speaker_token_id: int,
        chunk_size_samples: int,
        context_secs: float = 2.0,
        preroll_samples: int = 0,
    ):
        self.engine = engine
        self.codec = codec_model
        self.codec_cfg = codec_model.config
        self.codec_vocab_start = codec_vocab_start
        self.end_header_token_id = end_header_token_id
        self.end_audio_token_id = end_audio_token_id
        self.agent_speaker_token_id = agent_speaker_token_id
        self.user_speaker_token_id = user_speaker_token_id

        self.chunk_samples = chunk_size_samples
        self.hop = self.codec_cfg.hop_length
        self.chunk_frames = chunk_size_samples // self.hop
        self.context_samples = int(context_secs * codec_model.sample_rate)
        self.context_frames = self.context_samples // self.hop
        self.preroll_samples = preroll_samples
        self._agent_input_ids: List[int] = []
        self.chain: Optional[Dict] = None
        # set by lm/pair_session.PairCoordinator: two self-play sessions ride
        # one batch-2 program (weight reads shared); None = standalone
        self._pair = None

        self._build_jits()
        # device-resident constants: the tunnel charges an RPC per host->device
        # upload, so the per-chunk dispatch must not re-upload sampler scalars,
        # bias tables, placeholder user tokens, or booleans every 100 ms
        self._ut_zero = jnp.zeros((self.chunk_frames,), jnp.int32)
        self._commit_true = jnp.bool_(True)
        self._commit_false = jnp.bool_(False)
        self._pre_true = jnp.bool_(True)
        self._pre_false = jnp.bool_(False)
        self._dev_settings_key = None
        self.reset()

    # ------------------------------------------------------------------ state
    def reset(self) -> None:
        """Zero the encode ring (silence) and prime the decode ring with
        encoded-silence codes (fixed-context streaming semantics)."""
        if self._pair is not None:
            self._pair.cancel(self)
        self.enc_ctx = jnp.zeros((self.context_samples,), jnp.float32)
        silence_codes = self.codec.encode(np.zeros((1, self.context_samples), np.float32))[0]
        self.dec_ctx = jnp.asarray(silence_codes, jnp.int32)
        self._silence_codes = np.asarray(silence_codes)
        self.chain = None

    def sync_chain(self) -> None:
        """Rebuild the device chain state from the engine's host mirror: the
        pending (appended, unevaled) pair, n_tokens, sampler step, and the
        trailing penalty window (stepwise semantics: the window at the next
        sample covers all mirrored ids including the pending pair)."""
        if self._pair is not None:
            # a buffered pair chunk chains off the CURRENT device chain; it
            # must realize before the host replaces that chain
            self._pair.flush(self)
        eng = self.engine
        ids = self._agent_input_ids
        assert len(ids) >= 2, "chain needs a pending (agent,user) pair"
        tail = ids[-PENALTY_WINDOW:]
        count = len(tail)
        window = np.zeros((PENALTY_WINDOW,), np.int32)
        if count:
            window[-count:] = tail  # right-aligned rolling buffer
        self.chain = {
            "prev_pair": jnp.asarray(ids[-2:], jnp.int32),
            "n": jnp.int32(eng.n_tokens),
            "step": jnp.int32(eng._step),
            "window_ids": jnp.asarray(window),
            "window_count": jnp.int32(count),
            "halted": jnp.bool_(False),
        }

    # ------------------------------------------------------------------- jits
    def _build_jits(self):
        cfg = self.engine.cfg
        ccfg = self.codec_cfg
        chunk_frames = self.chunk_frames
        chunk_samples = self.chunk_samples
        cvs = self.codec_vocab_start
        end_header = self.end_header_token_id
        end_audio = self.end_audio_token_id
        agent_sp = self.agent_speaker_token_id
        user_sp = self.user_speaker_token_id
        preroll = self.preroll_samples
        n_small = 2 * chunk_frames  # small KV buffer entries (one pair per frame)

        def encode_codes(codec_params, codec_tables, enc_ctx, audio_chunk):
            enc_ctx = jnp.concatenate([enc_ctx[chunk_samples:], audio_chunk])
            codes = codec_lib.encode_frames(
                codec_params, enc_ctx[None, :], ccfg, tables=codec_tables
            )[0]
            return enc_ctx, codes[-chunk_frames:].astype(jnp.int32)

        def decode_tail(codec_params, codec_tables, dec_ctx, codes, commit):
            new_ctx = jnp.concatenate([dec_ctx[chunk_frames:], codes])
            audio = codec_lib.decode_frames(
                codec_params, new_ctx[None, :], ccfg, tables=codec_tables
            )[0]
            tail = audio[-(chunk_samples + preroll):]
            dec_ctx = jnp.where(commit, new_ctx, dec_ctx)
            return dec_ctx, tail

        @functools.partial(
            jax.jit,
            static_argnames=("top_k", "cache_view"),
        )
        def fused_chunk(
            params,
            codec_params,
            codec_tables,
            k,
            v,
            chain,          # device chain state dict
            enc_ctx,
            dec_ctx,
            audio_chunk,
            user_tokens_in,  # (chunk_frames,) i32, used iff use_precomputed_tokens
            base_key,
            scalars,
            bias_ids,
            bias_vals,
            commit_decode,
            use_precomputed_tokens,  # DYNAMIC bool scalar (see below)
            top_k,
            cache_view=0,
        ):
            cache_len = k.shape[2]
            trash = cache_len - 4  # rejected frame K/V land here, never attended
            # attention reads only the first cache_view cache entries (a
            # bucketed bound >= the valid length chosen by the host): the
            # one-shot T=3 attention otherwise streams the ENTIRE static
            # cache (~537 MB/frame at 16k context) through HBM even though
            # positions >= n0 are masked. The cache is NOT donated here —
            # the chunk's K/V commit in a separate donated program
            # (_commit_chunk) — so the slice is a free view; donating it
            # made XLA copy the cache defensively around the slice
            # (the round-1 RTCA_CACHE_VIEW negative result).
            if cache_view and cache_view < cache_len:
                k_view = k[:, :, :cache_view]
                v_view = v[:, :, :cache_view]
            else:
                k_view, v_view = k, v
            kv_shape = (cfg.num_layers, 1, n_small, cfg.num_kv_heads, cfg.head_dim)
            dtype = jnp.dtype(cfg.compute_dtype)
            n0 = chain["n"]
            step0 = chain["step"]
            halted_in = chain["halted"]

            # ``use_precomputed_tokens`` is a DYNAMIC flag (round-4 change):
            # the replay-after-event redispatch — whose halted no-op
            # predecessor already advanced the encode ring with this chunk's
            # audio — used to be a SEPARATE static program variant, doubling
            # the fused compile count per cache-view bucket (650 s of cold
            # prewarm killed two driver gates, VERDICT r3). The encoder now
            # always runs and a jnp.where selects: replay dispatches keep
            # the pre-encoded tokens and the untouched encode ring (the
            # throwaway encode costs ~one codec forward on a rare path),
            # fast-path dispatches take the fresh codes. Token- and
            # state-exact either way.
            enc_ctx_new, codes = encode_codes(
                codec_params, codec_tables, enc_ctx, audio_chunk
            )
            user_tokens = jnp.where(
                use_precomputed_tokens, user_tokens_in, codes + cvs
            )  # (chunk_frames,)
            enc_ctx = jnp.where(use_precomputed_tokens, enc_ctx, enc_ctx_new)

            def frame_step(carry, xs):
                (small_k, small_v, small_pos, n, prev, wids, wcount,
                 done, event_tok, probs3) = carry
                i, u_token = xs
                positions = n + jnp.arange(3)
                wmask = (
                    jnp.arange(PENALTY_WINDOW) >= PENALTY_WINDOW - wcount
                ).astype(jnp.float32)
                # the speculative speaker probe rides as a third token
                # (<|end_audio|> one position ahead, reference
                # realtime_agent_v2.py:459-466): the weights are read once per
                # step either way, so probing here deletes the separate
                # full-model probe forward (1 of 6 per chunk). Causality keeps
                # rows 0-1 numerically independent of it, and its K/V is never
                # stored. On the last accepted frame its context (cache +
                # earlier accepted pairs + this pair) and position n+2 match
                # the end-of-chunk probe exactly; earlier frames' probes are
                # simply overwritten.
                ids3 = jnp.concatenate([prev, jnp.array([end_audio], jnp.int32)])
                hidden, nk, nv = forward_decode(
                    params, ids3[None, :], cfg, k_view, v_view, positions,
                    cache_valid=n0,
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
                is_audio = a > end_header
                accept = (~done) & is_audio
                event_now = (~done) & (~is_audio)
                event_tok = jnp.where(event_now, a, event_tok)
                # event-prob + probe scalars for this frame (kept iff active):
                # P(end_audio | sample row) and P(speaker | probe row)
                sample_probs = jax.nn.softmax(logits)
                probe_probs = jax.nn.softmax(logits2[1])
                new3 = jnp.stack(
                    [sample_probs[end_audio], probe_probs[agent_sp], probe_probs[user_sp]]
                )
                probs3 = jnp.where(done, probs3, new3)
                # stash this pair's K/V in the small buffer; rejected entries
                # get the sentinel position so no later query attends them
                small_k = jax.lax.dynamic_update_slice(small_k, nk, (0, 0, 2 * i, 0, 0))
                small_v = jax.lax.dynamic_update_slice(small_v, nv, (0, 0, 2 * i, 0, 0))
                pair_pos = jnp.where(accept, positions, REJECTED_POS)
                small_pos = jax.lax.dynamic_update_slice(small_pos, pair_pos, (2 * i,))
                # penalty window: roll in the (sampled agent, incoming user)
                # pair on accept — identical to the stepwise engine's
                # make_window over the growing mirror
                rolled = jnp.concatenate([wids[2:], jnp.stack([a, u_token])])
                wids = jnp.where(accept, rolled, wids)
                wcount = jnp.where(
                    accept, jnp.minimum(wcount + 2, PENALTY_WINDOW), wcount
                )
                n = jnp.where(accept, n + 2, n)
                done = done | event_now
                prev = jnp.where(accept, jnp.stack([a, u_token]), prev)
                out = jnp.where(accept, a, -1)
                return (
                    small_k, small_v, small_pos, n, prev, wids, wcount,
                    done, event_tok, probs3,
                ), out

            init = (
                jnp.zeros(kv_shape, dtype),
                jnp.zeros(kv_shape, dtype),
                jnp.full((n_small,), REJECTED_POS, jnp.int32),
                n0,
                chain["prev_pair"],
                chain["window_ids"],
                chain["window_count"],
                halted_in,
                jnp.int32(-1),
                jnp.zeros((3,), jnp.float32),
            )
            (
                (small_k, small_v, small_pos, n_final, prev, wids, wcount,
                 done, event_tok, probs3),
                out_tokens,
            ) = jax.lax.scan(frame_step, init, (jnp.arange(chunk_frames), user_tokens))
            event_frame = jnp.argmax(out_tokens < 0).astype(jnp.int32)
            event_frame = jnp.where(jnp.any(out_tokens < 0), event_frame, chunk_frames)
            had_event = (~halted_in) & (event_frame < chunk_frames)

            # event-probability + speaker-probe scalars came out of the frame
            # scan (the probe token rode each frame step; the last active
            # frame's values are exactly the end-of-chunk probe's)
            p_end_audio, p_agent, p_user = probs3[0], probs3[1], probs3[2]

            # the chunk's K/V leave as the side buffer + scatter targets:
            # accepted entries aim at their real positions, rejected at the
            # trash slot past max_context; the caller runs the ONE in-place
            # commit as a separate donated program (keeping this program's
            # cache read-only is what makes the cache_view slice free)
            target_idx = jnp.where(small_pos < REJECTED_POS, small_pos, trash)

            # streaming decode of the agent tokens (fast path only)
            out_codes = jnp.clip(out_tokens - cvs, 0, ccfg.codebook_size - 1)
            dec_ctx, audio_tail = decode_tail(
                codec_params, codec_tables, dec_ctx, out_codes,
                commit_decode & (~halted_in) & (event_frame == chunk_frames),
            )

            new_chain = {
                "prev_pair": prev,
                "n": n_final,
                # steps consumed: one per frame up to and including the event
                # frame; frozen while halted (the host replays stepwise and
                # resyncs). Unused on event paths — resync overwrites it.
                "step": step0
                + jnp.where(
                    halted_in,
                    0,
                    jnp.where(had_event, event_frame + 1, chunk_frames),
                ),
                "window_ids": wids,
                "window_count": wcount,
                "halted": halted_in | had_event,
            }

            # pack every host-bound value into two arrays: each device->host
            # fetch pays a full round trip (PCIe, or worse, a network tunnel),
            # so the whole chunk result must travel in one transfer
            packed_i32 = jnp.concatenate(
                [
                    out_tokens.astype(jnp.int32),
                    user_tokens.astype(jnp.int32),
                    jnp.stack(
                        [event_frame, event_tok, n_final, halted_in.astype(jnp.int32)]
                    ).astype(jnp.int32),
                ]
            )
            packed_f32 = jnp.concatenate(
                [
                    audio_tail.astype(jnp.float32),
                    jnp.stack([p_end_audio, p_agent, p_user]).astype(jnp.float32),
                ]
            )
            return (
                small_k, small_v, target_idx,
                enc_ctx, dec_ctx, new_chain, packed_i32, packed_f32,
            )

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def commit_chunk(k, v, small_k, small_v, target_idx):
            # the chunk's single cache write; programs execute in dispatch
            # order, so the next chunk's (read-only) fused program sees it
            return commit_kv_scatter(k, v, small_k, small_v, target_idx)

        @jax.jit
        def encode_only(codec_params, codec_tables, enc_ctx, audio_chunk):
            return encode_codes(codec_params, codec_tables, enc_ctx, audio_chunk)

        @functools.partial(jax.jit, static_argnames=("commit",))
        def decode_only(codec_params, codec_tables, dec_ctx, codes, commit):
            return decode_tail(codec_params, codec_tables, dec_ctx, codes, commit)

        self._fused_chunk = fused_chunk
        self._commit_chunk = commit_chunk
        self._encode_only = encode_only
        self._decode_only = decode_only

    # ------------------------------------------------------------------ steps
    def encode_chunk(self, audio_chunk: np.ndarray) -> List[int]:
        """Streaming encode of one chunk -> user token ids (advances enc ring)."""
        assert audio_chunk.shape[-1] == self.chunk_samples
        self.enc_ctx, codes = self._encode_only(
            self.codec.params, self.codec.tables, self.enc_ctx,
            jnp.asarray(audio_chunk, jnp.float32),
        )
        return [int(c) + self.codec_vocab_start for c in np.asarray(codes)]

    def decode_chunk(self, token_ids: List[int], commit: bool = True) -> np.ndarray:
        """Streaming decode of one chunk of agent tokens -> audio tail
        (chunk + preroll samples)."""
        codes = jnp.asarray(
            np.clip(np.array(token_ids) - self.codec_vocab_start, 0, self.codec.codebook_size - 1),
            jnp.int32,
        )
        self.dec_ctx, tail = self._decode_only(
            self.codec.params, self.codec.tables, self.dec_ctx, codes, commit
        )
        return np.asarray(tail)

    # --------------------------------------------------------------- dispatch
    def dispatch_chunk(
        self,
        audio_chunk: np.ndarray,
        commit_decode: bool = True,
        user_tokens: Optional[List[int]] = None,
    ):
        """Enqueue this chunk's fused program and return fetchable result
        handles. Standalone sessions launch immediately; paired self-play
        sessions route through the PairCoordinator, which buffers the first
        row and runs BOTH rows in one batch-2 program when the partner
        dispatches (lm/pair_session.py)."""
        if self._pair is not None:
            if self.chain is None:
                self.sync_chain()
            return self._pair.dispatch(self, audio_chunk, commit_decode, user_tokens)
        return self._dispatch_chunk_single(
            audio_chunk, commit_decode=commit_decode, user_tokens=user_tokens
        )

    def _dispatch_chunk_single(
        self,
        audio_chunk: np.ndarray,
        commit_decode: bool = True,
        user_tokens: Optional[List[int]] = None,
    ):
        """Enqueue ONE fused device program for the whole chunk against the
        device chain state and return the packed result handles WITHOUT
        fetching them. The pipelined agent resolves them one chunk later;
        the synchronous path resolves immediately (process_chunk)."""
        eng = self.engine
        if self.chain is None:
            self.sync_chain()
        scalars, (bias_ids, bias_vals) = self._device_settings()
        use_pre = user_tokens is not None
        cache_view = self._cache_view_bucket()
        if use_pre:
            ut = jnp.asarray(np.asarray(user_tokens, np.int32))
        else:
            ut = self._ut_zero  # constant placeholder: no per-chunk upload
        (
            small_k, small_v, target_idx, self.enc_ctx, self.dec_ctx,
            self.chain, packed_i32, packed_f32,
        ) = self._fused_chunk(
            eng.params,
            self.codec.params,
            self.codec.tables,
            eng._k,
            eng._v,
            self.chain,
            self.enc_ctx,
            self.dec_ctx,
            jnp.asarray(audio_chunk, jnp.float32),
            ut,
            eng._base_key,
            scalars,
            bias_ids,
            bias_vals,
            self._commit_true if commit_decode else self._commit_false,
            self._pre_true if use_pre else self._pre_false,
            # static args MUST pass as keywords: static_argnames only
            # canonicalizes keyword calls, so a positional call traces a
            # SEPARATE program from the (keyword-calling) prewarm — measured
            # as 30-60s mid-run XLA compiles the prewarm should have absorbed
            top_k=eng.settings.top_k,
            cache_view=cache_view,
        )
        eng._k, eng._v = self._commit_chunk(
            eng._k, eng._v, small_k, small_v, target_idx
        )
        return packed_i32, packed_f32

    def prewarm(
        self, include_replay: bool = True, deadline: Optional[float] = None,
        progress: Optional[Callable[[str], None]] = None,
        max_need: Optional[int] = None,
    ) -> Dict[str, object]:
        """Compile every fused-chunk program variant (one per cache-view
        bucket; the replay flag is dynamic since round 4) so none of them
        compiles mid-session — a cold XLA compile over the device tunnel
        stalls the realtime loop for tens of seconds. Each variant runs ONCE
        against the live (read-only) caches with a HALTED chain (a no-op by
        construction), because only a real dispatch populates the jit and
        persistent-compilation caches with the exact donation/sharding
        layout the live call uses (AOT lower().compile() hashes to a
        different program). Engine state is untouched.

        ``deadline`` (a ``time.monotonic()`` value) time-boxes the loop PER
        PROGRAM for callers on a wall-clock budget (bench.py): one view
        bucket holds several multi-10s cold compiles, so a per-bucket check
        can overshoot the budget by minutes (the round-3 gate died exactly
        this way). ``max_need`` skips view buckets the session can never
        request because its token count is bounded (a bench session's length
        is scripted; a trimming session is bounded by its context policy) —
        an open-ended production session must keep the default full set
        (CLAUDE.md: never cold-compile on a bucket crossing mid-run).

        ``include_replay`` is kept for API compatibility; the replay variant
        no longer exists as a separate program.

        Returns ``{"views": [...], "complete": bool, "detours": {...}}`` —
        the fused view buckets warmed by THIS call and whether nothing was
        deadline-skipped (detour detail rides along)."""
        import time as _time

        del include_replay  # dynamic flag now; one program covers both paths
        eng = self.engine
        kv_shape = eng._k.shape
        cache_len = kv_shape[2]
        from .engine import reachable_views

        views = reachable_views(cache_len, max_need)
        bias_ids, bias_vals = eng.settings.bias_arrays()
        chain = {
            "prev_pair": jnp.zeros((2,), jnp.int32),
            "n": jnp.int32(2),
            "step": jnp.int32(0),
            "window_ids": jnp.zeros((PENALTY_WINDOW,), jnp.int32),
            "window_count": jnp.int32(0),
            "halted": jnp.bool_(True),
        }
        out = None
        warmed = []
        det_warmed = []
        complete = True
        # VIEW-MAJOR: fused + detour programs of one view bucket compile
        # together before the next bucket starts, so a deadline cut leaves
        # coverage that is USABLE (a session bounded to the warmed buckets
        # runs compile-free) instead of fused-everywhere/detours-nowhere
        # (which is what nulled the round-4 first gate attempt)
        for view in views:
            if deadline is not None and _time.monotonic() > deadline:
                complete = False
                break
            if progress is not None:
                progress(f"fused view={view}")
            # the fused program reads the cache READ-ONLY, so prewarm can
            # run against the engine's live buffers (no throwaway KV
            # allocations); the halted chain makes it a no-op
            out = self._fused_chunk(
                eng.params,
                self.codec.params,
                self.codec.tables,
                eng._k,
                eng._v,
                chain,
                jnp.zeros((self.context_samples,), jnp.float32),
                jnp.zeros((self.context_frames,), jnp.int32),
                jnp.zeros((self.chunk_samples,), jnp.float32),
                jnp.zeros((self.chunk_frames,), jnp.int32),
                eng._base_key,
                eng.settings.scalars(),
                bias_ids,
                bias_vals,
                jnp.bool_(False),
                self._pre_false,
                top_k=eng.settings.top_k,
                cache_view=view,
            )
            jax.device_get(out[-1][-1])
            warmed.append(view)
            det = eng.prewarm_detours(
                deadline=deadline, progress=progress, views=[view],
            )  # agent frames bucket is 8
            det_warmed.extend(det["views"])
            if not det["complete"]:
                complete = False
                break
        # the separate donated commit program compiles against throwaway
        # buffers of the live shapes (engine buffers stay untouched — live
        # dispatches donate them later, prewarm must not)
        if out is not None:
            small_k, small_v, target_idx = out[0], out[1], out[2]
            tk, tv = self._commit_chunk(
                jnp.zeros(kv_shape, eng._k.dtype),
                jnp.zeros(kv_shape, eng._v.dtype),
                small_k, small_v, target_idx,
            )
            jax.device_get(target_idx[-1])
            del tk, tv
        return {
            "views": warmed,
            "complete": complete,
            "detours": {"views": det_warmed, "complete": complete},
        }

    def _device_settings(self):
        """Device copies of the sampler scalars/bias tables, rebuilt only
        when the settings actually change (the agent mutates them around
        events; fast-path chunks reuse the cached arrays)."""
        s = self.engine.settings
        key = (
            s.top_k, s.top_p, s.min_p, s.temp, s.repeat_penalty,
            s.frequency_penalty, s.presence_penalty, s.logit_bias,
            s.min_token_id, s.seed,
        )
        if self._dev_settings_key != key:
            self._dev_scalars = s.scalars()
            self._dev_bias = s.bias_arrays()
            self._dev_settings_key = key
        return self._dev_scalars, self._dev_bias

    def _cache_view_bucket(self) -> int:
        """Static attention-read bound for the next fused chunk: the host
        n_tokens mirror (which may lag one in-flight pipelined chunk) plus
        slack, rounded up to a coarse bucket so only a handful of program
        variants ever compile. 0 = read the full cache.

        Round-1 history: with the commit INSIDE the fused program the cache
        had to be donated, and slicing a donated buffer made XLA copy it
        defensively (net +0.8 ms — the old default-off). The commit now runs
        as a separate donated program (_commit_chunk) and this program's
        cache is read-only, so the slice is a free view; RTCA_CACHE_VIEW=0
        restores the full-cache read for A/B."""
        from .engine import view_bucket_for

        need = self.engine.n_tokens + 4 * self.chunk_frames + 64
        return view_bucket_for(need, self.engine._k.shape[2])

    def resolve(self, handles) -> Tuple[FusedChunkResult, int]:
        """Fetch a dispatched chunk's packed results (ONE batched host
        transfer) and advance the engine's sampler-step counter for the
        frames the fused program consumed. Under pairing the handles may be a
        LazyHandles (buffered, not yet launched): resolving it directly means
        dispatch and fetch are adjacent on one thread, so flush immediately —
        waiting for a partner dispatch that can't arrive would stall."""
        if hasattr(handles, "wait_and_get"):
            ints, floats = handles.wait_and_get(immediate=True)
        else:
            ints, floats = jax.device_get(handles)
        cf = self.chunk_frames
        event_frame = int(ints[2 * cf])
        halted_input = bool(ints[2 * cf + 3])
        eng = self.engine
        if not halted_input:
            if event_frame == cf:
                eng._step += cf
            # event path: _step untouched — the stepwise replay re-derives the
            # exact same keys (fold_in(base_key, step + i)) frame by frame
        out = FusedChunkResult(
            out_tokens=[int(t) for t in ints[:cf]],
            user_tokens=[int(t) for t in ints[cf : 2 * cf]],
            event_frame=event_frame,
            event_token=int(ints[2 * cf + 1]),
            n_final=int(ints[2 * cf + 2]),
            halted_input=halted_input,
            p_end_audio=float(floats[-3]),
            p_event_agent=float(floats[-2]),
            p_event_user=float(floats[-1]),
            audio=floats[:-3] if (event_frame == cf and not halted_input) else None,
        )
        return out, out.n_final

    def process_chunk(
        self,
        audio_chunk: np.ndarray,
        commit_decode: bool = True,
        user_tokens: Optional[List[int]] = None,
    ) -> Tuple[FusedChunkResult, int]:
        """Synchronous fused chunk: dispatch + immediate resolve. The chain is
        resynced from the host mirror first (the host may have mutated state
        since the last fused chunk)."""
        self.sync_chain()
        handles = self.dispatch_chunk(
            audio_chunk, commit_decode=commit_decode, user_tokens=user_tokens
        )
        return self.resolve(handles)

    def _pending_pair(self) -> List[int]:
        """The agent sequence's last two appended-but-unevaled ids."""
        ids = self._agent_input_ids
        return ids[-2:]

    def bind_sequence(self, input_ids: List[int]) -> None:
        self._agent_input_ids = input_ids

    def _mirror_ids(self) -> List[int]:
        return self._agent_input_ids
