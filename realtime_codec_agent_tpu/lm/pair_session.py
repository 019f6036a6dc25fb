"""Paired fused chunks: two self-play sessions in ONE device program.

Dual-agent self-play runs two full duplex agents on one chip
(inference_client_self_play.py; the reference instead pins two llama.cpp
processes to separate GPUs, inference_client_self_play.py:148-159). Each
agent's fused chunk is weight-read-bound — the whole 1B model streams
through HBM for 3 tokens per frame — so two agents issued as independent
programs pay that read twice per 100 ms. This module rides BOTH agents'
chunks through one program built on models/llama.forward_decode_pair: the
weight matmuls batch over the two rows (one read), attention stays per-row
against each engine's own cache, and the per-row outputs are packed in
exactly the single program's layout so ``DuplexSession.resolve`` parses
them unchanged.

Pairing is a pure scheduling overlay — token streams are bit-identical to
the unpaired sessions (pinned by tests/test_pair_session.py):

- ``PairCoordinator.dispatch`` BUFFERS the first row's chunk and launches the
  pair program when the second row dispatches (the self-play loop alternates
  A, B, A, B, so steady state pairs every chunk). The buffering row gets
  back a :class:`LazyHandles` whose fetch blocks until launch — which is
  exactly the pipelined agent's cadence (it resolves chunk t only after
  dispatching t+1).
- Any same-row re-dispatch, chain resync, event/halted resolve, or session
  reset first FLUSHES the buffered chunk through the row's own single
  program (``DuplexSession._dispatch_chunk_single``), so every path the
  agent can take — events, trims, detours, drains — sees the exact
  single-session semantics it was built against. A fetch-side timeout
  flushes the final in-flight chunk at session drain.
- Rows that can't ride together (different top_k, mixed precomputed-token
  modes during warm-in) fall back to single dispatches for that chunk.
"""
from __future__ import annotations

import functools
import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import codec as codec_lib
from ..models.llama import forward_decode_pair, logits_from_hidden
from ..ops.sampling import PENALTY_WINDOW, sample_token
from .duplex_session import REJECTED_POS, DuplexSession


class LazyHandles:
    """Fetchable placeholder for a buffered (not yet launched) pair dispatch.

    ``wait_and_get`` blocks until the coordinator launches (partner dispatch)
    or flushes the row; after ``timeout`` seconds it flushes the row itself —
    that only triggers at session drain, where the main thread is parked in
    ``future.result()`` and cannot race the flush."""

    def __init__(self, coord: "PairCoordinator", session: DuplexSession):
        self._coord = coord
        self._session = session
        self._event = threading.Event()
        self._handles = None

    def set(self, handles) -> None:
        self._handles = handles
        self._event.set()

    def cancel(self, chunk_frames: int, tail_samples: int) -> None:
        """Session reset dropped this chunk: synthesize a halted no-op result
        so a straggling fetch parses cleanly instead of running device work
        against post-reset state."""
        ints = np.zeros((2 * chunk_frames + 4,), np.int32)
        ints[2 * chunk_frames] = chunk_frames  # event_frame = n_frames
        ints[2 * chunk_frames + 3] = 1         # halted_input
        floats = np.zeros((tail_samples + 3,), np.float32)
        self.set((ints, floats))

    def wait_and_get(self, timeout: float = 2.0, immediate: bool = False):
        """``immediate=True`` (the synchronous resolve path, where dispatch and
        fetch are adjacent on one thread so no partner dispatch can arrive
        while we block) flushes a still-buffered chunk instead of waiting."""
        if immediate and not self._event.is_set():
            self._coord.flush_lazy(self)
        if not self._event.wait(timeout):
            self._coord.flush_lazy(self)
            self._event.wait()
        return jax.device_get(self._handles)


class PairCoordinator:
    """Owns the pair program for two DuplexSessions over shared weights."""

    def __init__(self, session_a: DuplexSession, session_b: DuplexSession):
        if session_a.engine.params is not session_b.engine.params:
            raise ValueError("paired sessions must share one weight pytree")
        if session_a.engine._k.shape != session_b.engine._k.shape:
            raise ValueError("paired sessions must share the KV-cache geometry")
        for attr in ("chunk_samples", "chunk_frames", "context_samples",
                     "context_frames", "preroll_samples", "codec_vocab_start"):
            if getattr(session_a, attr) != getattr(session_b, attr):
                raise ValueError(f"paired sessions disagree on {attr}")
        if session_a.codec is not session_b.codec:
            raise ValueError("paired sessions must share the codec model")
        self.sessions = (session_a, session_b)
        self._lock = threading.RLock()
        self._buffered: Optional[Dict] = None
        self.paired_dispatches = 0
        self.single_dispatches = 0
        self._build_pair_jit(session_a)
        for s in self.sessions:
            s._pair = self

    # ------------------------------------------------------------------ jit
    def _build_pair_jit(self, s: DuplexSession):
        cfg = s.engine.cfg
        ccfg = s.codec_cfg
        chunk_frames = s.chunk_frames
        chunk_samples = s.chunk_samples
        cvs = s.codec_vocab_start
        end_header = s.end_header_token_id
        end_audio = s.end_audio_token_id
        agent_sp = s.agent_speaker_token_id
        user_sp = s.user_speaker_token_id
        preroll = s.preroll_samples
        n_small = 2 * chunk_frames

        @functools.partial(
            jax.jit, static_argnames=("top_k", "use_precomputed_tokens", "cache_view")
        )
        def fused_pair(
            params, codec_params, codec_tables,
            k_a, v_a, k_b, v_b,
            chain_a, chain_b,
            enc_ctx, dec_ctx,            # (2, ctx_samples), (2, ctx_frames)
            audio, user_tokens_in,       # (2, chunk_samples), (2, chunk_frames)
            base_keys,                   # (2, key)
            scalars, bias_ids, bias_vals,  # (2, ...) stacked per row
            commit_decode,               # (2,) bool
            top_k, use_precomputed_tokens, cache_view=0,
        ):
            cache_len = k_a.shape[2]
            trash = cache_len - 4
            if cache_view and cache_view < cache_len:
                k_views = (k_a[:, :, :cache_view], k_b[:, :, :cache_view])
                v_views = (v_a[:, :, :cache_view], v_b[:, :, :cache_view])
            else:
                k_views, v_views = (k_a, k_b), (v_a, v_b)
            kv_shape = (cfg.num_layers, 2, n_small, cfg.num_kv_heads, cfg.head_dim)
            dtype = jnp.dtype(cfg.compute_dtype)

            def srow(key):
                return jnp.stack([chain_a[key], chain_b[key]])

            n0 = srow("n")                    # (2,)
            step0 = srow("step")
            halted_in = srow("halted")
            prev0 = srow("prev_pair")          # (2, 2)
            wids0 = srow("window_ids")         # (2, W)
            wcount0 = srow("window_count")

            if use_precomputed_tokens:
                user_tokens = user_tokens_in   # (2, F); rings already advanced
            else:
                enc_ctx = jnp.concatenate(
                    [enc_ctx[:, chunk_samples:], audio], axis=1
                )
                codes = codec_lib.encode_frames(
                    codec_params, enc_ctx, ccfg, tables=codec_tables
                )
                user_tokens = codes[:, -chunk_frames:].astype(jnp.int32) + cvs

            def frame_step(carry, xs):
                (small_k, small_v, small_pos, n, prev, wids, wcount,
                 done, event_tok, probs3) = carry
                i, u_tok = xs                  # u_tok (2,)
                positions = n[:, None] + jnp.arange(3)[None, :]   # (2, 3)
                wmask = (
                    jnp.arange(PENALTY_WINDOW)[None, :]
                    >= PENALTY_WINDOW - wcount[:, None]
                ).astype(jnp.float32)
                ids3 = jnp.concatenate(
                    [prev, jnp.full((2, 1), end_audio, jnp.int32)], axis=1
                )
                hidden, nk, nv = forward_decode_pair(
                    params, ids3, cfg, k_views, v_views, positions,
                    cache_valid=n0,
                    extra_kv=(small_k, small_v), extra_pos=small_pos,
                )
                logits2 = logits_from_hidden(params, hidden[:, 1:3], cfg)  # (2,2,V)
                keys = jax.vmap(jax.random.fold_in)(base_keys, step0 + i)
                a = jax.vmap(
                    lambda lg, key, sc, bi, bv, wi, wm: sample_token(
                        lg, key, sc, bi, bv, wi, wm, top_k=top_k
                    )
                )(logits2[:, 0], keys, scalars, bias_ids, bias_vals, wids, wmask)
                is_audio = a > end_header
                accept = (~done) & is_audio
                event_now = (~done) & (~is_audio)
                event_tok = jnp.where(event_now, a, event_tok)
                sample_probs = jax.nn.softmax(logits2[:, 0], axis=-1)  # (2, V)
                probe_probs = jax.nn.softmax(logits2[:, 1], axis=-1)
                new3 = jnp.stack(
                    [
                        sample_probs[:, end_audio],
                        probe_probs[:, agent_sp],
                        probe_probs[:, user_sp],
                    ],
                    axis=1,
                )  # (2, 3)
                probs3 = jnp.where(done[:, None], probs3, new3)
                nk = nk[:, :, :2]
                nv = nv[:, :, :2]
                positions = positions[:, :2]
                small_k = jax.lax.dynamic_update_slice(small_k, nk, (0, 0, 2 * i, 0, 0))
                small_v = jax.lax.dynamic_update_slice(small_v, nv, (0, 0, 2 * i, 0, 0))
                pair_pos = jnp.where(accept[:, None], positions, REJECTED_POS)
                small_pos = jax.lax.dynamic_update_slice(small_pos, pair_pos, (0, 2 * i))
                rolled = jnp.concatenate(
                    [wids[:, 2:], jnp.stack([a, u_tok], axis=1)], axis=1
                )
                wids = jnp.where(accept[:, None], rolled, wids)
                wcount = jnp.where(
                    accept, jnp.minimum(wcount + 2, PENALTY_WINDOW), wcount
                )
                n = jnp.where(accept, n + 2, n)
                done = done | event_now
                prev = jnp.where(accept[:, None], jnp.stack([a, u_tok], axis=1), prev)
                out = jnp.where(accept, a, -1)
                return (
                    small_k, small_v, small_pos, n, prev, wids, wcount,
                    done, event_tok, probs3,
                ), out

            init = (
                jnp.zeros(kv_shape, dtype),
                jnp.zeros(kv_shape, dtype),
                jnp.full((2, n_small), REJECTED_POS, jnp.int32),
                n0,
                prev0,
                wids0,
                wcount0,
                halted_in,
                jnp.full((2,), -1, jnp.int32),
                jnp.zeros((2, 3), jnp.float32),
            )
            (
                (small_k, small_v, small_pos, n_final, prev, wids, wcount,
                 done, event_tok, probs3),
                out_tokens,  # (F, 2)
            ) = jax.lax.scan(
                frame_step, init, (jnp.arange(chunk_frames), user_tokens.T)
            )
            out_tokens = out_tokens.T  # (2, F)
            evented = out_tokens < 0
            event_frame = jnp.where(
                jnp.any(evented, axis=1),
                jnp.argmax(evented, axis=1),
                chunk_frames,
            ).astype(jnp.int32)
            had_event = (~halted_in) & (event_frame < chunk_frames)

            target_idx = jnp.where(small_pos < REJECTED_POS, small_pos, trash)

            out_codes = jnp.clip(out_tokens - cvs, 0, ccfg.codebook_size - 1)
            new_dec = jnp.concatenate([dec_ctx[:, chunk_frames:], out_codes], axis=1)
            audio_out = codec_lib.decode_frames(
                codec_params, new_dec, ccfg, tables=codec_tables
            )
            tails = audio_out[:, -(chunk_samples + preroll):]
            dec_commit = commit_decode & (~halted_in) & (event_frame == chunk_frames)
            dec_ctx = jnp.where(dec_commit[:, None], new_dec, dec_ctx)

            step_adv = jnp.where(
                halted_in,
                0,
                jnp.where(had_event, event_frame + 1, chunk_frames),
            )
            new_chains = []
            for r in range(2):
                new_chains.append(
                    {
                        "prev_pair": prev[r],
                        "n": n_final[r],
                        "step": step0[r] + step_adv[r],
                        "window_ids": wids[r],
                        "window_count": wcount[r],
                        "halted": halted_in[r] | had_event[r],
                    }
                )

            packed_i32 = jnp.concatenate(
                [
                    out_tokens.astype(jnp.int32),
                    user_tokens.astype(jnp.int32),
                    jnp.stack(
                        [event_frame, event_tok, n_final, halted_in.astype(jnp.int32)],
                        axis=1,
                    ).astype(jnp.int32),
                ],
                axis=1,
            )  # (2, 2F + 4): row layout == the single program's packed_i32
            packed_f32 = jnp.concatenate(
                [tails.astype(jnp.float32), probs3.astype(jnp.float32)], axis=1
            )  # (2, tail + 3)
            return (
                small_k[:, 0:1], small_v[:, 0:1], target_idx[0],
                small_k[:, 1:2], small_v[:, 1:2], target_idx[1],
                enc_ctx, dec_ctx, new_chains[0], new_chains[1],
                packed_i32[0], packed_f32[0], packed_i32[1], packed_f32[1],
            )

        self._fused_pair = fused_pair

    # ------------------------------------------------------------- dispatch
    def dispatch(
        self,
        session: DuplexSession,
        audio_chunk: np.ndarray,
        commit_decode: bool,
        user_tokens: Optional[List[int]],
    ):
        """Buffer this row's chunk, or launch the pair program if the partner
        is already buffered. Returns fetchable handles either way."""
        with self._lock:
            if self._buffered is not None and self._buffered["session"] is session:
                # partner skipped a turn: the chain input of this new chunk is
                # the buffered chunk's output — realize the old one first
                self._flush_locked()
            entry = {
                "session": session,
                "audio": np.asarray(audio_chunk, np.float32),
                "commit_decode": commit_decode,
                "user_tokens": user_tokens,
                "chain": session.chain,
                "enc": session.enc_ctx,
                "dec": session.dec_ctx,
                "settings": session._device_settings(),
                "top_k": session.engine.settings.top_k,
                "view": session._cache_view_bucket(),
                "lazy": LazyHandles(self, session),
            }
            if self._buffered is None:
                self._buffered = entry
                return entry["lazy"]
            other = self._buffered
            if (
                other["top_k"] != entry["top_k"]
                or (other["user_tokens"] is None) != (user_tokens is None)
            ):
                # incompatible statics (sampler swap mid-event, warm-in mix):
                # this chunk can't ride with the buffered one
                self._flush_locked()
                self._buffered = entry
                return entry["lazy"]
            self._buffered = None
            self._launch(other, entry)
            return entry["lazy"]

    def _launch(self, first: Dict, second: Dict) -> None:
        """Run the pair program for the two buffered rows (coordinator lock
        held). Row order follows self.sessions so cache args stay positional."""
        if first["session"] is self.sessions[0]:
            ra, rb = first, second
        else:
            ra, rb = second, first
        sa, sb = self.sessions
        ea, eb = sa.engine, sb.engine
        use_pre = ra["user_tokens"] is not None
        cf = sa.chunk_frames
        if use_pre:
            ut = jnp.asarray(
                np.stack(
                    [
                        np.asarray(ra["user_tokens"], np.int32),
                        np.asarray(rb["user_tokens"], np.int32),
                    ]
                )
            )
        else:
            ut = jnp.zeros((2, cf), jnp.int32)
        view = 0
        if ra["view"] and rb["view"]:
            view = max(ra["view"], rb["view"])
        scal_a, (bi_a, bv_a) = ra["settings"]
        scal_b, (bi_b, bv_b) = rb["settings"]
        (
            sk_a, sv_a, ti_a, sk_b, sv_b, ti_b,
            enc_out, dec_out, chain_a, chain_b,
            pi_a, pf_a, pi_b, pf_b,
        ) = self._fused_pair(
            ea.params,
            sa.codec.params,
            sa.codec.tables,
            ea._k, ea._v, eb._k, eb._v,
            ra["chain"], rb["chain"],
            jnp.stack([ra["enc"], rb["enc"]]),
            jnp.stack([ra["dec"], rb["dec"]]),
            jnp.stack([jnp.asarray(ra["audio"]), jnp.asarray(rb["audio"])]),
            ut,
            jnp.stack([ea._base_key, eb._base_key]),
            jnp.stack([scal_a, scal_b]),
            jnp.stack([bi_a, bi_b]),
            jnp.stack([bv_a, bv_b]),
            jnp.asarray([ra["commit_decode"], rb["commit_decode"]], bool),
            top_k=ra["top_k"],
            use_precomputed_tokens=use_pre,
            cache_view=view,
        )
        ea._k, ea._v = sa._commit_chunk(ea._k, ea._v, sk_a, sv_a, ti_a)
        eb._k, eb._v = sb._commit_chunk(eb._k, eb._v, sk_b, sv_b, ti_b)
        # rebind per-row streaming state ONLY if the session still holds the
        # captured handles — a replay/resync between buffer and launch owns
        # the state now and this (halted) run's outputs must not clobber it
        if sa.chain is ra["chain"]:
            sa.chain = chain_a
        if sb.chain is rb["chain"]:
            sb.chain = chain_b
        if sa.enc_ctx is ra["enc"]:
            sa.enc_ctx = enc_out[0]
        if sb.enc_ctx is rb["enc"]:
            sb.enc_ctx = enc_out[1]
        if sa.dec_ctx is ra["dec"]:
            sa.dec_ctx = dec_out[0]
        if sb.dec_ctx is rb["dec"]:
            sb.dec_ctx = dec_out[1]
        ra["lazy"].set((pi_a, pf_a))
        rb["lazy"].set((pi_b, pf_b))
        self.paired_dispatches += 1

    # --------------------------------------------------------------- flush
    def flush(self, session: Optional[DuplexSession] = None) -> None:
        """Realize the buffered chunk (if any) through its row's single
        program. ``session`` limits the flush to that row's buffer."""
        with self._lock:
            if self._buffered is None:
                return
            if session is not None and self._buffered["session"] is not session:
                return
            self._flush_locked()

    def _flush_locked(self) -> None:
        entry, self._buffered = self._buffered, None
        s = entry["session"]
        # restore the captured streaming state for the dispatch, then put
        # back whatever the session held if it had moved on (resync/replay)
        cur = (s.chain, s.enc_ctx, s.dec_ctx)
        s.chain, s.enc_ctx, s.dec_ctx = entry["chain"], entry["enc"], entry["dec"]
        handles = s._dispatch_chunk_single(
            entry["audio"],
            commit_decode=entry["commit_decode"],
            user_tokens=entry["user_tokens"],
        )
        if cur[0] is not entry["chain"]:
            s.chain = cur[0]
        if cur[1] is not entry["enc"]:
            s.enc_ctx = cur[1]
        if cur[2] is not entry["dec"]:
            s.dec_ctx = cur[2]
        entry["lazy"].set(handles)
        self.single_dispatches += 1

    def flush_lazy(self, lazy: "LazyHandles") -> None:
        """Realize exactly this handle's chunk if it is the buffered one (the
        row may have buffered a NEWER chunk since — session-keyed flush would
        wrongly realize that one single)."""
        with self._lock:
            if self._buffered is not None and self._buffered["lazy"] is lazy:
                self._flush_locked()

    def cancel(self, session: DuplexSession) -> None:
        """Drop this row's buffered chunk (session reset): straggling fetches
        parse a synthesized halted no-op."""
        with self._lock:
            if self._buffered is not None and self._buffered["session"] is session:
                entry, self._buffered = self._buffered, None
                entry["lazy"].cancel(
                    session.chunk_frames,
                    session.chunk_samples + session.preroll_samples,
                )

    # -------------------------------------------------------------- prewarm
    def prewarm(self) -> None:
        """Compile the pair-program variants through the real dispatch path
        (keyword statics; see DuplexSession.prewarm for why) against halted
        chains — a no-op on the live caches."""
        import os

        sa, sb = self.sessions
        ea, eb = sa.engine, sb.engine
        cache_len = ea._k.shape[2]
        if os.environ.get("RTCA_CACHE_VIEW", "1") != "1":
            views = [0]
        else:
            gran = 4096 if cache_len >= 8192 else max(256, cache_len // 4)
            views = sorted(set(range(gran, cache_len, gran))) + [0]
        halted = {
            "prev_pair": jnp.zeros((2,), jnp.int32),
            "n": jnp.int32(2),
            "step": jnp.int32(0),
            "window_ids": jnp.zeros((PENALTY_WINDOW,), jnp.int32),
            "window_count": jnp.int32(0),
            "halted": jnp.bool_(True),
        }
        scal, (bi, bv) = sa._device_settings()
        cf = sa.chunk_frames
        for view in views:
            for use_pre in (False, True):
                out = self._fused_pair(
                    ea.params, sa.codec.params, sa.codec.tables,
                    ea._k, ea._v, eb._k, eb._v,
                    halted, halted,
                    jnp.zeros((2, sa.context_samples), jnp.float32),
                    jnp.zeros((2, sa.context_frames), jnp.int32),
                    jnp.zeros((2, sa.chunk_samples), jnp.float32),
                    jnp.zeros((2, cf), jnp.int32),
                    jnp.stack([ea._base_key, eb._base_key]),
                    jnp.stack([scal, scal]),
                    jnp.stack([bi, bi]),
                    jnp.stack([bv, bv]),
                    jnp.zeros((2,), bool),
                    top_k=ea.settings.top_k,
                    use_precomputed_tokens=use_pre,
                    cache_view=view,
                )
                jax.device_get(out[-1][-1])


def pair_self_play_sessions(session_a: DuplexSession, session_b: DuplexSession) -> PairCoordinator:
    """Attach a PairCoordinator to two sessions (agents built over
    clone_for_self_play resources share weights+codec by construction)."""
    return PairCoordinator(session_a, session_b)


def pair_self_play_agents(agent_a, agent_b) -> Optional[PairCoordinator]:
    """Pair two self-play RealtimeAgents' fused sessions; returns None when
    either agent lacks a fused session (scripted fakes)."""
    sa = getattr(agent_a, "_session", None)
    sb = getattr(agent_b, "_session", None)
    if sa is None or sb is None:
        return None
    return PairCoordinator(sa, sb)
