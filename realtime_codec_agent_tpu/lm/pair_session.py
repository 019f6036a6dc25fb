"""Grouped fused chunks: R independent duplex sessions in ONE device program.

A duplex agent's fused chunk is weight-read-bound — the whole 1B model
streams through HBM for 3 tokens per frame — so R concurrent sessions issued
as independent programs pay that read R times per 100 ms. This module rides
ALL R sessions' chunks through one program built on
models/llama.forward_decode_pair: the weight matmuls batch over the R rows
(one read), attention stays per-row against each engine's own cache, and the
per-row outputs are packed in exactly the single program's layout so
``DuplexSession.resolve`` parses them unchanged.

Two deployments, with opposite measured outcomes (in-window A/B,
scripts/ab_group_dispatch.py):

- **Duplex serving** (R>=2, ``group_duplex_agents``, the default for
  serving/duplex_server.py): N INDEPENDENT realtime calls on one chip, each
  a full RealtimeAgent with its own KV cache, stream state, events and trims
  — sharing the weight read AND the tunnel's fixed per-fetch fee (one
  combined ``GroupFetch`` per tick instead of one ~30 ms fetch per call).
  Measured at R=4 full scale: 103 vs 117 ms/tick ungrouped. No reference
  counterpart exists (one GPU per call there).
- **Dual-agent self-play** (R=2, ``pair_self_play_agents``, OFF by default):
  cross-fed agents measured SLOWER paired (87 vs 59 ms/tick) — B's chunk-t
  input is A's fetched t-1 output, so the group can never launch until the
  previous group's fetch returns; the device bubbles behind that serial
  chain. Two independent pipelined programs overlap compute with the fetch
  RTTs instead. Kept as an opt-in (``--pair`` / ``--selfplay_pair``).

Grouping is a pure scheduling overlay — token streams are bit-identical to
the ungrouped sessions (pinned by tests/test_pair_session.py):

- ``GroupCoordinator.dispatch`` BUFFERS a row's chunk and launches the group
  program when ALL R rows have dispatched (the driving loop services the
  sessions round-robin, so steady state groups every chunk). A buffering row
  gets back a :class:`LazyHandles` whose fetch blocks until launch — which is
  exactly the pipelined agent's cadence (it resolves chunk t only after
  dispatching t+1).
- Any same-row re-dispatch, chain resync, event/halted resolve, or session
  reset first FLUSHES that row's buffered chunk through its own single
  program (``DuplexSession._dispatch_chunk_single``), so every path the
  agent can take — events, trims, detours, drains — sees the exact
  single-session semantics it was built against. A fetch-side timeout
  flushes the final in-flight chunk at session drain.
- Rows that can't ride together (different top_k, mixed precomputed-token
  modes during warm-in) make the whole buffered set fall back to single
  dispatches for that chunk; steady state is homogeneous.
- All R sessions must be driven from ONE thread (the serving/self-play
  loop); a row that stops dispatching degrades the others to singles, it
  never wedges them.
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


class GroupFetch:
    """One combined ``device_get`` for ALL rows of a launched group program.

    The tunnel charges a fixed ~25-30 ms per ``device_get`` of an execution's
    outputs, and it charges it PER CALL: R rows fetching their own slices pay
    the fee R times — at R=4 that is the entire 100 ms budget (measured:
    grouped and ungrouped duplex serving both ~118 ms/tick because both made
    4 fetches). The first row's fetch pulls the whole stacked (ints, floats)
    pair in one transfer; the rest read the cached host copy."""

    def __init__(self, handles):
        self._handles = handles
        self._lock = threading.Lock()
        self._host = None

    def row(self, r: int):
        with self._lock:
            if self._host is None:
                self._host = jax.device_get(self._handles)
                self._handles = None
            ints, floats = self._host
        return ints[r], floats[r]


class _GroupRow:
    """A row's view of a GroupFetch (what LazyHandles.set receives at launch)."""

    __slots__ = ("fetch", "r")

    def __init__(self, fetch: GroupFetch, r: int):
        self.fetch = fetch
        self.r = r


class LazyHandles:
    """Fetchable placeholder for a buffered (not yet launched) group dispatch.

    ``wait_and_get`` blocks until the coordinator launches (last row's
    dispatch) or flushes the row; after ``timeout`` seconds it flushes the
    row itself — that only triggers at session drain, where the main thread
    is parked in ``future.result()`` and cannot race the flush."""

    def __init__(self, coord: "GroupCoordinator", session: DuplexSession):
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
            self._coord.timeout_flushes += 1
            self._coord.flush_lazy(self)
            self._event.wait()
        if isinstance(self._handles, _GroupRow):
            return self._handles.fetch.row(self._handles.r)
        return jax.device_get(self._handles)


class GroupCoordinator:
    """Owns the R-row group program for R DuplexSessions over shared weights."""

    def __init__(self, *sessions: DuplexSession):
        if len(sessions) < 2:
            raise ValueError("grouping needs at least two sessions")
        s0 = sessions[0]
        for s in sessions[1:]:
            if s.engine.params is not s0.engine.params:
                raise ValueError("grouped sessions must share one weight pytree")
            if s.engine._k.shape != s0.engine._k.shape:
                raise ValueError("grouped sessions must share the KV-cache geometry")
            for attr in ("chunk_samples", "chunk_frames", "context_samples",
                         "context_frames", "preroll_samples", "codec_vocab_start"):
                if getattr(s, attr) != getattr(s0, attr):
                    raise ValueError(f"grouped sessions disagree on {attr}")
            if s.codec is not s0.codec:
                raise ValueError("grouped sessions must share the codec model")
        self.sessions = tuple(sessions)
        self.n_rows = len(sessions)
        self._lock = threading.RLock()
        # buffered entries keyed by session identity; launch fires when every
        # row has one and their statics agree
        self._buffered: Dict[int, Dict] = {}
        self.paired_dispatches = 0
        self.single_dispatches = 0
        self.timeout_flushes = 0  # 2 s lazy timeouts: should stay 0 outside drains
        self._build_group_jit(s0)
        # device-resident constants (no per-dispatch upload over the tunnel)
        self._ut_zero_group = jnp.zeros(
            (self.n_rows, s0.chunk_frames), jnp.int32
        )
        self._pre_false_group = jnp.zeros((self.n_rows,), bool)
        for s in self.sessions:
            s._pair = self

    # ------------------------------------------------------------------ jit
    def _build_group_jit(self, s: DuplexSession):
        cfg = s.engine.cfg
        ccfg = s.codec_cfg
        R = self.n_rows
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
            jax.jit, static_argnames=("top_k", "cache_view")
        )
        def fused_group(
            params, codec_params, codec_tables,
            k_rows, v_rows,              # tuples of R caches (L, 1, S, KH, Dh)
            chains,                      # tuple of R chain dicts
            enc_ctx, dec_ctx,            # (R, ctx_samples), (R, ctx_frames)
            audio, user_tokens_in,       # (R, chunk_samples), (R, chunk_frames)
            base_keys,                   # (R, key)
            scalars, bias_ids, bias_vals,  # (R, ...) stacked per row
            commit_decode,               # (R,) bool
            use_precomputed_tokens,      # (R,) bool, DYNAMIC per row
            top_k, cache_view=0,
        ):
            cache_len = k_rows[0].shape[2]
            trash = cache_len - 4
            if cache_view and cache_view < cache_len:
                k_views = tuple(k[:, :, :cache_view] for k in k_rows)
                v_views = tuple(v[:, :, :cache_view] for v in v_rows)
            else:
                k_views, v_views = k_rows, v_rows
            kv_shape = (cfg.num_layers, R, n_small, cfg.num_kv_heads, cfg.head_dim)
            dtype = jnp.dtype(cfg.compute_dtype)

            def srow(key):
                return jnp.stack([c[key] for c in chains])

            n0 = srow("n")                    # (R,)
            step0 = srow("step")
            halted_in = srow("halted")
            prev0 = srow("prev_pair")          # (R, 2)
            wids0 = srow("window_ids")         # (R, W)
            wcount0 = srow("window_count")

            # the replay flag is DYNAMIC and per-row (round 4): the encoder
            # always runs, replay rows keep their pre-encoded tokens and
            # untouched encode ring via a select (see DuplexSession's fused
            # program for the rationale — this halves the group-program
            # compile count AND lets mixed replay/fresh rows ride together
            # instead of falling back to single dispatches)
            enc_ctx_new = jnp.concatenate(
                [enc_ctx[:, chunk_samples:], audio], axis=1
            )
            codes = codec_lib.encode_frames(
                codec_params, enc_ctx_new, ccfg, tables=codec_tables
            )
            fresh = codes[:, -chunk_frames:].astype(jnp.int32) + cvs
            pre = use_precomputed_tokens[:, None]
            user_tokens = jnp.where(pre, user_tokens_in, fresh)  # (R, F)
            enc_ctx = jnp.where(pre, enc_ctx, enc_ctx_new)

            def frame_step(carry, xs):
                (small_k, small_v, small_pos, n, prev, wids, wcount,
                 done, event_tok, probs3) = carry
                i, u_tok = xs                  # u_tok (R,)
                positions = n[:, None] + jnp.arange(3)[None, :]   # (R, 3)
                wmask = (
                    jnp.arange(PENALTY_WINDOW)[None, :]
                    >= PENALTY_WINDOW - wcount[:, None]
                ).astype(jnp.float32)
                ids3 = jnp.concatenate(
                    [prev, jnp.full((R, 1), end_audio, jnp.int32)], axis=1
                )
                hidden, nk, nv = forward_decode_pair(
                    params, ids3, cfg, k_views, v_views, positions,
                    cache_valid=n0,
                    extra_kv=(small_k, small_v), extra_pos=small_pos,
                )
                logits2 = logits_from_hidden(params, hidden[:, 1:3], cfg)  # (R,2,V)
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
                sample_probs = jax.nn.softmax(logits2[:, 0], axis=-1)  # (R, V)
                probe_probs = jax.nn.softmax(logits2[:, 1], axis=-1)
                new3 = jnp.stack(
                    [
                        sample_probs[:, end_audio],
                        probe_probs[:, agent_sp],
                        probe_probs[:, user_sp],
                    ],
                    axis=1,
                )  # (R, 3)
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
                jnp.full((R, n_small), REJECTED_POS, jnp.int32),
                n0,
                prev0,
                wids0,
                wcount0,
                halted_in,
                jnp.full((R,), -1, jnp.int32),
                jnp.zeros((R, 3), jnp.float32),
            )
            (
                (small_k, small_v, small_pos, n_final, prev, wids, wcount,
                 done, event_tok, probs3),
                out_tokens,  # (F, R)
            ) = jax.lax.scan(
                frame_step, init, (jnp.arange(chunk_frames), user_tokens.T)
            )
            out_tokens = out_tokens.T  # (R, F)
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
            new_chains = tuple(
                {
                    "prev_pair": prev[r],
                    "n": n_final[r],
                    "step": step0[r] + step_adv[r],
                    "window_ids": wids[r],
                    "window_count": wcount[r],
                    "halted": halted_in[r] | had_event[r],
                }
                for r in range(R)
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
            )  # (R, 2F + 4): row layout == the single program's packed_i32
            packed_f32 = jnp.concatenate(
                [tails.astype(jnp.float32), probs3.astype(jnp.float32)], axis=1
            )  # (R, tail + 3)
            return (
                tuple(small_k[:, r : r + 1] for r in range(R)),
                tuple(small_v[:, r : r + 1] for r in range(R)),
                tuple(target_idx[r] for r in range(R)),
                enc_ctx, dec_ctx, new_chains,
                tuple(packed_i32[r] for r in range(R)),
                tuple(packed_f32[r] for r in range(R)),
            )

        self._fused_group = fused_group

    # ------------------------------------------------------------- dispatch
    def dispatch(
        self,
        session: DuplexSession,
        audio_chunk: np.ndarray,
        commit_decode: bool,
        user_tokens: Optional[List[int]],
    ):
        """Buffer this row's chunk, or launch the group program if every
        other row is already buffered. Returns fetchable handles either way."""
        with self._lock:
            key = id(session)
            if key in self._buffered:
                # this row re-dispatched before the group filled: the chain
                # input of the new chunk is the buffered chunk's output —
                # realize the old one first
                self._flush_entry_locked(key)
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
            self._buffered[key] = entry
            if len(self._buffered) < self.n_rows:
                return entry["lazy"]
            entries = [self._buffered[id(s)] for s in self.sessions]
            if any(e["top_k"] != entries[0]["top_k"] for e in entries[1:]):
                # incompatible statics (sampler swap mid-event): this round
                # can't ride together — realize all as singles. A replay/
                # fresh mix is FINE since round 4 (per-row dynamic flag)
                self._flush_all_locked()
                return entry["lazy"]
            self._buffered.clear()
            self._launch(entries)
            return entry["lazy"]

    def _launch(self, entries: List[Dict]) -> None:
        """Run the group program for the R buffered rows (coordinator lock
        held). ``entries`` is ordered to match self.sessions so the cache
        tuples stay positional."""
        R = self.n_rows
        engines = [s.engine for s in self.sessions]
        cf = self.sessions[0].chunk_frames
        pre_flags = np.array(
            [e["user_tokens"] is not None for e in entries], dtype=bool
        )
        if pre_flags.any():
            ut = jnp.asarray(
                np.stack(
                    [
                        np.asarray(e["user_tokens"], np.int32)
                        if e["user_tokens"] is not None
                        else np.zeros((cf,), np.int32)
                        for e in entries
                    ]
                )
            )
            use_pre = jnp.asarray(pre_flags)
        else:
            ut = self._ut_zero_group
            use_pre = self._pre_false_group
        views = [e["view"] for e in entries]
        view = max(views) if all(views) else 0
        scals, bis, bvs = [], [], []
        for e in entries:
            sc, (bi, bv) = e["settings"]
            scals.append(sc)
            bis.append(bi)
            bvs.append(bv)
        try:
            self._launch_inner(entries, engines, ut, use_pre, view, scals, bis, bvs)
        except Exception:
            # entries already left _buffered: resolve every lazy with a
            # synthesized halted no-op so no fetch thread deadlocks, then
            # let the dispatching row's keep-running machinery handle it
            for e, s in zip(entries, self.sessions):
                e["lazy"].cancel(
                    s.chunk_frames, s.chunk_samples + s.preroll_samples
                )
            raise

    def _launch_inner(self, entries, engines, ut, use_pre, view, scals, bis, bvs) -> None:
        (
            small_ks, small_vs, target_idxs,
            enc_out, dec_out, new_chains,
            packed_is, packed_fs,
        ) = self._fused_group(
            engines[0].params,
            self.sessions[0].codec.params,
            self.sessions[0].codec.tables,
            tuple(e._k for e in engines),
            tuple(e._v for e in engines),
            tuple(e["chain"] for e in entries),
            jnp.stack([e["enc"] for e in entries]),
            jnp.stack([e["dec"] for e in entries]),
            jnp.stack([jnp.asarray(e["audio"]) for e in entries]),
            ut,
            jnp.stack([e._base_key for e in engines]),
            jnp.stack(scals),
            jnp.stack(bis),
            jnp.stack(bvs),
            jnp.asarray([e["commit_decode"] for e in entries], bool),
            use_pre,
            top_k=entries[0]["top_k"],
            cache_view=view,
        )
        group_fetch = GroupFetch((packed_is, packed_fs))
        for r, (s, eng, e) in enumerate(zip(self.sessions, engines, entries)):
            eng._k, eng._v = s._commit_chunk(
                eng._k, eng._v, small_ks[r], small_vs[r], target_idxs[r]
            )
            # rebind per-row streaming state ONLY if the session still holds
            # the captured handles — a replay/resync between buffer and launch
            # owns the state now and this (halted) run's outputs must not
            # clobber it
            if s.chain is e["chain"]:
                s.chain = new_chains[r]
            if s.enc_ctx is e["enc"]:
                s.enc_ctx = enc_out[r]
            if s.dec_ctx is e["dec"]:
                s.dec_ctx = dec_out[r]
            e["lazy"].set(_GroupRow(group_fetch, r))
        self.paired_dispatches += 1

    # --------------------------------------------------------------- flush
    def flush(self, session: Optional[DuplexSession] = None) -> None:
        """Realize buffered chunks through their rows' single programs.
        ``session`` limits the flush to that row's buffer; None flushes all."""
        with self._lock:
            if session is not None:
                if id(session) in self._buffered:
                    self._flush_entry_locked(id(session))
                return
            self._flush_all_locked()

    def flush_lazy(self, lazy: "LazyHandles") -> None:
        """Realize exactly this handle's chunk if it is the buffered one (the
        row may have buffered a NEWER chunk since — session-keyed flush would
        wrongly realize that one single)."""
        with self._lock:
            key = id(lazy._session)
            entry = self._buffered.get(key)
            if entry is not None and entry["lazy"] is lazy:
                self._flush_entry_locked(key)

    def _flush_all_locked(self) -> None:
        for s in self.sessions:
            if id(s) in self._buffered:
                self._flush_entry_locked(id(s))

    def _flush_entry_locked(self, key: int) -> None:
        entry = self._buffered.pop(key)
        s = entry["session"]
        # restore the captured streaming state for the dispatch, then put
        # back whatever the session held if it had moved on (resync/replay)
        cur = (s.chain, s.enc_ctx, s.dec_ctx)
        s.chain, s.enc_ctx, s.dec_ctx = entry["chain"], entry["enc"], entry["dec"]
        try:
            handles = s._dispatch_chunk_single(
                entry["audio"],
                commit_decode=entry["commit_decode"],
                user_tokens=entry["user_tokens"],
            )
        except Exception:
            # a failed flush must still RESOLVE the lazy (a waiter may be
            # parked on it — an unset lazy deadlocks the fetch thread);
            # synthesize a halted no-op and let the error propagate to the
            # flusher, whose keep-running machinery resyncs the chain
            entry["lazy"].cancel(
                s.chunk_frames, s.chunk_samples + s.preroll_samples
            )
            raise
        finally:
            if cur[0] is not entry["chain"]:
                s.chain = cur[0]
            if cur[1] is not entry["enc"]:
                s.enc_ctx = cur[1]
            if cur[2] is not entry["dec"]:
                s.dec_ctx = cur[2]
        entry["lazy"].set(handles)
        self.single_dispatches += 1

    def cancel(self, session: DuplexSession) -> None:
        """Drop this row's buffered chunk (session reset): straggling fetches
        parse a synthesized halted no-op."""
        with self._lock:
            entry = self._buffered.pop(id(session), None)
            if entry is not None:
                entry["lazy"].cancel(
                    session.chunk_frames,
                    session.chunk_samples + session.preroll_samples,
                )

    # -------------------------------------------------------------- prewarm
    def prewarm(self) -> None:
        """Compile the group-program variants through the real dispatch path
        (keyword statics; see DuplexSession.prewarm for why) against halted
        chains — a no-op on the live caches."""
        from .engine import view_buckets

        R = self.n_rows
        s0 = self.sessions[0]
        engines = [s.engine for s in self.sessions]
        cache_len = engines[0]._k.shape[2]
        views = view_buckets(cache_len)
        halted = {
            "prev_pair": jnp.zeros((2,), jnp.int32),
            "n": jnp.int32(2),
            "step": jnp.int32(0),
            "window_ids": jnp.zeros((PENALTY_WINDOW,), jnp.int32),
            "window_count": jnp.int32(0),
            "halted": jnp.bool_(True),
        }
        scal, (bi, bv) = s0._device_settings()
        cf = s0.chunk_frames
        for view in views:
            out = self._fused_group(
                engines[0].params, s0.codec.params, s0.codec.tables,
                tuple(e._k for e in engines),
                tuple(e._v for e in engines),
                tuple(halted for _ in range(R)),
                jnp.zeros((R, s0.context_samples), jnp.float32),
                jnp.zeros((R, s0.context_frames), jnp.int32),
                jnp.zeros((R, s0.chunk_samples), jnp.float32),
                jnp.zeros((R, cf), jnp.int32),
                jnp.stack([e._base_key for e in engines]),
                jnp.stack([scal] * R),
                jnp.stack([bi] * R),
                jnp.stack([bv] * R),
                jnp.zeros((R,), bool),
                self._pre_false_group,
                top_k=engines[0].settings.top_k,
                cache_view=view,
            )
            jax.device_get(out[-1][-1][-1])


# backwards-compatible name: the original two-row deployment
PairCoordinator = GroupCoordinator


def pair_self_play_sessions(session_a: DuplexSession, session_b: DuplexSession) -> GroupCoordinator:
    """Attach a GroupCoordinator to two sessions (agents built over
    clone_for_self_play resources share weights+codec by construction)."""
    return GroupCoordinator(session_a, session_b)


def pair_self_play_agents(agent_a, agent_b) -> Optional[GroupCoordinator]:
    """Pair two self-play RealtimeAgents' fused sessions; returns None when
    either agent lacks a fused session (scripted fakes)."""
    return group_duplex_agents([agent_a, agent_b])


def group_duplex_sessions(sessions: List[DuplexSession]) -> GroupCoordinator:
    """Group R sessions' fused chunks into one batch-R program (duplex
    serving: R concurrent realtime calls on one chip)."""
    return GroupCoordinator(*sessions)


def group_duplex_agents(agents) -> Optional[GroupCoordinator]:
    """Group R RealtimeAgents' fused sessions; returns None when any agent
    lacks a fused session (scripted fakes)."""
    sessions = [getattr(a, "_session", None) for a in agents]
    if any(s is None for s in sessions):
        return None
    return GroupCoordinator(*sessions)
