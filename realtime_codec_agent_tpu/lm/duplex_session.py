"""Fused device-resident duplex chunk stepping.

The reference processes one 100 ms chunk with ~10 host<->device round-trips:
codec encode, >=5 llama.cpp eval+sample calls, an event-probability read, a
speculative speaker probe, codec decode (reference realtime_agent_v2.py:504-554
call stack; SURVEY.md §3.1 "the per-token host↔device ping-pong is the #1
thing the TPU rebuild eliminates"). This module collapses the entire
pure-audio chunk into ONE jitted XLA program:

    audio_chunk (1600 f32)
      -> streaming codec encode (device-resident 2 s ring context)
      -> lax.scan over frames: eval (agent,user) pair -> sample agent token
         (full on-TPU sampler chain), halting bookkeeping if a non-audio token
         (an end_audio event) appears
      -> speculative speaker probe: eval <|end_audio|> one step ahead
      -> streaming codec decode of the sampled agent tokens (device-resident
         code ring context) with crossfade preroll
    -> (out_audio, out_tokens, user_tokens, event_frame, probs, new state)

Performance structure (v2):
- The big KV cache is READ-ONLY inside the scan (models/llama.forward_decode):
  per-frame K/V accumulate in a small (L,1,2F,KH,Dh) carry buffer and commit
  to the donated cache with ONE scatter after the scan. Carrying the full
  cache through the scan copied ~600 MB per frame.
- GQA attention never materializes head-repeated cache copies (grouped
  einsum + two-piece softmax).
- The codec quantizer tables (projected codebook, padded transpose,
  half-norms) are precomputed per model, not per chunk.
- PRNG keys derive as fold_in(base_key, step0 + frame) — the SAME schedule
  the stepwise engine uses, so a seeded run produces identical tokens whether
  a chunk executes fused or is replayed step-by-step after an event.

Only the scalars/audio the host needs cross the PCIe/tunnel boundary, once per
chunk. Event chunks (inline text generation) fall back to the engine's
step-by-step path: the fused call reports the first event frame and the host
replays the chunk exactly (accepted frames' KV was committed at identical
positions; the replay overwrites them with identical values).

The codec contexts live HERE (on device) when fused stepping is active; the
host-side AudioTokenizer is bypassed for the hot path.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import codec as codec_lib
from ..models.llama import commit_kv_scatter, forward_decode, logits_from_hidden
from ..ops.sampling import sample_token
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
    p_end_audio: float             # P(<|end_audio|>) at the final evaled position
    p_event_agent: float           # speculative speaker probe: P(agent | end_audio)
    p_event_user: float            # speculative speaker probe: P(user | end_audio)
    audio: Optional[np.ndarray]    # decoded agent audio tail (chunk+preroll), fast path only


class DuplexSession:
    """Owns the fused chunk program + device-resident codec streaming state.

    Shares the KV cache and sampler state with a DuplexLMEngine; the engine
    remains the source of truth for n_tokens and the host token mirror.
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

        self._build_jits()
        self.reset()

    # ------------------------------------------------------------------ state
    def reset(self) -> None:
        """Zero the encode ring (silence) and prime the decode ring with
        encoded-silence codes (fixed-context streaming semantics)."""
        self.enc_ctx = jnp.zeros((self.context_samples,), jnp.float32)
        silence_codes = self.codec.encode(np.zeros((1, self.context_samples), np.float32))[0]
        self.dec_ctx = jnp.asarray(silence_codes, jnp.int32)
        self._silence_codes = np.asarray(silence_codes)

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
            jax.jit, donate_argnums=(3, 4), static_argnames=("top_k",)
        )
        def fused_chunk(
            params,
            codec_params,
            codec_tables,
            k,
            v,
            n_tokens,
            enc_ctx,
            dec_ctx,
            audio_chunk,
            prev_pair,  # (2,) int32: last (agent, user) ids, already appended but NOT evaled
            base_key,
            step0,
            scalars,
            bias_ids,
            bias_vals,
            window_ids,
            window_mask,
            commit_decode,
            top_k,
        ):
            cache_len = k.shape[2]
            trash = cache_len - 4  # rejected frame K/V land here, never attended
            kv_shape = (cfg.num_layers, 1, n_small, cfg.num_kv_heads, cfg.head_dim)
            dtype = jnp.dtype(cfg.compute_dtype)

            enc_ctx, codes = encode_codes(codec_params, codec_tables, enc_ctx, audio_chunk)
            user_tokens = codes + cvs  # (chunk_frames,)

            def frame_step(carry, xs):
                small_k, small_v, small_pos, n, prev, done, event_tok, last_logits = carry
                i, u_token = xs
                positions = n + jnp.arange(2)
                hidden, nk, nv = forward_decode(
                    params, prev[None, :], cfg, k, v, positions,
                    cache_valid=n_tokens,
                    extra_kv=(small_k, small_v), extra_pos=small_pos,
                )
                logits = logits_from_hidden(params, hidden[:, -1], cfg)[0]
                key = jax.random.fold_in(base_key, step0 + i)
                a = sample_token(
                    logits, key, scalars, bias_ids, bias_vals, window_ids, window_mask,
                    top_k=top_k,
                )
                is_audio = a > end_header
                accept = (~done) & is_audio
                event_now = (~done) & (~is_audio)
                event_tok = jnp.where(event_now, a, event_tok)
                last_logits = jnp.where(done, last_logits, logits)
                # stash this pair's K/V in the small buffer; rejected entries
                # get the sentinel position so no later query attends them
                small_k = jax.lax.dynamic_update_slice(
                    small_k, nk, (0, 0, 2 * i, 0, 0)
                )
                small_v = jax.lax.dynamic_update_slice(
                    small_v, nv, (0, 0, 2 * i, 0, 0)
                )
                pair_pos = jnp.where(accept, positions, REJECTED_POS)
                small_pos = jax.lax.dynamic_update_slice(small_pos, pair_pos, (2 * i,))
                n = jnp.where(accept, n + 2, n)
                done = done | event_now
                prev = jnp.where(accept, jnp.stack([a, u_token]), prev)
                out = jnp.where(accept, a, -1)
                return (small_k, small_v, small_pos, n, prev, done, event_tok, last_logits), out

            init = (
                jnp.zeros(kv_shape, dtype),
                jnp.zeros(kv_shape, dtype),
                jnp.full((n_small,), REJECTED_POS, jnp.int32),
                n_tokens,
                prev_pair,
                jnp.bool_(False),
                jnp.int32(-1),
                jnp.zeros((cfg.vocab_size,), jnp.float32),
            )
            (small_k, small_v, small_pos, n_final, prev, done, event_tok, last_logits), out_tokens = (
                jax.lax.scan(
                    frame_step, init, (jnp.arange(chunk_frames), user_tokens)
                )
            )
            event_frame = jnp.argmax(out_tokens < 0).astype(jnp.int32)
            event_frame = jnp.where(jnp.any(out_tokens < 0), event_frame, chunk_frames)

            # event-probability head at the final evaled position
            probs = jax.nn.softmax(last_logits)
            p_end_audio = probs[end_audio]

            # speculative speaker probe (reference realtime_agent_v2.py:459-466):
            # eval <|end_audio|> at position n_final against cache + accepted
            # in-chunk K/V; its own K/V is neither stored nor committed
            probe_ids = jnp.array([[end_audio]], jnp.int32)
            probe_hidden, _, _ = forward_decode(
                params, probe_ids, cfg, k, v, n_final[None],
                cache_valid=n_tokens,
                extra_kv=(small_k, small_v), extra_pos=small_pos,
            )
            probe_logits = logits_from_hidden(params, probe_hidden[:, -1], cfg)[0]
            probe_probs = jax.nn.softmax(probe_logits)
            p_agent = probe_probs[agent_sp]
            p_user = probe_probs[user_sp]

            # ONE in-place commit of the chunk's K/V (donated buffers):
            # accepted entries scatter to their real positions, rejected to
            # the trash slot past max_context
            target_idx = jnp.where(small_pos < REJECTED_POS, small_pos, trash)
            k, v = commit_kv_scatter(k, v, small_k, small_v, target_idx)

            # streaming decode of the agent tokens (fast path only)
            out_codes = jnp.clip(out_tokens - cvs, 0, ccfg.codebook_size - 1)
            dec_ctx, audio_tail = decode_tail(
                codec_params, codec_tables, dec_ctx, out_codes,
                commit_decode & (event_frame == chunk_frames),
            )

            # pack every host-bound value into two arrays: each device->host
            # fetch pays a full round trip (PCIe, or worse, a network tunnel),
            # so the whole chunk result must travel in one transfer
            packed_i32 = jnp.concatenate(
                [
                    out_tokens.astype(jnp.int32),
                    user_tokens.astype(jnp.int32),
                    jnp.stack([event_frame, event_tok, n_final]).astype(jnp.int32),
                ]
            )
            packed_f32 = jnp.concatenate(
                [
                    audio_tail.astype(jnp.float32),
                    jnp.stack([p_end_audio, p_agent, p_user]).astype(jnp.float32),
                ]
            )
            return k, v, enc_ctx, dec_ctx, packed_i32, packed_f32

        @jax.jit
        def encode_only(codec_params, codec_tables, enc_ctx, audio_chunk):
            return encode_codes(codec_params, codec_tables, enc_ctx, audio_chunk)

        @functools.partial(jax.jit, static_argnames=("commit",))
        def decode_only(codec_params, codec_tables, dec_ctx, codes, commit):
            return decode_tail(codec_params, codec_tables, dec_ctx, codes, commit)

        self._fused_chunk = fused_chunk
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

    def process_chunk(self, audio_chunk: np.ndarray, commit_decode: bool = True) -> FusedChunkResult:
        """One fused device call for the whole chunk. The engine's prev pair =
        its last two mirrored ids (appended, not yet evaled)."""
        eng = self.engine
        assert len(eng._input_ids) >= eng.n_tokens  # mirror sanity
        prev_pair = np.asarray(self._pending_pair(), dtype=np.int32)
        bias_ids, bias_vals = eng.settings.bias_arrays()
        from ..ops.sampling import PENALTY_WINDOW, make_window

        window_ids, window_mask = make_window(self._mirror_ids(), PENALTY_WINDOW)
        # fold_in(base_key, step0 + frame): the stepwise engine's schedule, so
        # an event replay resamples identical tokens. The engine's step counter
        # is NOT advanced here; the caller advances it by the number of frames
        # actually consumed (commit_sampler_steps).
        step0 = eng._step

        (
            eng._k, eng._v, self.enc_ctx, self.dec_ctx, packed_i32, packed_f32,
        ) = self._fused_chunk(
            eng.params,
            self.codec.params,
            self.codec.tables,
            eng._k,
            eng._v,
            jnp.int32(eng.n_tokens),
            self.enc_ctx,
            self.dec_ctx,
            jnp.asarray(audio_chunk, jnp.float32),
            jnp.asarray(prev_pair),
            eng._base_key,
            jnp.int32(step0),
            eng.settings.scalars(),
            bias_ids,
            bias_vals,
            window_ids,
            window_mask,
            jnp.bool_(commit_decode),
            eng.settings.top_k,
        )
        # ONE batched host fetch for the whole chunk result
        ints, floats = jax.device_get((packed_i32, packed_f32))
        cf = self.chunk_frames
        event_frame = int(ints[2 * cf])
        if event_frame == cf:
            # fast path consumed one sampler step per frame
            eng._step = step0 + cf
        # event path: leave _step at step0 — the stepwise replay re-derives the
        # exact same keys (fold_in(base_key, step0 + i)) frame by frame
        out = FusedChunkResult(
            out_tokens=[int(t) for t in ints[:cf]],
            user_tokens=[int(t) for t in ints[cf : 2 * cf]],
            event_frame=event_frame,
            event_token=int(ints[2 * cf + 1]),
            p_end_audio=float(floats[-3]),
            p_event_agent=float(floats[-2]),
            p_event_user=float(floats[-1]),
            audio=floats[:-3] if event_frame == cf else None,
        )
        return out, int(ints[2 * cf + 2])

    def _pending_pair(self) -> List[int]:
        """The agent sequence's last two appended-but-unevaled ids."""
        ids = self._agent_input_ids
        return ids[-2:]

    def bind_sequence(self, input_ids: List[int]) -> None:
        self._agent_input_ids = input_ids

    def _mirror_ids(self) -> List[int]:
        return self._agent_input_ids
