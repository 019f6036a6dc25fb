"""Incremental finalize-splice absorb (VERDICT r2 item 3).

finalize_last_response splices the live sequence to the text the audio
actually supports (reference realtime_agent_v2.py:620-692) and must then
re-validate the KV suffix (reference realtime_agent_v2.py:725-733 does one
blocking re-eval — the ~820 ms detour tail). With config.incremental_finalize
the splice rides the SAME shadow-rebuild/pump/swap machinery incremental trims
use: the live (pre-splice) cache keeps serving for a deterministic number of
chunks, then the spliced cache swaps in. These tests pin:

- the absorbed cache is numerically identical to a from-scratch prefill,
- cache-coordinate bookkeeping during the stale window (_fused_ready holds),
- sync <-> pipelined token parity through an absorbed finalize,
- the sync-fallback rules (tail-adjacent splices, edits below the splice),
- absorb during an in-flight trim rebuild (re-freeze keeps the trim target).
"""
import dataclasses

import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.agent.resources import RealtimeAgentResources
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
from realtime_codec_agent_tpu.ops.sampling import PENALTY_WINDOW


@pytest.fixture(scope="module")
def resources():
    import jax

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import init_lm_params

    codec = JaxCodecModel.random_init(tiny_codec_config(compute_dtype="float32"), seed=0)
    res = RealtimeAgentResources(
        codec_model=codec, tiny=True, whisper_model=None, seed=0
    )
    cfg = dataclasses.replace(res.lm_config, compute_dtype="float32")
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    res.lm_config = cfg
    res.lm_params = params
    res.llm = DuplexLMEngine(params, cfg)
    res.aux_llm = res.llm
    return res


def make_agent(resources, pipeline: bool, slice_tokens: int = 24, **over):
    kwargs = dict(
        temperature=0.0,
        use_whisper=False,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        # keep the timer-driven finalize out of the scripted runs: the tests
        # call finalize_last_response at controlled chunk boundaries
        finalize_response_after_inactivity_secs=0.0,
        use_fused_step=True,
        pipeline_chunks=pipeline,
        incremental_trim=True,
        trim_rebuild_slice_tokens=slice_tokens,
        max_context_secs=100.0,  # trims off unless a test opts in
        trim_by_secs=0.5,
        seed=11,
    )
    kwargs.update(over)
    config = RealtimeAgentConfig(**kwargs)
    res = resources.clone_for_self_play()
    agent = RealtimeAgent(resources=res, config=config)
    orig = agent.set_sampler

    def pinned(for_trans=False, suppress_end_audio=False):
        orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
        res.llm.settings.min_token_id = res.tokenizer.codec_vocab_start

    agent.set_sampler = pinned
    agent.set_sampler()
    return agent


def chunks(n, seed=3):
    rng = np.random.default_rng(seed)
    return [(rng.normal(size=1600) * 0.1).astype(np.float32) for _ in range(n)]


def splice_audio_values(agent, lo_frame: int, n: int):
    """In-place value change of ``n`` audio tokens starting at frame index
    ``lo_frame`` (diff=0 splice: same machinery, no index shifting needed)."""
    idx = agent.audio_tokens_idx[lo_frame : lo_frame + n]
    cvs = agent.resources.tokenizer.codec_vocab_start
    for i in idx:
        agent.input_ids[i] = cvs + ((agent.input_ids[i] - cvs + 1) % 8)
    return idx[0], idx[-1] + 1


def drive_to_swap(agent, audio, max_chunks=30):
    """Process chunks until the pending rebuild swaps in."""
    for i, c in enumerate(audio[:max_chunks]):
        agent.process_audio(c)
        if agent._trim_rebuild is None:
            return i + 1
    raise AssertionError("rebuild never swapped in")


def inject_response(agent, text: str):
    """Manufacture a completed agent-response event at a chunk boundary the
    way generate_for_response leaves it: ...<|end_audio|> A:<text><|audio|>,
    everything but the trailing <|audio|> evaled, transcript entry appended
    with text_start_pos at the speaker token (finalize reads entry pos + 2 as
    the first token of ``" " + text``)."""
    llm = agent.resources.llm
    tok = agent.resources.tokenizer
    llm.eval(agent.input_ids[-2:])  # the pending audio pair
    colon = tok.encode(":", add_special_tokens=False)
    assert len(colon) == 1
    text_ids = tok.encode(" " + text, add_special_tokens=False)
    ids = (
        [agent.end_audio_token_id, agent.agent_speaker_token_id]
        + colon
        + text_ids
        + [agent.start_audio_token_id]
    )
    speaker_pos = len(agent.input_ids) + 1
    agent.input_ids.extend(ids)
    llm.eval(ids[:-1])  # trailing <|audio|> stays pending (text mode)
    agent.transcript.append(
        {
            "speaker": agent.config.agent_identity,
            "text": text,
            "start_secs": agent.total_secs,
            "end_secs": None,
            "text_start_pos": speaker_pos,
            "text_with_external_markers": text,
        }
    )
    agent._chain_dirty = True
    return speaker_pos + 2, text_ids


def assert_cache_matches_scratch(agent):
    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine

    llm = agent.resources.llm
    mirror = list(llm._input_ids)
    fresh = DuplexLMEngine(llm.params, llm.cfg)
    fresh.eval(mirror)
    assert fresh.n_tokens == llm.n_tokens
    valid = llm.n_tokens
    np.testing.assert_allclose(
        np.asarray(llm._k[:, :, :valid], np.float32),
        np.asarray(fresh._k[:, :, :valid], np.float32),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(llm._v[:, :, :valid], np.float32),
        np.asarray(fresh._v[:, :, :valid], np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_absorb_swapped_cache_matches_scratch(resources):
    """A value-splice absorb: the live cache keeps serving, pumps ride the
    chunk schedule, and the swapped cache equals a from-scratch prefill of
    the spliced mirror."""
    agent = make_agent(resources, pipeline=False, slice_tokens=16)
    audio = chunks(40, seed=4)
    for c in audio[:16]:
        agent.process_audio(c)
    assert agent._trim_rebuild is None

    s, e = splice_audio_values(agent, lo_frame=40, n=6)
    assert e <= len(agent.input_ids) - PENALTY_WINDOW, "test setup: splice too close to tail"
    assert agent._absorb_finalize_splice(s, e, 0) is True
    assert agent._stale_splice == (s, e, 0)
    assert agent._trim_rebuild is not None
    assert agent._trim_rebuild["to_secs"] == agent.trim_to_secs
    # the live prefix below the splice is reused, not re-pumped
    assert agent.resources.llm._rb_progress == agent.cache_pos(s)
    # cache-coordinate bookkeeping holds during the stale window
    assert agent._fused_ready()

    n = drive_to_swap(agent, audio[16:])
    assert n >= 2, "absorb swapped immediately; not incremental"
    assert agent._stale_splice is None
    # the engine mirror now contains the spliced values
    mirror = agent.resources.llm._input_ids
    spliced_vals = agent.input_ids[s:e]
    cs = agent.cache_pos(s)
    assert mirror[cs : cs + len(spliced_vals)] == spliced_vals
    assert_cache_matches_scratch(agent)


def test_finalize_absorb_end_to_end_with_diff(resources):
    """Full finalize_last_response through the absorb: a real text splice
    (sequence SHRINKS), stale-window coordinate corrections, swap, and a
    numerically correct final cache."""
    agent = make_agent(resources, pipeline=False, slice_tokens=16)
    audio = chunks(50, seed=7)
    for c in audio[:4]:
        agent.process_audio(c)
    splice_start, text_ids = inject_response(agent, "hello there my good friend")
    # resume audio: the agent exits text mode on the next chunks
    for c in audio[4:16]:
        agent.process_audio(c)
    assert agent._trim_rebuild is None

    len_before = len(agent.input_ids)
    n_before = agent.resources.llm.n_tokens
    agent.ch1_inactivity_elapsed_secs = 0.1
    agent._improbable_run_cut = lambda ratio, tol: 2  # deterministic cut
    agent.finalize_last_response()

    diff = len(agent.input_ids) - len_before
    assert diff < 0, "finalize did not shrink the planned text"
    assert agent._stale_splice is not None
    ss, se, sd = agent._stale_splice
    assert (ss, sd) == (splice_start, diff)
    # blocking recompute did NOT run: the engine is untouched (stale window)
    assert agent.resources.llm.n_tokens == n_before
    assert agent._fused_ready()
    # transcript reflects the cut immediately (host-side)
    assert agent.last_response["text"] != agent.last_response["planned_text"]

    n = drive_to_swap(agent, audio[16:])
    assert n >= 2
    assert agent._stale_splice is None
    assert agent.resources.llm.n_tokens == agent.cache_pos(len(agent.input_ids) - 2)
    assert_cache_matches_scratch(agent)


def test_finalize_absorb_sync_pipe_parity(resources):
    """Sync and pipelined agents stay token-identical through an absorbed
    finalize splice (the stale window and swap land on the same processed
    chunk in both)."""
    def run(pipeline):
        agent = make_agent(resources, pipeline=pipeline, slice_tokens=16)
        audio = chunks(34, seed=9)
        for c in audio[:4]:
            agent.process_audio(c)
        agent.drain_pipeline()
        inject_response(agent, "hello there my good friend")
        for c in audio[4:16]:
            agent.process_audio(c)
        agent.drain_pipeline()
        agent.ch1_inactivity_elapsed_secs = 0.1
        agent._improbable_run_cut = lambda ratio, tol: 2
        agent.finalize_last_response()
        assert agent._stale_splice is not None
        for c in audio[16:]:
            agent.process_audio(c)
        agent.drain_pipeline()
        assert agent._stale_splice is None, "absorb never swapped"
        return agent

    sync = run(False)
    pipe = run(True)
    assert pipe.input_ids == sync.input_ids
    assert pipe.resources.llm.n_tokens == sync.resources.llm.n_tokens
    assert pipe.resources.llm._step == sync.resources.llm._step
    assert pipe.resources.llm._input_ids == sync.resources.llm._input_ids


def test_tail_adjacent_splice_falls_back_to_blocking(resources):
    """A splice within PENALTY_WINDOW of the tail must NOT enter a stale
    window (fused chain and stepwise sampler would see different penalty
    windows): finalize falls back to the blocking recompute."""
    agent = make_agent(resources, pipeline=False)
    audio = chunks(12, seed=5)
    for c in audio[:4]:
        agent.process_audio(c)
    inject_response(agent, "hello there my good friend")
    for c in audio[4:6]:  # little audio after the response: splice near tail
        agent.process_audio(c)
    agent.ch1_inactivity_elapsed_secs = 0.1
    agent._improbable_run_cut = lambda ratio, tol: 2
    agent.finalize_last_response()
    assert agent._stale_splice is None
    assert agent._trim_rebuild is None
    # blocking path left the cache consistent
    assert agent.resources.llm.n_tokens == agent.cache_pos(len(agent.input_ids) - 2)
    assert_cache_matches_scratch(agent)


def test_incremental_finalize_off_uses_blocking(resources):
    agent = make_agent(resources, pipeline=False, incremental_finalize=False)
    audio = chunks(20, seed=6)
    for c in audio[:4]:
        agent.process_audio(c)
    inject_response(agent, "hello there my good friend")
    for c in audio[4:16]:
        agent.process_audio(c)
    agent.ch1_inactivity_elapsed_secs = 0.1
    agent._improbable_run_cut = lambda ratio, tol: 2
    agent.finalize_last_response()
    assert agent._stale_splice is None
    assert agent.resources.llm.n_tokens == agent.cache_pos(len(agent.input_ids) - 2)
    assert_cache_matches_scratch(agent)


def test_edit_below_splice_sync_materializes(resources):
    """An edit at/below a pending splice widens the blocking recompute to
    cover the splice, clears the stale window, and drops the now-redundant
    absorb rebuild."""
    agent = make_agent(resources, pipeline=False)
    audio = chunks(20, seed=8)
    for c in audio[:16]:
        agent.process_audio(c)
    s, e = splice_audio_values(agent, lo_frame=60, n=6)
    assert agent._absorb_finalize_splice(s, e, 0) is True
    # now edit BELOW the splice (whisper-merge-style history edit)
    s2, e2 = splice_audio_values(agent, lo_frame=30, n=4)
    assert s2 < s
    agent.recompute_kv_cache(s2, e2)
    assert agent._stale_splice is None
    assert agent._trim_rebuild is None  # pure absorb dropped, not restarted
    assert agent.resources.llm.n_tokens == agent.cache_pos(len(agent.input_ids) - 2)
    assert_cache_matches_scratch(agent)


def test_edit_above_splice_keeps_absorb(resources):
    """An in-place edit ABOVE the pending splice (TTS substitution) re-evals
    synchronously at stale coordinates while the absorb keeps pumping."""
    agent = make_agent(resources, pipeline=False, slice_tokens=8)
    audio = chunks(40, seed=8)
    for c in audio[:16]:
        agent.process_audio(c)
    s, e = splice_audio_values(agent, lo_frame=40, n=6)
    assert agent._absorb_finalize_splice(s, e, 0) is True
    s2, e2 = splice_audio_values(agent, lo_frame=120, n=4)
    assert s2 >= e
    agent.recompute_kv_cache(s2, e2)
    assert agent._stale_splice == (s, e, 0)
    assert agent._trim_rebuild is not None
    # the absorb re-froze against the edited sequence but kept its live-prefix
    # reuse (the edit is above the splice, the prefix below it is untouched)
    assert agent.resources.llm._rb_progress == agent.cache_pos(s)
    drive_to_swap(agent, audio[16:])
    assert agent._stale_splice is None
    assert_cache_matches_scratch(agent)


def test_absorb_during_trim_rebuild_refreezes_trim(resources):
    """A finalize splice while a trim rebuild is in flight re-freezes the
    TRIM (its own to_secs, full rebuild) against the spliced sequence; its
    swap absorbs the splice."""
    agent = make_agent(resources, pipeline=False, slice_tokens=16,
                       max_context_secs=1.0)
    audio = chunks(60, seed=4)
    seen = False
    for i, c in enumerate(audio):
        agent.process_audio(c)
        if agent._trim_rebuild is not None and not seen:
            rb_to = agent._trim_rebuild["to_secs"]
            assert rb_to > agent.trim_to_secs  # a real trim, not an absorb
            frames = agent.frames_from_secs(agent.trim_to_secs)
            lo = max(frames, 60)
            s, e = splice_audio_values(agent, lo_frame=lo + 8, n=6)
            if e > len(agent.input_ids) - PENALTY_WINDOW:
                continue  # tail too close this chunk; try the next window
            assert agent._absorb_finalize_splice(s, e, 0) is True
            assert agent._trim_rebuild["to_secs"] == rb_to  # target preserved
            assert agent.resources.llm._rb_progress == 0  # full refreeze
            assert agent._stale_splice == (s, e, 0)
            seen = True
        elif seen and agent._trim_rebuild is None:
            break
    assert seen, "trim rebuild window never observed"
    assert agent._stale_splice is None, "trim swap did not clear the stale window"
    assert agent.trim_to_secs >= 0.5
    assert agent._fused_ready()
    assert_cache_matches_scratch(agent)


def test_snapshot_during_absorb_restores_spliced(resources):
    """A snapshot taken mid-absorb restores with the splice materialized (the
    restore rebuilds the cache from the spliced sequence)."""
    from realtime_codec_agent_tpu.agent.agent import RealtimeAgent as RA

    agent = make_agent(resources, pipeline=False, slice_tokens=8)
    audio = chunks(24, seed=10)
    for c in audio[:16]:
        agent.process_audio(c)
    s, e = splice_audio_values(agent, lo_frame=40, n=6)
    assert agent._absorb_finalize_splice(s, e, 0) is True
    snap = agent.snapshot()
    restored = RA.from_snapshot(agent.resources, snap)
    llm = restored.resources.llm
    assert restored._stale_splice is None
    cs = restored.cache_pos(s)
    assert llm._input_ids[cs : cs + (e - s)] == restored.input_ids[s:e]
    assert llm.n_tokens == restored.cache_pos(len(restored.input_ids) - 2)
