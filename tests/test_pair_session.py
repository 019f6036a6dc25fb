"""Paired self-play session tests (lm/pair_session.py).

The pair program batches BOTH self-play agents' fused chunks over one weight
read; the contract is that it is a pure scheduling overlay — token streams,
transcripts, and engine state are identical to two unpaired sessions, across
every path the agent can take (clean chunks, events + stepwise replay,
halted-successor redispatch, drains, resets).
"""
import dataclasses

import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.agent.resources import RealtimeAgentResources
from realtime_codec_agent_tpu.lm.pair_session import pair_self_play_agents
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config


@pytest.fixture(scope="module")
def resources():
    """f32 tiny models (same reasoning as test_pipeline.py: the pair and
    single programs are different XLA programs; f32 keeps their numeric
    difference far below sampling-flip scale)."""
    codec = JaxCodecModel.random_init(tiny_codec_config(compute_dtype="float32"), seed=0)
    res = RealtimeAgentResources(
        codec_model=codec, tiny=True, whisper_model=None, seed=0
    )
    import jax

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import init_lm_params

    cfg = dataclasses.replace(res.lm_config, compute_dtype="float32")
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    res.lm_config = cfg
    res.lm_params = params
    res.llm = DuplexLMEngine(params, cfg)
    res.aux_llm = res.llm
    return res


def make_agent(
    resources, seed, temperature=0.0, pin_audio=True, pipeline=True, self_play=True,
    async_detours=False,
):
    config = RealtimeAgentConfig(
        temperature=temperature,
        use_whisper=False,
        agent_opening_text=None,
        async_detours=async_detours,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        use_fused_step=True,
        pipeline_chunks=pipeline,
        seed=seed,
    )
    res = resources.clone_for_self_play()
    agent = RealtimeAgent(resources=res, config=config, self_play_mode=self_play)
    if pin_audio:
        orig = agent.set_sampler

        def pinned(for_trans=False, suppress_end_audio=False):
            orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
            res.llm.settings.min_token_id = res.tokenizer.codec_vocab_start

        agent.set_sampler = pinned
        agent.set_sampler()
    return agent


def cross_feed(agent_a, agent_b, n_chunks):
    """The self-play loop: A's out chunk (+ids) feeds B and vice versa."""
    zero = np.zeros(1600, np.float32)
    out_a, ids_a = zero, None
    out_b, ids_b = zero, None
    for _ in range(n_chunks):
        out_a_, ids_a_ = agent_a.process_audio(out_b, ids_b)
        out_b, ids_b = agent_b.process_audio(out_a, ids_a)
        out_a, ids_a = out_a_, ids_a_
    while agent_a.drain_pipeline() is not None:
        pass
    while agent_b.drain_pipeline() is not None:
        pass


def run_conversation(resources, paired, n_chunks=8, temperature=0.0, pin_audio=True):
    a = make_agent(resources, seed=11, temperature=temperature, pin_audio=pin_audio)
    b = make_agent(resources, seed=12, temperature=temperature, pin_audio=pin_audio)
    pair = pair_self_play_agents(a, b) if paired else None
    cross_feed(a, b, n_chunks)
    return a, b, pair


def test_paired_cross_feed_tokens_match_unpaired(resources):
    """Clean-chunk steady state: every cross-fed chunk rides the pair
    program, and the token streams are identical to the unpaired run."""
    a1, b1, _ = run_conversation(resources, paired=False)
    a2, b2, pair = run_conversation(resources, paired=True)

    assert a2.input_ids == a1.input_ids
    assert b2.input_ids == b1.input_ids
    assert a2.audio_tokens_idx == a1.audio_tokens_idx
    assert a2.resources.llm.n_tokens == a1.resources.llm.n_tokens
    assert a2.resources.llm._step == a1.resources.llm._step
    assert b2.resources.llm._step == b1.resources.llm._step
    # the pairing actually happened (warm-in chunks may flush single)
    assert pair.paired_dispatches >= 4


def test_paired_cross_feed_audio_matches_unpaired(resources):
    """The decoded audio (device codec ring path) is also unchanged."""
    collect = {}
    for paired in (False, True):
        a = make_agent(resources, seed=11)
        b = make_agent(resources, seed=12)
        if paired:
            pair_self_play_agents(a, b)
        zero = np.zeros(1600, np.float32)
        out_a, ids_a = zero, None
        out_b, ids_b = zero, None
        outs = []
        for _ in range(6):
            out_a_, ids_a_ = a.process_audio(out_b, ids_b)
            out_b, ids_b = b.process_audio(out_a, ids_a)
            out_a, ids_a = out_a_, ids_a_
            outs.append((out_a.copy(), out_b.copy()))
        collect[paired] = outs
    for (ua, ub), (pa, pb) in zip(collect[False], collect[True]):
        np.testing.assert_allclose(pa, ua, atol=1e-5)
        np.testing.assert_allclose(pb, ub, atol=1e-5)


def test_paired_with_events_matches_unpaired(resources):
    """Unpinned temperature-1 sampling on random weights fires natural
    end_audio events within a few frames: the event replay, halted-successor
    redispatch, and pair flush rules must preserve exact token parity."""
    a1, b1, _ = run_conversation(
        resources, paired=False, n_chunks=6, temperature=1.0, pin_audio=False
    )
    a2, b2, pair = run_conversation(
        resources, paired=True, n_chunks=6, temperature=1.0, pin_audio=False
    )

    assert a2.input_ids == a1.input_ids
    assert b2.input_ids == b1.input_ids
    assert a2.get_sequence_str() == a1.get_sequence_str()
    assert b2.get_sequence_str() == b1.get_sequence_str()
    assert [t["text"] for t in a2.transcript] == [t["text"] for t in a1.transcript]
    assert [t["text"] for t in b2.transcript] == [t["text"] for t in b1.transcript]
    # at least one event fired, or this test isn't exercising the replay path
    assert any(t < a1.end_header_token_id + 1 for t in a1.input_ids[4:]) or (
        pair.single_dispatches > 0
    )


def test_sync_paired_session_flushes_immediately(resources):
    """Synchronous (non-pipelined) agents over a paired session: resolve is
    adjacent to dispatch, so each chunk flushes through the single program
    with no stall — tokens identical to plain sync agents."""
    a1 = make_agent(resources, seed=11, pipeline=False)
    b1 = make_agent(resources, seed=12, pipeline=False)
    cross_feed(a1, b1, 4)

    a2 = make_agent(resources, seed=11, pipeline=False)
    b2 = make_agent(resources, seed=12, pipeline=False)
    pair = pair_self_play_agents(a2, b2)

    zero = np.zeros(1600, np.float32)
    out_a, ids_a = zero, None
    out_b, ids_b = zero, None
    for _ in range(4):
        out_a_, ids_a_ = a2.process_audio(out_b, ids_b)
        out_b, ids_b = b2.process_audio(out_a, ids_a)
        out_a, ids_a = out_a_, ids_a_

    assert a2.input_ids == a1.input_ids
    assert b2.input_ids == b1.input_ids
    # the immediate-flush path resolved every chunk: no 2 s LazyHandles
    # timeout ever fired (counter assertion — wall-clock bounds were flaky
    # under parallel test load)
    assert pair.timeout_flushes == 0
    # warm-in chunks take the stepwise path; everything after flushes single
    assert pair.single_dispatches >= 6
    assert pair.paired_dispatches == 0


def test_reset_cancels_buffered_chunk(resources):
    """A session reset drops its buffered pair chunk; the straggling fetch
    parses a synthesized halted no-op instead of touching post-reset state."""
    a = make_agent(resources, seed=11)
    b = make_agent(resources, seed=12)
    pair = pair_self_play_agents(a, b)
    zero = np.zeros(1600, np.float32)
    # prime both agents so their sessions have live chains
    out_a, ids_a = a.process_audio(zero, None)
    out_b, ids_b = b.process_audio(zero, None)

    sa = a._session
    sa.bind_sequence(a.input_ids)
    sa.sync_chain()
    lazy = sa.dispatch_chunk(zero)  # buffers (partner never dispatches)
    assert pair._buffered
    sa.reset()
    assert not pair._buffered
    res, _ = sa.resolve(lazy)
    assert res.halted_input
    assert res.audio is None
    # drain the agents so the module-scoped fixture isn't left mid-flight
    while a.drain_pipeline() is not None:
        pass
    while b.drain_pipeline() is not None:
        pass


def test_grouped_serving_three_rows_matches_ungrouped(resources):
    """Duplex serving: R=3 agents with INDEPENDENT audio streams (no
    cross-feed) grouped into one batch-3 program — token streams identical
    to three ungrouped agents."""
    from realtime_codec_agent_tpu.lm.pair_session import group_duplex_agents

    def streams(n_chunks):
        rngs = [np.random.default_rng(100 + i) for i in range(3)]
        return [
            [(r.normal(size=1600) * 0.1).astype(np.float32) for _ in range(n_chunks)]
            for r in rngs
        ]

    runs = {}
    for grouped in (False, True):
        agents = [
            make_agent(resources, seed=20 + i, self_play=False) for i in range(3)
        ]
        coord = group_duplex_agents(agents) if grouped else None
        for t, chunks3 in enumerate(zip(*streams(6))):
            for a, c in zip(agents, chunks3):
                a.process_audio(c)
        for a in agents:
            while a.drain_pipeline() is not None:
                pass
        runs[grouped] = (agents, coord)

    for a_un, a_gr in zip(runs[False][0], runs[True][0]):
        assert a_gr.input_ids == a_un.input_ids
        assert a_gr.resources.llm.n_tokens == a_un.resources.llm.n_tokens
        assert a_gr.resources.llm._step == a_un.resources.llm._step
    coord = runs[True][1]
    assert coord.n_rows == 3
    assert coord.paired_dispatches >= 4  # steady state rides the group program


def test_flush_failure_resolves_lazy(resources):
    """A flush whose single dispatch raises must still resolve the buffered
    LazyHandles (synthesized halted no-op) — an unset lazy deadlocks the
    fetch thread parked on it."""
    a = make_agent(resources, seed=11)
    b = make_agent(resources, seed=12)
    pair = pair_self_play_agents(a, b)
    zero = np.zeros(1600, np.float32)
    a.process_audio(zero, None)
    b.process_audio(zero, None)

    sa = a._session
    sa.bind_sequence(a.input_ids)
    sa.sync_chain()
    lazy = sa.dispatch_chunk(zero)  # buffers (partner never dispatches)
    assert pair._buffered

    orig = sa._dispatch_chunk_single

    def boom(*args, **kwargs):
        raise RuntimeError("injected dispatch failure")

    sa._dispatch_chunk_single = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            pair.flush(sa)
    finally:
        sa._dispatch_chunk_single = orig
    assert not pair._buffered
    res, _ = sa.resolve(lazy)  # resolves instantly: no deadlock
    assert res.halted_input
    for ag in (a, b):
        while ag.drain_pipeline() is not None:
            pass


def test_launch_failure_resolves_all_lazies(resources):
    """A group launch that raises must resolve EVERY row's LazyHandles."""
    a = make_agent(resources, seed=11)
    b = make_agent(resources, seed=12)
    pair = pair_self_play_agents(a, b)
    zero = np.zeros(1600, np.float32)
    a.process_audio(zero, None)
    b.process_audio(zero, None)

    for ag in (a, b):
        s = ag._session
        s.bind_sequence(ag.input_ids)
        s.sync_chain()

    orig_group = pair._fused_group

    def boom(*args, **kwargs):
        raise RuntimeError("injected launch failure")

    pair._fused_group = boom
    try:
        lazy_a = a._session.dispatch_chunk(zero)  # buffers
        with pytest.raises(RuntimeError, match="injected"):
            b._session.dispatch_chunk(zero)  # fills the group -> launch raises
    finally:
        pair._fused_group = orig_group
    res_a, _ = a._session.resolve(lazy_a)
    assert res_a.halted_input
    for ag in (a, b):
        while ag.drain_pipeline() is not None:
            pass


def test_pair_rejects_mismatched_sessions(resources):
    a = make_agent(resources, seed=11)
    b = make_agent(resources, seed=12)
    other_codec = JaxCodecModel.random_init(
        tiny_codec_config(compute_dtype="float32"), seed=1
    )
    b._session.codec = other_codec
    with pytest.raises(ValueError):
        pair_self_play_agents(a, b)
    while a.drain_pipeline() is not None:
        pass


def cross_feed_split(agent_a, agent_b, n_chunks):
    """The group-pipelined drive (VERDICT r4 item 4): BOTH rows dispatch —
    launching the batch-2 program — before either resolves, so the fetch
    RTT hides under queued device compute instead of serializing the next
    launch behind it."""
    zero = np.zeros(1600, np.float32)
    out_a, ids_a = zero, None
    out_b, ids_b = zero, None
    for _ in range(n_chunks):
        agent_a.process_audio_dispatch(out_b, ids_b)
        agent_b.process_audio_dispatch(out_a, ids_a)
        out_a, ids_a = agent_a.process_audio_resolve()
        out_b, ids_b = agent_b.process_audio_resolve()
    while agent_a.drain_pipeline() is not None:
        pass
    while agent_b.drain_pipeline() is not None:
        pass


def test_split_drive_tokens_match_interleaved(resources):
    """The split dispatch/resolve drive must produce bit-identical token
    streams to the standard interleaved drive, paired AND unpaired."""
    a1, b1, _ = run_conversation(resources, paired=False)

    for paired in (False, True):
        a2 = make_agent(resources, seed=11)
        b2 = make_agent(resources, seed=12)
        pair = pair_self_play_agents(a2, b2) if paired else None
        cross_feed_split(a2, b2, 8)
        assert a2.input_ids == a1.input_ids, f"paired={paired}"
        assert b2.input_ids == b1.input_ids, f"paired={paired}"
        assert a2.resources.llm._step == a1.resources.llm._step
        assert b2.resources.llm._step == b1.resources.llm._step
        if paired:
            assert pair.paired_dispatches >= 4


def test_split_drive_with_events_matches_interleaved(resources):
    """Natural events under the split drive: the resolve-side replay and
    halted-successor redispatch (which re-buffers into the group) must
    preserve exact parity with the plain drive."""
    a1, b1, _ = run_conversation(
        resources, paired=False, n_chunks=6, temperature=1.0, pin_audio=False
    )
    a2 = make_agent(resources, seed=11, temperature=1.0, pin_audio=False)
    b2 = make_agent(resources, seed=12, temperature=1.0, pin_audio=False)
    pair_self_play_agents(a2, b2)
    cross_feed_split(a2, b2, 6)
    assert a2.input_ids == a1.input_ids
    assert b2.input_ids == b1.input_ids
    assert a2.get_sequence_str() == a1.get_sequence_str()
    assert b2.get_sequence_str() == b1.get_sequence_str()
    assert [t["text"] for t in a2.transcript] == [t["text"] for t in a1.transcript]
    assert [t["text"] for t in b2.transcript] == [t["text"] for t in b1.transcript]


def test_interleaved_async_drive_still_groups(resources):
    """Regression guard for the targeted-lazy flush: ASYNC agents driven
    with plain interleaved process_audio under a coordinator must still
    ride the group program. An over-eager flush before the prev-resolve
    wait silently realizes every just-buffered chunk as a single — token
    parity masks it, so only a grouped-fraction assertion catches it."""
    import time as _time

    from realtime_codec_agent_tpu.lm.pair_session import group_duplex_agents

    agents = [
        make_agent(resources, seed=40 + i, self_play=False, async_detours=True)
        for i in range(3)
    ]
    coord = group_duplex_agents(agents)
    rngs = [np.random.default_rng(200 + i) for i in range(3)]
    for t in range(10):
        for a, r in zip(agents, rngs):
            a.process_audio((r.normal(size=1600) * 0.1).astype(np.float32))
        # let opening detours resolve so rows stay aligned (CPU detours are
        # slow; the drive loop itself must not be what desynchronizes them)
        for a in agents:
            fut = a._detour_future
            for _ in range(400):
                if fut is None or fut.done():
                    break
                _time.sleep(0.02)
    for a in agents:
        while a.drain_pipeline() is not None:
            pass
    assert coord.paired_dispatches >= 4, (
        coord.paired_dispatches, coord.single_dispatches)
