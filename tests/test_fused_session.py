"""Fused duplex-session tests: the one-device-call chunk path must be
behaviorally identical to the step-by-step path (greedy), and event chunks
must be detected and left replayable."""
import jax
import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.agent.resources import RealtimeAgentResources
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config


@pytest.fixture(scope="module")
def resources():
    return RealtimeAgentResources(tiny=True, whisper_model=None, seed=0)


def make_agent(resources, use_fused: bool, pin_audio: bool = True):
    config = RealtimeAgentConfig(
        temperature=0.0,  # greedy: fused and stepwise must agree exactly
        use_whisper=False,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        use_fused_step=use_fused,
        seed=7,
    )
    # separate engine per agent over the same weights
    res = resources.clone_for_self_play()
    agent = RealtimeAgent(resources=res, config=config)
    if pin_audio:
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


def test_fused_session_created(resources):
    agent = make_agent(resources, use_fused=True)
    assert agent._session is not None


def test_fused_matches_stepwise_greedy(resources):
    fused = make_agent(resources, use_fused=True)
    legacy = make_agent(resources, use_fused=False)
    assert legacy._session is None

    for i, chunk in enumerate(chunks(4)):
        out_f = fused.process_audio(chunk)
        out_l = legacy.process_audio(chunk)
        assert out_f.shape == out_l.shape == (1600,)
        np.testing.assert_allclose(out_f, out_l, atol=2e-2, rtol=0.1)
    # token-exact sequences
    assert fused.input_ids == legacy.input_ids
    assert fused.audio_tokens_idx == legacy.audio_tokens_idx
    assert fused.resources.llm.n_tokens == legacy.resources.llm.n_tokens
    # event-prob stats recorded each chunk on both paths
    assert len(fused.stats.event_prob) == 4
    assert len(legacy.stats.event_prob) == 4
    np.testing.assert_allclose(
        fused.stats.event_prob._ring[:4, 0], legacy.stats.event_prob._ring[:4, 0],
        rtol=0.05, atol=1e-4,
    )


def test_fused_fast_path_single_device_call(resources):
    agent = make_agent(resources, use_fused=True)
    first, rest = chunks(3)[0], chunks(3)[1:]
    agent.process_audio(first)  # chunk 1: host path (not yet in audio mode)
    session = agent._session
    calls = {"n": 0}
    orig = session.process_chunk

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    session.process_chunk = counting
    for chunk in rest:
        agent.process_audio(chunk)
    assert calls["n"] == len(rest)  # every steady-state chunk went fused


def test_fused_event_detection_and_replayability(resources):
    agent = make_agent(resources, use_fused=True, pin_audio=False)
    agent.process_audio(chunks(1)[0])  # enter audio mode
    session = agent._session
    eng = agent.resources.llm
    # force an immediate event: bias <|end_audio|> to dominate
    eng.init_sampler_for_generate(temp=0.0, logit_bias={agent.end_audio_token_id: 1e9}, seed=7)
    session.bind_sequence(agent.input_ids)
    n_before = eng.n_tokens
    res, n_final = session.process_chunk(chunks(1, seed=9)[0])
    assert res.event_frame == 0
    assert res.event_token == agent.end_audio_token_id
    assert res.audio is None
    assert len(res.user_tokens) == 5
    # engine host state untouched: the chunk is replayable step-by-step
    assert eng.n_tokens == n_before
    # user tokens are real codec ids
    assert all(t >= agent.resources.tokenizer.codec_vocab_start for t in res.user_tokens)


def test_enrollment_primes_session_ring(resources):
    agent = make_agent(resources, use_fused=True)
    # header contains 3 s of enrollment codes = 150 codec chars
    seq = agent.get_sequence_str()
    header = seq.split("<|end_header|>")[0]
    enrollment = header.split("<|agent_voice|>")[1]
    assert len(enrollment) == 150
    assert all(ord(c) >= agent.resources.tokenizer.unicode_offset for c in enrollment)


def test_prewarm_compiles_cache_view_variants(resources):
    """prewarm() AOT-compiles without touching device state, and the
    cache-view bucket chosen at dispatch stays within the cache."""
    agent = make_agent(resources, use_fused=True)
    session = agent._session
    eng = session.engine
    n_before = eng.n_tokens
    k_before = eng._k
    session.prewarm(include_replay=False)
    assert eng.n_tokens == n_before
    assert eng._k is k_before  # no donation happened
    view = session._cache_view_bucket()
    cache_len = eng._k.shape[2]
    assert view == 0 or (eng.n_tokens + 10 <= view < cache_len)


def test_long_chunk_config_multi_scan(resources):
    """0.2s chunks = 10 frames/channel: the engine's 8-frame continuation
    program must chain (8 + 2) inside one chunk without state drift."""
    res = resources.clone_for_self_play()
    config = RealtimeAgentConfig(
        chunk_size_secs=0.2,
        temperature=0.0,
        use_whisper=False,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        use_fused_step=False,     # force the sync frame loop (scan path)
        pipeline_chunks=False,
        seed=11,
    )
    agent = RealtimeAgent(resources=res, config=config)
    n = agent.chunk_size_samples
    assert agent.chunk_size_frames_per_channel == 10
    for _ in range(3):
        out = agent.process_audio(np.zeros(n, np.float32))
        assert out.shape == (n,)
    # 3 chunks x 10 frames x (agent, user) pairs + pending pair bookkeeping
    assert len(agent.audio_tokens_idx) == 3 * 10 * 2
    assert agent.resources.llm.n_tokens == len(agent.input_ids) - 2
