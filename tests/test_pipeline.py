"""Pipelined (depth-1) chunk processing tests.

pipeline_chunks dispatches chunk t's fused program and emits chunk t-1's
audio, so the device tunnel's fixed per-fetch latency overlaps compute. The
contract: token streams and transcripts are IDENTICAL to the synchronous
path; only the audio emission is shifted by exactly one chunk.
"""
import dataclasses

import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.agent.resources import RealtimeAgentResources
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
from realtime_codec_agent_tpu.models.llama import tiny_lm_config


@pytest.fixture(scope="module")
def resources():
    """f32 tiny models: the fused and stepwise programs are different XLA
    programs; f32 keeps their numeric difference far below sampling-flip
    scale so sampled-mode equivalence is exact."""
    codec = JaxCodecModel.random_init(tiny_codec_config(compute_dtype="float32"), seed=0)
    res = RealtimeAgentResources(
        codec_model=codec, tiny=True, whisper_model=None, seed=0
    )
    # rebuild the engine with an f32 LM of the same geometry
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


def make_agent(resources, pipeline: bool, temperature: float = 0.0, pin_audio: bool = True):
    config = RealtimeAgentConfig(
        temperature=temperature,
        use_whisper=False,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        use_fused_step=True,
        pipeline_chunks=pipeline,
        seed=11,
    )
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


@pytest.mark.parametrize("temperature", [0.0, 1.0])
def test_pipelined_tokens_match_sync_audio_lags_one(resources, temperature):
    sync = make_agent(resources, pipeline=False, temperature=temperature)
    pipe = make_agent(resources, pipeline=True, temperature=temperature)

    audio = chunks(5)
    sync_out, pipe_out = [], []
    for c in audio:
        sync_out.append(sync.process_audio(c))
        pipe_out.append(pipe.process_audio(c))
    tail = pipe.drain_pipeline()
    assert tail is not None
    pipe_out.append(tail)

    # identical token streams + engine state
    assert pipe.input_ids == sync.input_ids
    assert pipe.audio_tokens_idx == sync.audio_tokens_idx
    assert pipe.resources.llm.n_tokens == sync.resources.llm.n_tokens
    assert pipe.resources.llm._step == sync.resources.llm._step

    # audio shifted by exactly one chunk (first pipelined emission is silence)
    np.testing.assert_array_equal(pipe_out[0], np.zeros(1600, np.float32))
    for i in range(5):
        np.testing.assert_allclose(pipe_out[i + 1], sync_out[i], atol=1e-5)


def test_pipelined_event_replay_matches_fused_samples(resources):
    """VERDICT round-1 item 8: when an event interrupts a fused chunk, the
    stepwise replay must resample the SAME tokens the fused program sampled
    for the accepted frames (shared fold_in(base, step) schedule), and the
    pipelined agent must handle the event one chunk late with an identical
    final sequence to the synchronous agent."""
    sync = make_agent(resources, pipeline=False, temperature=1.0, pin_audio=False)
    pipe = make_agent(resources, pipeline=True, temperature=1.0, pin_audio=False)

    # unpinned sampling on random weights fires natural end_audio events
    # within a few frames (~20% of the tiny vocab is non-audio)
    audio = chunks(3, seed=5)
    outs = {"sync": [], "pipe": []}
    for agent, key in ((sync, "sync"), (pipe, "pipe")):
        for i, c in enumerate(audio):
            outs[key].append(agent.process_audio(c))
        if key == "pipe":
            agent.drain_pipeline()

    # both agents ran the same (possibly event-bearing) trajectory
    assert pipe.input_ids == sync.input_ids
    assert pipe.get_sequence_str() == sync.get_sequence_str()
    assert [t["text"] for t in pipe.transcript] == [t["text"] for t in sync.transcript]


def test_replay_resamples_identical_tokens(resources):
    """Directly exercise the fused->stepwise replay determinism: force an
    event at frame 2 of a fused chunk; the agent replay must keep the fused
    chunk's accepted frame samples bit-identically."""
    agent = make_agent(resources, pipeline=False, temperature=1.0)
    audio = chunks(4, seed=8)
    agent.process_audio(audio[0])  # enter audio mode

    eng = agent.resources.llm
    session = agent._session
    # record what a pure fused chunk WOULD sample (no commit: use a probe
    # dispatch on cloned state is not possible — instead run fused, then
    # roll back and replay stepwise with the same user tokens)
    session.bind_sequence(agent.input_ids)
    step_before = eng._step
    n_before = eng.n_tokens
    res, _ = session.process_chunk(audio[1])
    assert res.event_frame == agent.chunk_size_frames_per_channel  # clean chunk
    fused_tokens = list(res.out_tokens)
    # fused consumed 5 sampler steps; the engine HOST mirror is untouched
    # (the agent commits it) — rewind the step counter and replay stepwise
    assert eng.n_tokens == n_before
    eng._step = step_before
    replayed = []
    pending = agent.input_ids[-2:]
    for i in range(agent.chunk_size_frames_per_channel):
        tok = eng.eval_and_sample(pending)
        replayed.append(tok)
        pending = [tok, res.user_tokens[i]]
    assert replayed == fused_tokens


def test_fused_path_survives_context_trim(resources):
    """After the 80s-style trim + KV rebuild, cache positions diverge from
    sequence positions; the fused-path precondition must use cache
    coordinates (r1 bench regression: every post-trim chunk silently fell
    back to the stepwise path). Tokens must also stay identical to the
    synchronous agent across the trim."""
    def tiny_trim_agent(pipeline):
        a = make_agent(resources, pipeline=pipeline, temperature=0.0)
        a.config.max_context_secs = 1.0
        a.config.trim_by_secs = 0.5
        return a

    sync = tiny_trim_agent(False)
    pipe = tiny_trim_agent(True)
    audio = chunks(16, seed=4)  # 1.6 s -> trims fire at 1.0 s and 1.5 s
    for c in audio:
        sync.process_audio(c)
        pipe.process_audio(c)
    pipe.drain_pipeline()

    assert sync.trim_to_secs >= 0.5  # the trim actually fired
    assert pipe.trim_to_secs == sync.trim_to_secs
    assert pipe.input_ids == sync.input_ids
    # post-trim: cache is shorter than the sequence, and the fused
    # precondition still holds for both agents
    assert sync.resources.llm.n_tokens < len(sync.input_ids) - 2
    assert sync._fused_ready()
    assert pipe._fused_ready()

    # the fused program is actually used after the trim
    calls = {"n": 0}
    orig = pipe._session.dispatch_chunk
    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)
    pipe._session.dispatch_chunk = counting
    for c in chunks(3, seed=9):
        pipe.process_audio(c)
    assert calls["n"] == 3


def test_self_play_pipelined_cross_feed(resources):
    """Both self-play agents pipelined: cross-feed with precomputed user
    tokens takes the fused dispatch path (no re-encode, no stepwise loop) and
    produces a coherent dual conversation."""
    a = make_agent(resources, pipeline=True)
    b = make_agent(resources, pipeline=True)
    a.self_play_mode = True
    b.self_play_mode = True

    calls = {"a": 0, "b": 0}
    for agent, key in ((a, "a"), (b, "b")):
        orig = agent._session.dispatch_chunk
        def counting(*args, _orig=orig, _key=key, **kw):
            calls[_key] += 1
            return _orig(*args, **kw)
        agent._session.dispatch_chunk = counting

    zero = np.zeros(1600, np.float32)
    out_a, ids_a = zero, None
    out_b, ids_b = zero, None
    for _ in range(6):
        out_a_, ids_a_ = a.process_audio(out_b, ids_b)
        out_b, ids_b = b.process_audio(out_a, ids_a)
        out_a, ids_a = out_a_, ids_a_
        assert out_a.shape == (1600,)
    a.drain_pipeline()
    b.drain_pipeline()

    # after warm-in, every chunk was a fused dispatch (ids precomputed)
    assert calls["a"] >= 5 and calls["b"] >= 5
    # both conversations advanced in lockstep
    assert a.total_secs == b.total_secs
    assert a.total_secs >= 0.5
    # cross-fed ids really are each other's outputs: B's user channel tokens
    # equal A's agent channel tokens (shifted by the pipeline lag)
    b_user = [b.input_ids[i] for i in b.audio_tokens_idx[1::2]]
    a_agent = [a.input_ids[i] for i in a.audio_tokens_idx[0::2]]
    assert any(t in a_agent for t in b_user)
