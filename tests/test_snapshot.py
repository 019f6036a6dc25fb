"""Live-call snapshot/restore (agent.snapshot / RealtimeAgent.from_snapshot).

Pins (tiny models, float32 compute for exact prefill/decode cache
equivalence — the same reason tests/test_trim_incremental.py uses it):
- a restored call's future token/audio stream is bit-identical to the
  uninterrupted agent's (no-trim and across-trim);
- the snapshot survives pickling (it is the migration wire format);
- snapshot refuses to run with pipelined work in flight and succeeds after
  a drain.

KV cache is rebuilt from the token sequence at restore (the inference-resume
discipline, reference realtime_agent_v2.py:725-733) — nothing device-side is
serialized.
"""
import dataclasses
import pickle

import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.agent.resources import RealtimeAgentResources
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config


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


def make_agent(resources, trims: bool = False, pin_audio: bool = True):
    config = RealtimeAgentConfig(
        temperature=0.7,
        use_whisper=False,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        use_fused_step=True,
        pipeline_chunks=True,
        incremental_trim=trims,
        trim_rebuild_slice_tokens=24,
        max_context_secs=1.0 if trims else 80.0,
        trim_by_secs=0.5 if trims else 20.0,
        seed=13,
    )
    res = resources.clone_for_self_play()
    agent = RealtimeAgent(resources=res, config=config)
    if pin_audio:
        _pin(agent)
    return agent


def _pin(agent):
    """Audio-only sampling: no events, so set_sampler is never re-invoked
    mid-stream and the pin survives restore."""
    agent.resources.llm.settings.min_token_id = (
        agent.resources.tokenizer.codec_vocab_start
    )


def _chunks(seed, n, samples):
    rng = np.random.default_rng(seed)
    return [(0.1 * rng.normal(size=samples)).astype(np.float32) for _ in range(n)]


def _drive(agent, chunks):
    outs = []
    for c in chunks:
        out = agent.process_audio(c)
        if out is not None:
            outs.append(np.asarray(out, np.float32))
    while True:
        tail = agent.drain_pipeline()
        if tail is None:
            break
        outs.append(np.asarray(tail, np.float32))
    return outs


def _assert_streams_equal(a, b):
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(x, y, err_msg=f"chunk {i}")


def test_snapshot_restore_token_identity(resources):
    n1, n2 = 8, 8
    a = make_agent(resources)
    samples = a.chunk_size_samples
    _drive(a, _chunks(1000, n1, samples))
    snap = a.snapshot()
    snap = pickle.loads(pickle.dumps(snap))  # the migration wire format

    cont = _chunks(2000, n2, samples)
    outs_a = _drive(a, cont)

    b = RealtimeAgent.from_snapshot(resources.clone_for_self_play(), snap)
    _pin(b)
    outs_b = _drive(b, cont)
    _assert_streams_equal(outs_a, outs_b)

    # restored bookkeeping carried over
    assert b.context_start_pos == a.context_start_pos
    assert len(b.input_ids) == len(a.input_ids)


def test_snapshot_restore_across_trims(resources):
    a = make_agent(resources, trims=True)
    samples = a.chunk_size_samples
    _drive(a, _chunks(3000, 14, samples))
    # land the snapshot between rebuilds: an in-flight rebuild completes at
    # the restore boundary instead (documented), which is not
    # uninterrupted-identical
    extra = _chunks(3100, 10, samples)
    i = 0
    while a._trim_rebuild is not None and i < len(extra):
        a.process_audio(extra[i])
        i += 1
    while a.drain_pipeline() is not None:
        pass
    assert a._trim_rebuild is None
    assert a.trim_to_secs > 0.0  # at least one trim actually happened
    snap = a.snapshot()

    cont = _chunks(4000, 8, samples)
    outs_a = _drive(a, cont)
    b = RealtimeAgent.from_snapshot(resources.clone_for_self_play(), snap)
    _pin(b)
    outs_b = _drive(b, cont)
    _assert_streams_equal(outs_a, outs_b)


def test_snapshot_mid_trim_rebuild_restores(resources):
    """A snapshot taken WHILE an incremental-trim rebuild is in flight must
    restore (the trim completes at the restore boundary): the recorded cache
    length has to match the post-trim cache the restore builds, not the live
    pre-swap cache. Two restores from the same snapshot continue
    identically."""
    a = make_agent(resources, trims=True)
    samples = a.chunk_size_samples
    chunks = _chunks(5000, 40, samples)
    snap = None
    for i, c in enumerate(chunks):
        a.process_audio(c)
        if a._trim_rebuild is not None and i > 12:
            while a.drain_pipeline() is not None:
                pass
            if a._trim_rebuild is not None:  # still mid-rebuild after drain
                snap = a.snapshot()
                break
    assert snap is not None, "never caught a rebuild in flight"
    snap = pickle.loads(pickle.dumps(snap))

    cont = _chunks(6000, 6, samples)
    outs = []
    for _ in range(2):
        b = RealtimeAgent.from_snapshot(resources.clone_for_self_play(), snap)
        _pin(b)
        outs.append(_drive(b, cont))
    _assert_streams_equal(outs[0], outs[1])


def test_snapshot_requires_quiescence(resources):
    a = make_agent(resources)
    samples = a.chunk_size_samples
    a.process_audio(np.zeros(samples, np.float32))
    with pytest.raises(RuntimeError, match="quiescent"):
        a.snapshot()
    while a.drain_pipeline() is not None:
        pass
    snap = a.snapshot()
    assert snap["engine_n_tokens"] > 0
