"""Async detour absorption: heavy chunks (inline text events, forced events)
resolve on a background thread while the agent emits silence filler, then the
backlog catches up.

Contract (config.async_detours): the LM token stream and transcript are
IDENTICAL to the synchronous agent's (chunks process in arrival order against
in-order state); the emitted audio is the synchronous agent's output stream
with filler chunks interleaved wherever a detour was still resolving.
"""
import dataclasses

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


def make_agent(resources, mode: str, temperature: float = 0.0, pin_audio: bool = True,
               incremental_trim: bool = False, **cfg_overrides):
    config = RealtimeAgentConfig(
        temperature=temperature,
        use_whisper=False,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        use_fused_step=True,
        pipeline_chunks=(mode != "sync"),
        async_detours=(mode == "async"),
        incremental_trim=incremental_trim,
        seed=11,
        **cfg_overrides,
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


def force_trans_once(agent, at_secs=0.4):
    """Deterministic state-based forced event: fires exactly once when the
    processed-audio clock crosses ``at_secs`` (same trigger on every
    execution path, independent of call timing)."""
    fired = {"done": False}
    orig = agent.should_force_transcription

    def f():
        if not fired["done"] and agent.total_secs >= at_secs:
            fired["done"] = True
            return True
        return orig()

    agent.should_force_transcription = f


def run_and_collect(agent, audio):
    emissions = []
    for c in audio:
        out = agent.process_audio(c)
        emissions.append((out, agent.last_emit_was_filler))
    while True:
        tail = agent.drain_pipeline()
        if tail is None:
            break
        emissions.append((tail, False))
    return emissions


def test_async_tokens_match_sync_natural_events(resources):
    """Unpinned sampling on random weights fires natural end_audio events;
    the async agent must produce the identical sequence + transcript."""
    sync = make_agent(resources, "sync", temperature=1.0, pin_audio=False)
    asyn = make_agent(resources, "async", temperature=1.0, pin_audio=False)
    audio = chunks(4, seed=5)
    for c in audio:
        sync.process_audio(c)
    run_and_collect(asyn, audio)

    assert asyn.input_ids == sync.input_ids
    assert asyn.get_sequence_str() == sync.get_sequence_str()
    assert [t["text"] for t in asyn.transcript] == [t["text"] for t in sync.transcript]
    assert asyn.resources.llm.n_tokens == sync.resources.llm.n_tokens
    assert asyn.resources.llm._step == sync.resources.llm._step


def test_async_forced_event_tokens_and_emissions(resources):
    """A forced event detours in the background: tokens match the BLOCKING
    pipelined agent (forced-event timers share pipelining's one-chunk lag vs
    the sync agent — the documented pipeline_chunks caveat) and the
    non-filler emissions are exactly its outputs in order (fillers only
    interleave, never replace)."""
    pipe = make_agent(resources, "pipe")
    asyn = make_agent(resources, "async")
    force_trans_once(pipe)
    force_trans_once(asyn)

    audio = chunks(8, seed=7)
    pipe_emissions = run_and_collect(pipe, audio)
    emissions = run_and_collect(asyn, audio)

    assert asyn.input_ids == pipe.input_ids
    assert [t["text"] for t in asyn.transcript] == [t["text"] for t in pipe.transcript]
    # blocking pipelined emits one priming silence then outputs in order;
    # async emits the same outputs with fillers interleaved
    pipe_out = [e for e, _ in pipe_emissions[1:]]
    non_filler = [e for e, filler in emissions if not filler]
    assert len(non_filler) == len(pipe_out)
    for got, want in zip(non_filler, pipe_out):
        np.testing.assert_allclose(got, want, atol=1e-5)
    # filler emissions are silence
    for e, filler in emissions:
        if filler:
            np.testing.assert_array_equal(e, np.zeros(1600, np.float32))


def test_async_with_incremental_trim(resources):
    """Async detours compose with incremental trims: token parity with the
    synchronous incremental-trim agent across a trim swap."""
    sync = make_agent(
        resources, "sync", incremental_trim=True,
        max_context_secs=1.0, trim_by_secs=0.5, trim_rebuild_slice_tokens=24,
    )
    asyn = make_agent(
        resources, "async", incremental_trim=True,
        max_context_secs=1.0, trim_by_secs=0.5, trim_rebuild_slice_tokens=24,
    )
    audio = chunks(20, seed=4)
    for c in audio:
        sync.process_audio(c)
    run_and_collect(asyn, audio)

    assert sync.trim_to_secs >= 0.5
    assert asyn.trim_to_secs == sync.trim_to_secs
    assert asyn.input_ids == sync.input_ids
    assert asyn.resources.llm.n_tokens == sync.resources.llm.n_tokens


def test_async_filler_counter(resources):
    """The agent reports how many filler chunks it emitted."""
    asyn = make_agent(resources, "async")
    force_trans_once(asyn)
    run_and_collect(asyn, chunks(8, seed=7))
    # at least the priming chunk of the pipeline is filler
    assert asyn.n_filler_emitted >= 1


def test_async_with_external_llm(resources):
    """Async detours compose with the external-LLM response path: the event
    (including the network round trip to the response server) resolves on
    the background thread; tokens and transcript match the sync agent."""
    import threading
    from http.server import ThreadingHTTPServer

    from tests.test_serving import _FakeOpenAIHandler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOpenAIHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        llm_kw = dict(
            use_external_llm=True,
            external_llm_base_url=f"http://127.0.0.1:{httpd.server_address[1]}/v1",
            external_llm_model="fake-model",
            external_llm_api_key="k",
        )
        sync = make_agent(resources, "sync", **llm_kw)
        asyn = make_agent(resources, "async", **llm_kw)

        def force_resp_once(agent, at_secs=0.3):
            fired = {"done": False}
            orig = agent.should_force_response

            def f():
                if not fired["done"] and agent.total_secs >= at_secs:
                    fired["done"] = True
                    return True
                return orig()

            agent.should_force_response = f

        force_resp_once(sync)
        force_resp_once(asyn)
        audio = chunks(8, seed=9)
        for c in audio:
            sync.process_audio(c)
        run_and_collect(asyn, audio)

        # With random weights the constrained native gen yields <2 tokens so
        # the event is suppressed-and-rolled-back on BOTH paths (the
        # scripted-LM tests in test_external_agent_paths pin the completed
        # path); what this pins is that the whole external round trip ran on
        # the DETOUR THREAD without deadlock and the agents end in the same
        # suppressed state.
        assert len(asyn.detour_durations) >= 1
        assert [t["text"] for t in asyn.transcript] == [
            t["text"] for t in sync.transcript
        ]
        assert asyn.resources.llm.n_tokens > 0
        assert asyn.llm_client is not None and sync.llm_client is not None
        # the agent stays live after the event
        out = asyn.process_audio(chunks(1, seed=10)[0])
        assert out.shape == (1600,)
        asyn.drain_pipeline()
    finally:
        httpd.shutdown()


def test_detour_failure_does_not_wedge_session(resources):
    """A detour job that raises (transient device error) must not deadlock or
    crash subsequent process_audio calls: the chain resyncs and a silence
    chunk stands in for the lost output."""
    import warnings

    asyn = make_agent(resources, "async")
    audio = chunks(6, seed=12)
    asyn.process_audio(audio[0])
    asyn.drain_pipeline()

    # sabotage exactly one detour: force an event whose sync processing raises
    orig_sync = asyn._process_chunk_sync
    blew = {"done": False}

    def exploding(*a, **kw):
        if not blew["done"]:
            blew["done"] = True
            raise RuntimeError("injected transient device failure")
        return orig_sync(*a, **kw)

    asyn._process_chunk_sync = exploding
    force_trans_once(asyn, at_secs=0.0)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        outs = [asyn.process_audio(c) for c in audio[1:]]
        while asyn.drain_pipeline() is not None:
            pass
    assert any("background detour failed" in str(w.message) for w in caught)
    for o in outs:
        assert o.shape == (1600,)
    # the session keeps processing real chunks afterwards
    out = asyn.process_audio(chunks(1, seed=13)[0])
    assert out.shape == (1600,)
    asyn.drain_pipeline()
    assert asyn.total_secs > 0.2


def test_per_call_blocking_attribution(resources):
    """Every process_audio call exposes last_call_acct: named wall-time
    sections (fetch wait, dispatch, chain resync, detour join) for the
    bench's over-budget tail attribution (VERDICT r4 weak-item 1). The
    accounting is tid-guarded, so detour-thread work must never land in a
    foreground call's dict."""
    import time as _time

    asyn = make_agent(resources, "async")
    audio = chunks(24, seed=21)
    seen = set()
    for c in audio:
        asyn.process_audio(c)
        acct = asyn.last_call_acct
        assert isinstance(acct, dict)
        assert all(v >= 0.0 for v in acct.values())
        seen.update(acct)
        # pace so background detours resolve and the pump reaches the
        # fused dispatch/fetch path
        fut = asyn._detour_future
        if fut is not None:
            for _ in range(400):
                if fut.done():
                    break
                _time.sleep(0.02)
    while asyn.drain_pipeline() is not None:
        pass
    assert "dispatch" in seen and "fetch" in seen, seen


def test_split_drive_async_matches_plain(resources):
    """The split dispatch/resolve drive in async-detour mode (the serving
    drive) must produce the same token stream and transcript as plain
    process_audio calls; emissions may differ only in filler placement."""
    plain = make_agent(resources, "async")
    split = make_agent(resources, "async")
    audio = chunks(20, seed=31)
    force_trans_once(plain, at_secs=0.5)
    force_trans_once(split, at_secs=0.5)
    for c in audio:
        plain.process_audio(c)
    while plain.drain_pipeline() is not None:
        pass
    for c in audio:
        split.process_audio_dispatch(c)
        out = split.process_audio_resolve()
        assert out is None or out.shape == (1600,)
    while split.drain_pipeline() is not None:
        pass
    assert split.input_ids == plain.input_ids
    assert split.get_sequence_str() == plain.get_sequence_str()
    assert [t["text"] for t in split.transcript] == [
        t["text"] for t in plain.transcript
    ]
