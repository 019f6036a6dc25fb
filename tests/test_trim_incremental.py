"""Incremental context-trim: the KV rebuild is amortized across chunks.

With config.incremental_trim the 80 s trim's cache rebuild (reference
realtime_agent_v2.py:725-733 does it as one blocking re-eval) spreads into a
shadow KV cache one prefill slice per chunk, then swaps. The schedule is
deterministic in processed-chunk count, so the synchronous, fused and
pipelined execution paths stay token-identical — the invariant pinned by
tests/test_pipeline.py for the other paths.
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


def make_agent(resources, pipeline: bool, incremental: bool = True,
               slice_tokens: int = 24):
    config = RealtimeAgentConfig(
        temperature=0.0,
        use_whisper=False,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        use_fused_step=True,
        pipeline_chunks=pipeline,
        incremental_trim=incremental,
        # small slices so the rebuild actually spans several chunks at tiny scale
        trim_rebuild_slice_tokens=slice_tokens,
        max_context_secs=1.0,
        trim_by_secs=0.5,
        seed=11,
    )
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


def test_incremental_trim_sync_pipe_parity(resources):
    """Sync and pipelined agents with incremental trims stay token-identical,
    the trim actually swaps in, and the fused precondition holds afterwards."""
    sync = make_agent(resources, pipeline=False)
    pipe = make_agent(resources, pipeline=True)
    audio = chunks(20, seed=4)
    for c in audio:
        sync.process_audio(c)
        pipe.process_audio(c)
    pipe.drain_pipeline()

    assert sync.trim_to_secs >= 0.5, "incremental trim never swapped in"
    assert pipe.trim_to_secs == sync.trim_to_secs
    assert pipe.input_ids == sync.input_ids
    assert pipe.resources.llm.n_tokens == sync.resources.llm.n_tokens
    assert pipe.resources.llm._step == sync.resources.llm._step
    # post-swap the cache is shorter than the sequence and the fused-path
    # precondition holds in cache coordinates
    assert sync.resources.llm.n_tokens < len(sync.input_ids) - 2
    assert sync._fused_ready()
    assert pipe._fused_ready()


def test_rebuild_spans_multiple_chunks(resources):
    """The rebuild must actually be incremental: between trigger and swap the
    agent keeps processing chunks with a live (untrimmed) cache."""
    agent = make_agent(resources, pipeline=False, slice_tokens=48)
    window_chunks = 0
    for c in chunks(30, seed=4):
        agent.process_audio(c)
        if agent._trim_rebuild is not None:
            window_chunks += 1
    assert agent.trim_to_secs >= 0.5
    assert window_chunks >= 2, "rebuild finished in <2 chunks; not incremental"


def test_swapped_cache_matches_scratch_prefill(resources):
    """Numeric check of the shadow rebuild: after the swap, the engine's
    cache/logits state must equal a from-scratch eval of the same mirror."""
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine

    agent = make_agent(resources, pipeline=False)
    for c in chunks(22, seed=4):
        agent.process_audio(c)
    assert agent.trim_to_secs >= 0.5
    llm = agent.resources.llm
    mirror = list(llm._input_ids)

    fresh = DuplexLMEngine(llm.params, llm.cfg)
    fresh.eval(mirror)
    assert fresh.n_tokens == llm.n_tokens
    # the caches agree on the valid region (the live one mixes rebuild-slice
    # prefills with fused-chunk commits; the fresh one is one blocking eval)
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
    # evaling the pending pair on both engines produces matching logits
    pending = agent.input_ids[-2:]
    llm.eval(pending)
    fresh.eval(pending)
    np.testing.assert_allclose(
        np.asarray(llm._last_logits), np.asarray(fresh._last_logits),
        rtol=1e-3, atol=1e-3,
    )


def test_restart_on_history_edit(resources):
    """An edit below the frozen watermark restarts the rebuild against the
    edited sequence (finalize_last_response splices old text)."""
    agent = make_agent(resources, pipeline=False, slice_tokens=8)
    found = False
    for c in chunks(20, seed=4):
        agent.process_audio(c)
        if agent._trim_rebuild is not None and not found:
            found = True
            frozen_end = agent._trim_rebuild["frozen_end"]
            progress_before = agent.resources.llm._rb_progress
            # simulate a splice-style edit below the watermark
            agent._trim_restart_on_edit(frozen_end - 4)
            assert agent._trim_rebuild is not None
            assert agent.resources.llm._rb_progress == 0
            # an edit above the watermark must NOT restart
            agent.resources.llm.rebuild_pump(8)
            agent._trim_restart_on_edit(agent._trim_rebuild["frozen_end"] + 1)
            assert agent.resources.llm._rb_progress > 0
            del progress_before
            break
    assert found, "rebuild window never observed"


def test_incremental_vs_blocking_both_valid(resources):
    """Blocking and incremental agents may diverge in WHEN the trim lands
    (incremental is a few chunks later) but both must end with a consistent
    cache/sequence mapping."""
    blocking = make_agent(resources, pipeline=False, incremental=False)
    incr = make_agent(resources, pipeline=False, incremental=True)
    for c in chunks(20, seed=4):
        blocking.process_audio(c)
        incr.process_audio(c)
    for agent in (blocking, incr):
        assert agent.trim_to_secs >= 0.5
        assert agent._fused_ready()
        llm = agent.resources.llm
        assert llm.n_tokens == agent.cache_pos(len(agent.input_ids) - 2)


def test_occupancy_emergency_trim(resources):
    """The cache-occupancy guard triggers a trim long before the time-based
    policy would (text-heavy sessions must never overflow the cache), and
    sync/pipelined stay token-identical."""
    def occ_agent(pipeline):
        a = make_agent(resources, pipeline=pipeline, incremental=True, slice_tokens=48)
        a.config.max_context_secs = 100.0   # time trigger never fires here
        a.config.trim_by_secs = 0.5
        cache_len = a.resources.llm._k.shape[2]
        a.config.trim_occupancy_margin = cache_len - 280
        return a

    sync = occ_agent(False)
    pipe = occ_agent(True)
    for c in chunks(24, seed=4):
        sync.process_audio(c)
        pipe.process_audio(c)
    pipe.drain_pipeline()

    assert sync.trim_to_secs >= 0.5, "occupancy trigger never fired"
    assert pipe.trim_to_secs == sync.trim_to_secs
    assert pipe.input_ids == sync.input_ids
    assert sync.resources.llm.n_tokens == pipe.resources.llm.n_tokens

    # blocking mode fires it too
    blocking = occ_agent(False)
    blocking.config.incremental_trim = False
    for c in chunks(24, seed=4):
        blocking.process_audio(c)
    assert blocking.trim_to_secs >= 0.5
