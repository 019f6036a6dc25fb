"""RealtimeAgentMultiprocessing: the child-process isolation wrapper used by
the live FastRTC client (reference realtime_agent_v2.py:791-928).

Covers the live-deployment configuration (pipeline_chunks=True): queued mic
chunks come back as same-size audio chunks, the in-flight pipelined chunk is
resolved by the child's idle-drain (no one-chunk output holdback once the mic
pauses), and the flag-based IPC (get_info / set_config_and_reset) works while
the child owns all device state.
"""
import numpy as np
import pytest

from realtime_codec_agent_tpu import RealtimeAgentConfig, RealtimeAgentMultiprocessing


@pytest.fixture(scope="module")
def mp_agent():
    agent = RealtimeAgentMultiprocessing(
        config=RealtimeAgentConfig(
            pipeline_chunks=True, use_whisper=False, agent_opening_text=None
        ),
        tiny=True,
        whisper_model=None,
    )
    yield agent
    agent.execute_process.terminate()


def collect_outputs(agent, n, timeout=180.0):
    import time

    outs, deadline = [], time.time() + timeout
    while len(outs) < n and time.time() < deadline:
        o = agent.next_output()
        if o is None:
            time.sleep(0.02)
        else:
            outs.append(o)
    return outs


def test_pipelined_chunks_roundtrip(mp_agent):
    rng = np.random.default_rng(0)
    n_in = 24  # > 2.0 s of audio so the profiler emits an RTF reading
    for _ in range(n_in):
        mp_agent.queue_input((0.1 * rng.normal(size=1600)).astype(np.float32))
    # priming silence + one output per input: the final input's chunk is
    # resolved by the child's idle-drain, not held until the next input
    outs = collect_outputs(mp_agent, n_in + 1)
    assert len(outs) == n_in + 1
    for audio, rtf in outs:
        assert audio.shape == (1600,)
        assert audio.dtype == np.float32
    assert any(rtf is not None for _, rtf in outs)

    info = mp_agent.get_info()
    assert info.total_secs == pytest.approx(n_in * 0.1, abs=1e-6)
    assert info.sampling_rate > 0 and info.chunk_size_samples == 1600
    assert info.config.pipeline_chunks


def test_set_config_and_reset(mp_agent):
    mp_agent.set_config_and_reset(
        RealtimeAgentConfig(
            pipeline_chunks=True, use_whisper=False, agent_opening_text=None, seed=7
        )
    )
    info = mp_agent.get_info()
    assert info.total_secs == 0.0
    assert info.config.seed == 7
    # agent still serves after the reset
    mp_agent.queue_input(np.zeros(1600, dtype=np.float32))
    outs = collect_outputs(mp_agent, 1, timeout=60.0)
    assert outs and outs[0][0].shape == (1600,)


def test_snapshot_restore_across_process_boundary(mp_agent):
    """snapshot() quiesces the child and ships the call state to the parent
    (pickle across the SimpleQueue); restore() resumes it in the child.
    Bit-exactness of the continuation is pinned at the agent level
    (tests/test_snapshot.py); this pins the IPC plumbing."""
    mp_agent.reset()
    rng = np.random.default_rng(3)
    n_in = 6
    for _ in range(n_in):
        mp_agent.queue_input((0.1 * rng.normal(size=1600)).astype(np.float32))
    collect_outputs(mp_agent, n_in, timeout=120.0)

    snap = mp_agent.snapshot()
    assert snap["engine_n_tokens"] > 0
    seq_len = len(snap["input_ids"])
    assert snap["config"].pipeline_chunks

    # a reset wipes the call...
    mp_agent.reset()
    assert mp_agent.get_info().total_secs == 0.0
    # ...and restore brings it back; the call continues from the snapshot
    mp_agent.restore(snap)
    info = mp_agent.get_info()
    assert info.total_secs == pytest.approx(n_in * 0.1, abs=1e-6)
    mp_agent.queue_input(np.zeros(1600, dtype=np.float32))
    outs = collect_outputs(mp_agent, 1, timeout=120.0)
    assert outs and outs[0][0].shape == (1600,)
    # the queued chunk commits when the child's idle-drain resolves it
    import time

    deadline = time.time() + 60.0
    info2 = mp_agent.get_info()
    while info2.total_secs <= info.total_secs and time.time() < deadline:
        time.sleep(0.1)
        info2 = mp_agent.get_info()
    assert len(info2.sequence) > 0
    assert info2.total_secs > info.total_secs
    # the sequence grew FROM the snapshot, not from a fresh header
    snap2 = mp_agent.snapshot()
    assert len(snap2["input_ids"]) > seq_len


def test_dead_child_raises_instead_of_hanging():
    """A child that crashes during startup (here: a nonexistent model path)
    must surface as a RuntimeError from the parent-side wait, not an infinite
    wait_until_running poll — every parent wait is liveness-aware."""
    with pytest.raises(RuntimeError, match="child process died"):
        RealtimeAgentMultiprocessing(
            config=RealtimeAgentConfig(
                pipeline_chunks=True, use_whisper=False, agent_opening_text=None
            ),
            tiny=True,
            whisper_model=None,
            llm_model_path="/nonexistent/model.gguf",
        )
