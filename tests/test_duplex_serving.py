"""Duplex serving server: R concurrent full-duplex calls over TCP.

Pins (tiny models, CPU):
- two concurrent calls stream chunks and get agent audio + a final report;
- a served call's audio is bit-identical to driving a direct RealtimeAgent
  with the same seed/config on the same chunks (the slot pool + group
  coordinator is a pure scheduling overlay);
- claim/release reuses slots across sequential calls;
- a full server rejects the (R+1)th concurrent call with a clean error;
- devices=[d0,d1] splits the slots into per-chip replicated pools (weights
  committed per device, bit-identical streams, claims spread across pools).
"""
import threading

import numpy as np
import pytest

from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
from realtime_codec_agent_tpu.serving.duplex_client import DuplexCall
from realtime_codec_agent_tpu.serving.duplex_server import DuplexServingServer, serve

N_CHUNKS = 6


@pytest.fixture(scope="module")
def duplex_srv():
    codec = JaxCodecModel.random_init(tiny_codec_config(), seed=0)
    duplex = DuplexServingServer(
        max_calls=2, tiny=True, codec_model=codec,
        underrun_timeout_secs=30.0,  # tests must never inject silence
    )
    srv = serve(duplex, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], duplex
    srv.shutdown()
    duplex.shutdown()


def _stream(port, seed, chunks):
    call = DuplexCall(port=port, config={"seed": seed})
    for c in chunks:
        call.send_chunk(c)
    report = call.hangup()
    return call, report


def _user_chunks(seed, n, chunk_samples):
    rng = np.random.default_rng(seed)
    return [
        (0.1 * rng.normal(size=chunk_samples)).astype(np.float32) for _ in range(n)
    ]


def test_two_concurrent_calls(duplex_srv):
    port, duplex = duplex_srv
    n = duplex.chunk_samples
    chunks_a = _user_chunks(100, N_CHUNKS, n)
    chunks_b = _user_chunks(200, N_CHUNKS, n)

    results = {}

    def run(name, seed, chunks):
        results[name] = _stream(port, seed, chunks)

    ta = threading.Thread(target=run, args=("a", 7, chunks_a))
    tb = threading.Thread(target=run, args=("b", 8, chunks_b))
    ta.start(); tb.start(); ta.join(60); tb.join(60)
    assert set(results) == {"a", "b"}
    for name in ("a", "b"):
        call, report = results[name]
        audio = call.collected_audio()
        assert report["type"] == "report"
        assert report["chunks"] == N_CHUNKS
        assert report["underruns"] == 0
        # pipelined: every processed chunk emits one output chunk (+ drain tail)
        assert len(audio) >= N_CHUNKS * n
        assert np.isfinite(audio).all()


def test_served_call_matches_direct_agent(duplex_srv):
    port, duplex = duplex_srv
    n = duplex.chunk_samples
    chunks = _user_chunks(300, N_CHUNKS, n)
    call, report = _stream(port, 21, chunks)
    served = call.collected_audio()
    assert report["underruns"] == 0

    import dataclasses

    from realtime_codec_agent_tpu.agent.agent import RealtimeAgent

    cfg = dataclasses.replace(duplex.base_config, seed=21)
    # fresh caches over the same weights: no interference with the live pool
    agent = RealtimeAgent(
        resources=duplex.slots[0].agent.resources.clone_for_self_play(), config=cfg
    )
    direct = []
    for c in chunks:
        out = agent.process_audio(c)
        if out is not None:
            direct.append(np.asarray(out, np.float32))
    tail = agent.drain_pipeline()
    if tail is not None:
        direct.append(np.asarray(tail, np.float32))
    direct_audio = np.concatenate(direct)

    # the wire carries int16: apply the same transform to the direct audio
    # and compare exactly (served floats are int16/32768 by construction)
    direct_wire = (
        np.clip(np.nan_to_num(direct_audio), -1.0, 1.0) * 32767.0
    ).astype("<i2").astype(np.float32) / 32768.0
    assert len(served) == len(direct_audio)
    np.testing.assert_array_equal(served, direct_wire)


def test_slot_reuse_and_server_full(duplex_srv):
    port, duplex = duplex_srv
    n = duplex.chunk_samples
    chunks = _user_chunks(400, 2, n)

    # occupy both slots, third call must be rejected cleanly
    c1 = DuplexCall(port=port, config={"seed": 1})
    c2 = DuplexCall(port=port, config={"seed": 2})
    with pytest.raises(RuntimeError, match="server full"):
        DuplexCall(port=port, config={"seed": 3})
    for c in chunks:
        c1.send_chunk(c)
        c2.send_chunk(c)
    r1 = c1.hangup()
    r2 = c2.hangup()
    assert r1["type"] == "report" and r2["type"] == "report"

    # slots are free again
    c3, r3 = _stream(port, 4, chunks)
    assert r3["type"] == "report"
    assert r3["chunks"] == 2


def test_multi_device_pools():
    """devices=[d0, d1]: slots split into per-chip replicated pools — pool-1
    weights committed to device 1, calls spread across pools, and a call
    served from pool 1 is bit-identical to a direct agent (the multi-chip
    layout is pure replication, zero collectives)."""
    import dataclasses

    import jax

    from realtime_codec_agent_tpu.agent.agent import RealtimeAgent

    devs = jax.devices()[:2]
    codec = JaxCodecModel.random_init(tiny_codec_config(), seed=0)
    duplex = DuplexServingServer(
        max_calls=4, tiny=True, codec_model=codec, devices=devs,
        underrun_timeout_secs=30.0,
    )
    srv = serve(duplex, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    try:
        assert len(duplex.pools) == 2
        assert [s.idx for s in duplex.pools[1].slots] == [2, 3]
        leaf = jax.tree.leaves(duplex.slots[2].agent.resources.lm_params)[0]
        assert list(leaf.devices()) == [devs[1]]

        n = duplex.chunk_samples
        chunks = _user_chunks(500, N_CHUNKS, n)
        # fill pool 0 so the third call lands on pool 1 (slot 2); no OTHER
        # claim happens while this call streams — a concurrent activation
        # stalls the pool for the reset's device work, and when an event is
        # in flight the detour's replay placement in the OUTPUT is
        # timing-dependent by design (realtime filler); token-level event
        # identity is pinned by tests/test_async_detours.py
        hold = [DuplexCall(port=port, config={"seed": s}) for s in (1, 2)]
        call = DuplexCall(port=port, config={"seed": 31})
        assert call.slot == 2
        for c in chunks:
            call.send_chunk(c)
        report = call.hangup()
        served = call.collected_audio()
        assert report["underruns"] == 0

        # claims spread across pools; a 5th concurrent call exceeds them
        c4 = DuplexCall(port=port, config={"seed": 4})
        c5 = DuplexCall(port=port, config={"seed": 5})
        assert {c4.slot, c5.slot} == {2, 3}
        with pytest.raises(RuntimeError, match="server full"):
            DuplexCall(port=port, config={"seed": 6})
        c4.hangup()
        c5.hangup()
        for h in hold:
            h.hangup()

        cfg = dataclasses.replace(duplex.base_config, seed=31)
        agent = RealtimeAgent(
            resources=duplex.slots[2].agent.resources.clone_for_self_play(),
            config=cfg,
        )
        direct = []
        for c in chunks:
            out = agent.process_audio(c)
            if out is not None:
                direct.append(np.asarray(out, np.float32))
        tail = agent.drain_pipeline()
        if tail is not None:
            direct.append(np.asarray(tail, np.float32))
        direct_audio = np.concatenate(direct)
        direct_wire = (
            np.clip(np.nan_to_num(direct_audio), -1.0, 1.0) * 32767.0
        ).astype("<i2").astype(np.float32) / 32768.0
        assert len(served) == len(direct_audio)
        np.testing.assert_array_equal(served, direct_wire)
    finally:
        srv.shutdown()
        duplex.shutdown()


def test_call_migration_via_snapshot(duplex_srv):
    """Mid-call snapshot over the wire, then resume as a NEW call (the
    migration path): the resumed call carries the session forward — token
    sequence, transcript, timers — and keeps streaming. Bit-exactness of
    the continuation is pinned at the agent level (tests/test_snapshot.py);
    this pins the serving protocol plumbing."""
    port, duplex = duplex_srv
    n = duplex.chunk_samples
    chunks = _user_chunks(600, N_CHUNKS, n)

    call = DuplexCall(port=port, config={"seed": 41})
    for c in chunks[:3]:
        call.send_chunk(c)
    st = call.stats()
    assert st["type"] == "stats"
    assert st["max_calls"] == 2 and st["active_calls"] >= 1
    blob = call.snapshot()
    assert isinstance(blob, bytes) and len(blob) > 0
    # the checkpoint consumed everything sent so far: the client's resend
    # alignment point
    assert call.last_snapshot_chunks == 3
    import pickle

    snap = pickle.loads(blob)
    seq_len_at_snapshot = len(snap["input_ids"])
    assert seq_len_at_snapshot > 0
    report1 = call.hangup()
    assert report1["type"] == "report"

    resumed = DuplexCall(port=port, snapshot=blob)
    for c in chunks[3:]:
        resumed.send_chunk(c)
    report2 = resumed.hangup()
    audio2 = resumed.collected_audio()
    assert report2["type"] == "report"
    assert report2["chunks"] == N_CHUNKS - 3
    assert len(audio2) >= (N_CHUNKS - 3) * n
    assert np.isfinite(audio2).all()
    # the resumed slot's sequence grew FROM the snapshot, not from a reset
    slot = duplex.slots[resumed.slot]
    assert len(slot.agent.input_ids) > seq_len_at_snapshot
    st2 = duplex.stats()
    assert st2["pools"][0]["ticks"] >= N_CHUNKS


def test_stale_release_and_activation_failure(duplex_srv):
    """Claim generations: a stale release (after the slot was re-claimed)
    must not kill the new call; a corrupt snapshot resume surfaces as a
    wire error instead of a silent dead call."""
    import pickle
    import time

    port, duplex = duplex_srv

    # stale release is a no-op on the re-claimed slot
    idx1, gen1, _, _ = duplex.claim({"seed": 51})
    duplex.release(idx1, gen1)
    idx2, gen2, _, _ = duplex.claim({"seed": 52})
    assert idx2 == idx1 and gen2 == gen1 + 1
    stale = duplex.release(idx1, gen1)  # the OLD call's handler retrying
    assert stale["chunks"] == 0
    # the new claim is still live (pending or active)
    slot = duplex.slots[idx2]
    assert slot.active or slot.pending_cfg is not None
    duplex.release(idx2, gen2)

    # corrupt snapshot: restore fails at activation -> client gets an error
    good = DuplexCall(port=port, config={"seed": 53})
    good.send_chunk(np.zeros(duplex.chunk_samples, np.float32))
    blob = good.snapshot()
    good.hangup()
    snap = pickle.loads(blob)
    snap["engine_n_tokens"] += 1  # restore's cache-length check must fire
    bad = DuplexCall(port=port, snapshot=pickle.dumps(snap))
    deadline = time.time() + 60.0
    while bad.report is None and time.time() < deadline:
        time.sleep(0.05)
    assert bad.report is not None and bad.report["type"] == "error"
    assert "activation failed" in bad.report["message"]
    bad.hangup()


def test_rejects_bad_config_and_bad_chunk(duplex_srv):
    port, duplex = duplex_srv
    with pytest.raises(RuntimeError, match="not overridable"):
        DuplexCall(port=port, config={"chunk_size_secs": 0.2})
    call = DuplexCall(port=port, config={})
    call.send_chunk(np.zeros(duplex.chunk_samples + 1, np.float32))
    report = call.hangup()
    assert report.get("type") in ("error", "report")


def test_no_split_drive_serves_identically():
    """The --no_split_drive escape (interleaved per-row dispatch+resolve)
    must produce the same served audio as the default split drive for the
    same seed/input — the drives differ only in scheduling."""
    codec = JaxCodecModel.random_init(tiny_codec_config(), seed=0)
    outs = {}
    for split in (True, False):
        duplex = DuplexServingServer(
            max_calls=2, tiny=True, codec_model=codec,
            split_drive=split, underrun_timeout_secs=30.0,
        )
        srv = serve(duplex, "127.0.0.1", 0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            port = srv.server_address[1]
            chunks = _user_chunks(500, N_CHUNKS, duplex.chunk_samples)
            call, report = _stream(port, 33, chunks)
            assert report["underruns"] == 0
            outs[split] = call.collected_audio()
        finally:
            srv.shutdown()
            duplex.shutdown()
    np.testing.assert_array_equal(outs[True], outs[False])
