"""Batched decode engine + continuous-batching backend.

The contract: N concurrent greedy requests through the batched path produce
exactly the sequences the sequential engine produces one-at-a-time, while
sharing one device step program.
"""
import threading

import jax
import numpy as np
import pytest

from realtime_codec_agent_tpu.lm.batched_engine import BatchedDecodeEngine
from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
from realtime_codec_agent_tpu.models.llama import init_lm_params, tiny_lm_config
from realtime_codec_agent_tpu.serving.backend import CompletionBackend
from realtime_codec_agent_tpu.serving.batched_backend import BatchedCompletionBackend
from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer


@pytest.fixture(scope="module")
def setup():
    tok = CodecTextTokenizer(codebook_size=1024)
    cfg = tiny_lm_config(
        vocab_size=((tok.vocab_size + 7) // 8) * 8,
        compute_dtype="float32",
        max_context=256,
    )
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    return tok, cfg, params


def _sequential_greedy(params, cfg, prompt_ids, n):
    eng = DuplexLMEngine(params, cfg, seed=0)
    eng.init_sampler_for_generate(temp=0.0, top_k=0, seed=0)
    out = []
    eng.eval(prompt_ids[:-1])
    tok = prompt_ids[-1]
    for _ in range(n):
        tok = eng.eval_and_sample([tok])
        out.append(tok)
    return out


def test_batched_rows_match_sequential_greedy(setup):
    tok, cfg, params = setup
    prompts = [
        tok.encode("hello there"),
        tok.encode("a completely different prompt!"),
        tok.encode("x"),
    ]
    n = 8
    refs = [_sequential_greedy(params, cfg, p, n) for p in prompts]

    eng = BatchedDecodeEngine(params, cfg, batch_size=4, max_context=256, seed=0)
    for row, p in enumerate(prompts):
        eng.set_row_sampler(row, temp=0.0)
        eng.prefill_row(row, p)
    active = [True, True, True, False]
    outs = [[] for _ in prompts]
    for _ in range(n):
        tokens = eng.step(active)
        for r in range(len(prompts)):
            outs[r].append(tokens[r])
    assert outs == refs

    # a freed slot can be re-used for a new prompt without disturbing others
    refs2_long = _sequential_greedy(params, cfg, prompts[2], n + 2)
    eng.prefill_row(1, prompts[2])
    eng.set_row_sampler(1, temp=0.0)
    tokens = eng.step([False, True, True, False])
    assert tokens[1] == refs2_long[0]       # fresh prompt decodes from scratch
    assert tokens[2] == refs2_long[n]       # row 2 keeps its own continuation
    more = eng.step([False, True, True, False])
    assert more[1] == refs2_long[1]
    assert more[2] == refs2_long[n + 1]
    # row 0 state untouched while inactive
    assert eng.offsets[0] == len(prompts[0]) - 1 + n


def test_multi_step_dispatch_token_identical(setup):
    """steps=S in one program == S consecutive single steps (same active
    mask): the per-token PRNG/penalty schedule is per-row device state, so
    the fetch-amortized serving path must not change any sampled token."""
    tok, cfg, params = setup
    prompts = [tok.encode("hello there"), tok.encode("zq")]

    def run(steps_list):
        eng = BatchedDecodeEngine(params, cfg, batch_size=2, max_context=256, seed=0)
        for row, p in enumerate(prompts):
            eng.set_row_sampler(row, temp=0.9, top_k=50, repeat_penalty=1.1, seed=row)
            eng.prefill_row(row, p)
        outs = [[] for _ in prompts]
        for s in steps_list:
            tokens = eng.step([True, True], steps=s)
            if s == 1:
                tokens = [[t] for t in tokens]
            for r in range(len(prompts)):
                outs[r].extend(tokens[r])
        return outs

    assert run([1] * 12) == run([4, 4, 4]) == run([8, 4]) == run([12])


def test_batched_seed_reproducible_and_guards(setup):
    tok, cfg, params = setup
    engine = BatchedDecodeEngine(params, cfg, batch_size=2, max_context=256, seed=0)
    backend = BatchedCompletionBackend(engine, tok)
    a = "".join(backend.generate("hello", max_tokens=8, temperature=1.0, seed=7))
    b = "".join(backend.generate("hello", max_tokens=8, temperature=1.0, seed=7))
    c = "".join(backend.generate("hello", max_tokens=8, temperature=1.0, seed=8))
    assert a == b            # per-request seeds survive slot reuse
    assert a != c or len(a) == 0
    # oversized prompts are rejected on the request thread; the worker (and
    # other requests) keep running
    with pytest.raises(ValueError, match="prompt too long"):
        list(backend.generate("x" * 4000, max_tokens=4))
    assert "".join(backend.generate("hello", max_tokens=4, temperature=0.0))
    # max_tokens is capped by the serving cache: the stream ends with
    # finish_reason length instead of decoding past the cache
    long_prompt = "y" * 100
    out = "".join(backend.generate(long_prompt, max_tokens=100000, temperature=0.0))
    assert backend.last_finish_reason in ("stop", "length")


def test_batched_backend_concurrent_requests(setup):
    tok, cfg, params = setup
    seq_eng = DuplexLMEngine(params, cfg, seed=0)
    seq_backend = CompletionBackend(seq_eng, tok)
    prompts = ["hello wor", "abcd", "zq"]
    refs = ["".join(seq_backend.generate(p, max_tokens=10, temperature=0.0)) for p in prompts]

    engine = BatchedDecodeEngine(params, cfg, batch_size=4, max_context=256, seed=0)
    backend = BatchedCompletionBackend(engine, tok)
    results = {}

    def run(p):
        results[p] = "".join(backend.generate(p, max_tokens=10, temperature=0.0))
        results[p + "/reason"] = backend.last_finish_reason

    threads = [threading.Thread(target=run, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert [results[p] for p in prompts] == refs
    assert all(results[p + "/reason"] in ("stop", "length") for p in prompts)

    # stop strings apply per request
    stop = refs[0][2:4]
    cut = "".join(backend.generate(prompts[0], max_tokens=10, temperature=0.0, stop=[stop]))
    assert cut == refs[0][: refs[0].find(stop)]
    assert backend.last_finish_reason == "stop"


def test_batched_backend_behind_http_server(setup):
    """The OpenAI-compatible server runs unchanged over the batched backend."""
    from realtime_codec_agent_tpu.serving.client import CompletionsClient
    from realtime_codec_agent_tpu.serving.server import CompletionServer

    tok, cfg, params = setup
    engine = BatchedDecodeEngine(params, cfg, batch_size=2, max_context=256, seed=0)
    backend = BatchedCompletionBackend(engine, tok)
    server = CompletionServer(backend, host="127.0.0.1", port=0)
    server.start_background()
    try:
        client = CompletionsClient(base_url=f"http://127.0.0.1:{server.httpd.server_address[1]}/v1")
        ref = _sequential_greedy(params, cfg, tok.encode("xyz"), 6)
        text, reason = client.complete_with_reason("xyz", max_tokens=6, temperature=0.0)
        assert text == tok.decode(ref, skip_special_tokens=False)
        assert reason in ("stop", "length")
    finally:
        server.shutdown()


def test_bucket_boundary_crossing_token_identical(setup):
    """The occupancy-bucketed cache read recompiles at powers of two; a row
    decoding ACROSS a bucket boundary (256 -> 512 here) must produce exactly
    the sequential engine's tokens — the bucket bounds traffic, never
    attention content."""
    tok, cfg, params = setup
    import dataclasses

    cfg_big = dataclasses.replace(cfg, max_context=1024)
    rng = np.random.default_rng(7)
    prompt = [int(t) for t in rng.integers(5, 200, size=250)]
    n = 16  # crosses offset 256 mid-decode
    ref = _sequential_greedy(params, cfg_big, prompt, n)

    eng = BatchedDecodeEngine(params, cfg_big, batch_size=2, max_context=1024, seed=0)
    eng.set_row_sampler(0, temp=0.0)
    eng.prefill_row(0, prompt)
    assert eng._cache_bucket() == 256
    out = []
    for _ in range(n // 4):
        out.extend(eng.step([True, False], steps=4)[0])
    assert eng._cache_bucket() == 512  # the boundary was crossed
    assert out == ref


def test_sharded_batched_serving_token_identical(setup):
    """Multi-chip serving: dp-sharded stream rows x tp-sharded weights on a
    device mesh produce exactly the single-device engine's tokens (XLA infers
    the collectives; compute-follows-data). This is the scale-out path for
    the serving engine — a mesh-shape change, no program changes."""
    from realtime_codec_agent_tpu.parallel import (
        make_mesh, shard_batched_engine_for_serving,
    )

    tok, cfg, params = setup
    prompts = [
        tok.encode("hello there"),
        tok.encode("a completely different prompt!"),
        tok.encode("x"),
        tok.encode("fourth stream"),
    ]

    def run(mesh):
        eng = BatchedDecodeEngine(params, cfg, batch_size=4, max_context=256, seed=0)
        if mesh is not None:
            shard_batched_engine_for_serving(eng, mesh)
        for row, p in enumerate(prompts):
            eng.set_row_sampler(row, temp=0.0)
            eng.prefill_row(row, p)
        outs = [[] for _ in prompts]
        for _ in range(2):
            tokens = eng.step([True] * 4, steps=4)
            for r in range(len(prompts)):
                outs[r].extend(tokens[r])
        return outs

    ref = run(None)
    mesh = make_mesh(dp=2, fsdp=1, tp=2)
    assert run(mesh) == ref

    # bad row/dp factorization fails loudly
    eng = BatchedDecodeEngine(params, cfg, batch_size=3, max_context=256, seed=0)
    with pytest.raises(ValueError, match="must divide"):
        shard_batched_engine_for_serving(eng, mesh)


def test_sharded_backend_end_to_end(setup):
    """The continuous-batching backend runs unchanged on a mesh-sharded
    engine (the server's --mesh path): prewarm + admission + streaming all
    execute under dp x tp sharding with the same text out."""
    from realtime_codec_agent_tpu.parallel import (
        make_mesh, shard_batched_engine_for_serving,
    )

    tok, cfg, params = setup
    seq_backend = CompletionBackend(DuplexLMEngine(params, cfg, seed=0), tok)
    ref = "".join(seq_backend.generate("hello wor", max_tokens=8, temperature=0.0))

    engine = BatchedDecodeEngine(params, cfg, batch_size=4, max_context=256, seed=0)
    shard_batched_engine_for_serving(engine, make_mesh(dp=2, fsdp=1, tp=2))
    backend = BatchedCompletionBackend(engine, tok)
    out = "".join(backend.generate("hello wor", max_tokens=8, temperature=0.0))
    assert out == ref
