"""Tests for the duplex LM graph and the jitted decode engine (tiny config).

Covers the KV-cache disciplines the agent depends on: incremental decode ==
full forward, rollback via n_tokens, teacher-forced scoring, sampler chain
semantics (reference llamacpp_utils.py:26-181 behaviors).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
from realtime_codec_agent_tpu.models.llama import (
    DuplexLMConfig,
    forward,
    init_lm_params,
    logits_from_hidden,
    persist_codec_embeddings,
    set_codec_embeddings,
    tiny_lm_config,
)
from realtime_codec_agent_tpu.ops.sampling import (
    SamplerSettings,
    apply_penalties,
    make_window,
    sample_token,
)

VOCAB = 300


@pytest.fixture(scope="module")
def cfg():
    return tiny_lm_config(vocab_size=VOCAB)


@pytest.fixture(scope="module")
def params(cfg):
    return init_lm_params(jax.random.PRNGKey(0), cfg)


@pytest.fixture()
def engine(params, cfg):
    eng = DuplexLMEngine(params, cfg, seed=42)
    eng.init_sampler_for_generate(top_k=50, temp=0.0, seed=42)
    return eng


def full_logits(params, cfg, ids):
    hidden, _ = forward(params, jnp.asarray([ids]), cfg)
    return np.asarray(logits_from_hidden(params, hidden, cfg))[0]


def test_incremental_matches_full_forward(engine, params, cfg):
    ids = list(np.random.default_rng(0).integers(0, VOCAB, size=23))
    engine.eval(ids)
    inc_logits = engine.get_last_logits()
    ref_logits = full_logits(params, cfg, ids)[-1]
    np.testing.assert_allclose(inc_logits, ref_logits, rtol=2e-2, atol=2e-2)


def test_incremental_chunked_matches_one_shot(engine, params, cfg):
    rng = np.random.default_rng(1)
    ids = list(rng.integers(0, VOCAB, size=40))
    engine.eval(ids[:7])
    engine.eval(ids[7:25])
    engine.eval(ids[25:])
    ref_logits = full_logits(params, cfg, ids)[-1]
    np.testing.assert_allclose(engine.get_last_logits(), ref_logits, rtol=2e-2, atol=2e-2)


def test_greedy_generate_deterministic(engine):
    ids = [1, 2, 3, 4, 5]
    engine.eval(ids)
    t1 = engine.sample()
    t2 = engine.sample()
    assert t1 == t2  # greedy: same logits -> same token


def test_rollback_reproduces_tokens(engine):
    ids = [5, 6, 7, 8]
    engine.eval(ids)
    n0 = engine.n_tokens
    a = engine.eval_and_sample([9])
    assert engine.n_tokens == n0 + 1
    # roll back and redo: same token (greedy)
    engine.n_tokens = n0
    b = engine.eval_and_sample([9])
    assert a == b


def test_generate_generator_protocol(engine):
    engine.eval([1, 2, 3])
    gen = engine.generate([4], reset=False)
    t1 = next(gen)
    assert engine.n_tokens == 4  # the sampled token itself is not yet evaled
    t2 = next(gen)
    assert engine.n_tokens == 5  # advancing the generator evals the yielded token
    assert isinstance(t1, int) and isinstance(t2, int)


def test_get_logprobs_matches_manual(engine, params, cfg):
    ctx = [1, 2, 3, 4, 5, 6]
    tgt = [7, 8, 9]
    lps = engine.get_logprobs(ctx, tgt)
    logits = full_logits(params, cfg, ctx + tgt)
    manual = []
    for i, t in enumerate(tgt):
        lp = jax.nn.log_softmax(jnp.asarray(logits[len(ctx) - 1 + i]))[t]
        manual.append(float(lp))
    np.testing.assert_allclose(lps, manual, rtol=2e-2, atol=2e-2)


def test_fused_qkv_params_match_unfused(params, cfg):
    """fuse_lm_params_for_decode (the load-time 7->4 matmul fusion used by
    agent/resources) produces the same tokens and near-identical logits."""
    from realtime_codec_agent_tpu.models.llama import fuse_lm_params_for_decode

    fused = fuse_lm_params_for_decode(params)
    blk = fused["layers"][0]
    assert "wqkv" in blk and "w_gu" in blk and "wq" not in blk

    ref = DuplexLMEngine(params, cfg, seed=7)
    ref.init_sampler_for_generate(temp=0.0, seed=7)
    got = DuplexLMEngine(fused, cfg, seed=7)
    got.init_sampler_for_generate(temp=0.0, seed=7)
    seq = [1, 2, 3, 4, 5]
    ref.eval(seq)
    got.eval(seq)
    np.testing.assert_allclose(
        got.get_last_logits(), ref.get_last_logits(), rtol=5e-2, atol=5e-2
    )
    ref_toks = [ref.eval_and_sample([t]) for t in (6, 7, 8)]
    got_toks = [got.eval_and_sample([t]) for t in (6, 7, 8)]
    assert got_toks == ref_toks
    # scoring path (cacheless forward) too
    np.testing.assert_allclose(
        got.get_logprobs([1, 2, 3], [4, 5]),
        ref.get_logprobs([1, 2, 3], [4, 5]),
        rtol=5e-2, atol=5e-2,
    )
    # int8 quantization composes with the fused layout
    from realtime_codec_agent_tpu.models.llama import quantize_params_int8

    qf = quantize_params_int8(fused)
    assert "q" in qf["layers"][0]["wqkv"]
    q8 = DuplexLMEngine(qf, cfg, seed=7)
    q8.init_sampler_for_generate(temp=0.0, seed=7)
    q8.eval(seq)  # runs


def test_get_logprobs_batch_matches_individual(engine):
    """Batched scoring (finalize's one-forward path) equals per-pair calls,
    including with different context lengths padding to a shared bucket."""
    pairs = [
        ([1, 2, 3, 4, 5, 6], [7, 8, 9]),
        ([10, 11], [12, 13, 14, 15]),
    ]
    batched = engine.get_logprobs_batch(pairs)
    for (ctx, ids), got in zip(pairs, batched):
        want = engine.get_logprobs(ctx, ids)
        assert got.shape == want.shape == (len(ids),)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_get_logprobs_empty_ctx_raises(engine):
    """An empty ctx would make the output slice start at -1 and silently
    score the wrong positions; it must fail loudly instead (advisor r1)."""
    import pytest

    with pytest.raises(ValueError, match="non-empty ctx"):
        engine.get_logprobs([], [1, 2, 3])
    with pytest.raises(ValueError, match="non-empty ctx"):
        engine.get_logprobs_batch([([1, 2], [3]), ([], [4])])


def test_get_logprobs_does_not_disturb_kv(engine):
    engine.eval([1, 2, 3])
    before = engine.get_last_logits()
    engine.get_logprobs([4, 5], [6, 7])
    np.testing.assert_array_equal(engine.get_last_logits(), before)
    assert engine.n_tokens == 3


def test_last_probs(engine):
    engine.eval([1, 2, 3])
    probs = engine.last_probs([0, 1, 2])
    assert probs.shape == (3,)
    assert (probs >= 0).all() and probs.sum() <= 1.0 + 1e-5


def test_logit_bias_suppression(engine):
    engine.eval([1, 2, 3])
    greedy = engine.sample()
    engine.init_sampler_for_generate(temp=0.0, logit_bias={greedy: -1e9}, seed=42)
    suppressed = engine.sample()
    assert suppressed != greedy


def test_seeded_sampling_reproducible(params, cfg):
    e1 = DuplexLMEngine(params, cfg, seed=7)
    e2 = DuplexLMEngine(params, cfg, seed=7)
    for e in (e1, e2):
        e.init_sampler_for_generate(top_k=50, temp=1.0, seed=7)
        e.eval([1, 2, 3])
    toks1 = [e1.eval_and_sample([4]) for _ in range(5)]
    toks2 = [e2.eval_and_sample([4]) for _ in range(5)]
    assert toks1 == toks2


def test_context_overflow_raises(params):
    small = tiny_lm_config(vocab_size=VOCAB, max_context=32)
    p = init_lm_params(jax.random.PRNGKey(0), small)
    eng = DuplexLMEngine(p, small)
    with pytest.raises(RuntimeError):
        eng.eval(list(range(40)))


# -- sampler unit tests ------------------------------------------------------

def test_sampler_greedy_picks_argmax():
    logits = jnp.asarray(np.array([0.0, 5.0, 1.0, -2.0] + [0.0] * 124, np.float32))
    s = SamplerSettings(temp=0.0)
    w_ids, w_mask = make_window([])
    b_ids, b_vals = s.bias_arrays()
    tok = sample_token(
        logits, jax.random.PRNGKey(0), s.scalars(), b_ids, b_vals, w_ids, w_mask, top_k=10
    )
    assert int(tok) == 1


def test_sampler_top_k_restricts():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=128).astype(np.float32))
    order = np.argsort(np.asarray(logits))[::-1]
    s = SamplerSettings(temp=1.5, top_k=5, top_p=1.0, min_p=0.0)
    w_ids, w_mask = make_window([])
    b_ids, b_vals = s.bias_arrays()
    for i in range(20):
        tok = sample_token(
            logits, jax.random.PRNGKey(i), s.scalars(), b_ids, b_vals, w_ids, w_mask, top_k=5
        )
        assert int(tok) in order[:5]


def test_penalties_presence_and_frequency():
    logits = jnp.zeros(16, jnp.float32)
    w_ids, w_mask = make_window([3, 3, 5])
    out = apply_penalties(
        logits, w_ids, w_mask,
        repeat_penalty=jnp.float32(1.0),
        frequency_penalty=jnp.float32(0.5),
        presence_penalty=jnp.float32(1.0),
    )
    out = np.asarray(out)
    assert out[3] == pytest.approx(-2.0)  # 2 occurrences * 0.5 + 1.0
    assert out[5] == pytest.approx(-1.5)
    assert out[0] == 0.0


def test_repeat_penalty_sign_behavior():
    logits = jnp.asarray(np.array([2.0, -2.0, 1.0, 0.5], np.float32))
    w_ids, w_mask = make_window([0, 1])
    out = apply_penalties(
        logits, w_ids, w_mask,
        repeat_penalty=jnp.float32(2.0),
        frequency_penalty=jnp.float32(0.0),
        presence_penalty=jnp.float32(0.0),
    )
    out = np.asarray(out)
    assert out[0] == pytest.approx(1.0)   # positive: divided
    assert out[1] == pytest.approx(-4.0)  # negative: multiplied
    assert out[2] == 1.0


# -- codec embedding bridge --------------------------------------------------

def test_codec_llama_dual_route_and_persist():
    cfg = tiny_lm_config(vocab_size=VOCAB, codec_vocab_start=100, codebook_size=200)
    params = init_lm_params(jax.random.PRNGKey(1), cfg, with_codec_embed=True)
    table = np.random.default_rng(2).normal(size=(200, cfg.codebook_dim)).astype(np.float32)
    params = set_codec_embeddings(params, table, cfg)
    np.testing.assert_array_equal(np.asarray(params["codec_embed"]["table"]), table)

    ids = jnp.asarray([[5, 50, 150, 250]])  # mixed text + codec ids
    hidden_dual, _ = forward(params, ids, cfg)

    vanilla = persist_codec_embeddings(params, cfg, batch_size=64)
    assert "codec_embed" not in vanilla
    hidden_vanilla, _ = forward(vanilla, ids, cfg)
    np.testing.assert_allclose(
        np.asarray(hidden_dual), np.asarray(hidden_vanilla), rtol=2e-2, atol=2e-2
    )

    # text-region embeddings untouched by persist
    np.testing.assert_array_equal(
        np.asarray(vanilla["embed_tokens"][:100]), np.asarray(params["embed_tokens"][:100])
    )


def test_generate_until_matches_stepwise_sampled(cfg, params):
    """The jitted multi-token scan (generate_until) must produce the exact
    token stream of the per-token eval_and_sample loop — same PRNG schedule,
    same penalty window, same KV state afterwards (f32 so cross-program
    numerics cannot flip samples)."""
    import dataclasses

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import init_lm_params

    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    params32 = init_lm_params(jax.random.PRNGKey(2), cfg32)
    stop_id = 7

    def make():
        e = DuplexLMEngine(params32, cfg32, seed=5)
        e.init_sampler_for_generate(temp=1.0, top_k=50, repeat_penalty=1.3, seed=5)
        e.eval(list(range(20, 30)))
        return e

    # stepwise reference
    ref = make()
    first = 31
    ref_tokens = []
    tok = first
    for _ in range(16):
        tok = ref.eval_and_sample([tok])
        ref_tokens.append(tok)
        if tok == stop_id:
            break

    scan = make()
    toks, hit = scan.generate_until(first, stop_id=stop_id, max_n=16)
    assert toks == ref_tokens
    assert hit == (ref_tokens[-1] == stop_id)
    # engine bookkeeping identical: same mirror, n_tokens, step counter
    assert scan._input_ids == ref._input_ids
    assert scan.n_tokens == ref.n_tokens
    assert scan._step == ref._step
    # KV state equivalent: next decode step samples the same token
    assert scan.eval_and_sample([toks[-1]]) == ref.eval_and_sample([ref_tokens[-1]])


def test_generate_until_n_limit(cfg, params):
    """A dynamic n_limit caps accepted tokens exactly (no overshoot) while
    staying token-exact with the stepwise loop — one compiled max_n bucket
    serves every remaining-token cap."""
    import dataclasses

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import init_lm_params

    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    params32 = init_lm_params(jax.random.PRNGKey(2), cfg32)
    stop_id = -1  # never sampled: the cap must halt the device loop

    def make():
        e = DuplexLMEngine(params32, cfg32, seed=5)
        e.init_sampler_for_generate(temp=1.0, top_k=50, repeat_penalty=1.3, seed=5)
        e.eval(list(range(20, 30)))
        return e

    ref = make()
    ref_tokens = []
    tok = 31
    for _ in range(10):
        tok = ref.eval_and_sample([tok])
        ref_tokens.append(tok)

    lim = make()
    toks, hit = lim.generate_until(31, stop_id=stop_id, max_n=16, n_limit=10)
    assert toks == ref_tokens and not hit
    assert lim._input_ids == ref._input_ids
    assert lim.n_tokens == ref.n_tokens and lim._step == ref._step
    assert lim.eval_and_sample([toks[-1]]) == ref.eval_and_sample([ref_tokens[-1]])


def test_generate_until_view_bucket_crossing(cfg, params, monkeypatch):
    """gen_until reads the big cache through a STATIC occupancy-bucketed view
    (its K/V commits in a separate donated program). Token streams must be
    identical whichever bucket a call lands in AND as consecutive calls cross
    bucket boundaries — the slice only removes positions that cache_valid
    already masks (f32 so cross-program numerics cannot flip samples)."""
    import dataclasses

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import init_lm_params

    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    params32 = init_lm_params(jax.random.PRNGKey(2), cfg32)

    def run(gran):
        if gran is None:
            monkeypatch.setenv("RTCA_CACHE_VIEW", "0")
        else:
            monkeypatch.setenv("RTCA_CACHE_VIEW", "1")
            monkeypatch.setenv("RTCA_VIEW_GRAN", str(gran))
        e = DuplexLMEngine(params32, cfg32, seed=9)
        e.init_sampler_for_generate(temp=1.0, top_k=50, repeat_penalty=1.2, seed=9)
        e.eval([20 + (i % 200) for i in range(420)])
        views, stream = [], []
        for _ in range(6):
            views.append(e._view_bucket())
            toks, _ = e.generate_until(31, stop_id=-1, max_n=16)
            stream.extend(toks)
        return views, stream

    views_fine, stream_fine = run(256)
    assert len(set(views_fine)) >= 2, f"no bucket crossing exercised: {views_fine}"
    _, stream_full = run(None)
    assert stream_fine == stream_full


def test_prewarm_detours_smoke(cfg, params, monkeypatch):
    """prewarm_detours compiles every (program x view bucket) variant as
    no-ops: engine state is untouched and live calls still work after."""
    monkeypatch.setenv("RTCA_VIEW_GRAN", "1024")
    e = DuplexLMEngine(params, cfg, seed=3)
    e.init_sampler_for_generate(seed=3)
    e.eval([1, 2, 3])
    ids_before = list(e._input_ids)
    e.prewarm_detours(gen_buckets=(4,), frames_bucket=4)
    assert e._input_ids == ids_before and e.n_tokens == len(ids_before)
    toks, _ = e.generate_until(6, stop_id=-1, max_n=4)
    assert len(toks) == 4


def test_int8_quantized_decode_close(cfg, params):
    """int8 decode weights (q8_0-style per-channel) keep logits close to the
    full-precision path and run through the whole engine surface."""
    import dataclasses

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import (
        init_lm_params, quantize_params_int8,
    )

    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    params32 = init_lm_params(jax.random.PRNGKey(3), cfg32)
    qparams = jax.jit(quantize_params_int8)(params32)
    # quantized leaves have the expected layout
    assert qparams["layers"][0]["wq"]["q"].dtype == jnp.int8
    assert qparams["layers"][0]["attn_norm"].dtype == jnp.float32  # untouched

    full = DuplexLMEngine(params32, cfg32, seed=1)
    quant = DuplexLMEngine(qparams, cfg32, seed=1)
    ctx = list(range(10, 40))
    full.eval(ctx)
    quant.eval(ctx)
    lf = full.get_last_logits()
    lq = quant.get_last_logits()
    # int8 per-channel on random weights: logits track closely
    denom = max(1e-6, float(np.abs(lf).max()))
    assert float(np.abs(lf - lq).max()) / denom < 0.05
    # greedy argmax agrees on a clearly-peaked distribution
    assert int(np.argmax(lf)) == int(np.argmax(lq))
    # scoring and generate_until run on quantized weights
    lp = quant.get_logprobs(ctx, [5, 6])
    assert np.isfinite(lp).all()
    toks, _ = quant.generate_until(41, stop_id=1, max_n=8)
    assert len(toks) >= 1


def test_eval_and_sample_frames_matches_stepwise(params, cfg):
    """The one-program frame continuation must be token/state-exact with
    looping eval_and_sample — sampled mode, including event stop, step
    counter, penalty window, n_tokens, and subsequent decode behavior."""
    # treat ids <= 100 as "events" (non-audio); random weights will
    # eventually sample one with a wide-open sampler
    end_header = 100

    def run_stepwise(eng, pending, user_tokens):
        toks = []
        pair = list(pending)
        for u in user_tokens:
            a = eng.eval_and_sample(pair)
            if a <= end_header:
                return toks, a
            toks.append(a)
            pair = [a, u]
        return toks, None

    for seed in (0, 1, 2):
        ref = DuplexLMEngine(params, cfg, seed=seed)
        ref.init_sampler_for_generate(top_k=40, temp=1.2, seed=seed)
        got = DuplexLMEngine(params, cfg, seed=seed)
        got.init_sampler_for_generate(top_k=40, temp=1.2, seed=seed)
        got.set_end_header_token_id(end_header)
        prefix = [5, 200, 300, 400]
        ref.eval(prefix)
        got.eval(prefix)
        pending = [150, 160]
        users = [170, 180, 190, 175]

        ref_toks, ref_event = run_stepwise(ref, pending, users)
        got_toks, got_event = got.eval_and_sample_frames(pending, users)

        assert got_toks == ref_toks, (seed, got_toks, ref_toks)
        assert got_event == ref_event, (seed, got_event, ref_event)
        assert got.n_tokens == ref.n_tokens
        assert got._step == ref._step
        assert got._input_ids == ref._input_ids
        np.testing.assert_allclose(
            got.get_last_logits(), ref.get_last_logits(), rtol=1e-4, atol=1e-4
        )
        # the engines must stay in lockstep afterwards
        nxt = [int(ref_toks[-1]) if ref_toks else 150, 170]
        assert got.eval_and_sample(nxt) == ref.eval_and_sample(nxt)


def test_eval_and_sample_frames_int8_quantized(params, cfg):
    """The multi-frame continuation program composes with int8-quantized
    (and fused) params — the deployment config the agent actually runs."""
    from realtime_codec_agent_tpu.models.llama import (
        fuse_lm_params_for_decode,
        quantize_params_int8,
    )

    qf = quantize_params_int8(fuse_lm_params_for_decode(params))
    eng = DuplexLMEngine(qf, cfg, seed=3)
    eng.init_sampler_for_generate(temp=0.0, seed=3)
    eng.set_end_header_token_id(100)
    eng.eval([5, 200, 300, 400])
    toks, event = eng.eval_and_sample_frames([150, 160], [170, 180, 190])
    assert len(toks) <= 3
    # deterministic replay from the same state
    eng2 = DuplexLMEngine(qf, cfg, seed=3)
    eng2.init_sampler_for_generate(temp=0.0, seed=3)
    eng2.set_end_header_token_id(100)
    eng2.eval([5, 200, 300, 400])
    toks2, event2 = eng2.eval_and_sample_frames([150, 160], [170, 180, 190])
    assert (toks, event) == (toks2, event2)


def test_view_bucket_helpers_consistent(monkeypatch):
    """Prewarm and dispatch share ONE view-bucket source: every bucket
    view_bucket_for can return must be in view_buckets (a miss would
    reintroduce mid-run cold compiles — CLAUDE.md prewarm invariant)."""
    from realtime_codec_agent_tpu.lm.engine import (
        view_bucket_for,
        view_buckets,
        view_granularity,
    )

    monkeypatch.delenv("RTCA_VIEW_GRAN", raising=False)
    monkeypatch.setenv("RTCA_CACHE_VIEW", "1")
    for cache_len in (1024, 8192, 18432, 20480):
        buckets = view_buckets(cache_len)
        assert buckets[-1] == 0 and 0 not in buckets[:-1]
        gran = view_granularity(cache_len)
        assert all(b % gran == 0 and b < cache_len for b in buckets[:-1])
        for need in range(0, cache_len + gran, max(1, gran // 7)):
            assert view_bucket_for(need, cache_len) in buckets
    # disabled: only the full view exists, and dispatch requests only it
    monkeypatch.setenv("RTCA_CACHE_VIEW", "0")
    assert view_buckets(8192) == [0]
    assert view_bucket_for(300, 8192) == 0
