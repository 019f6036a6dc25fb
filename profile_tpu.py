"""One-off TPU hot-path profiler.

Times, on the real chip: tunnel RTT, host->device transfer, one LM decode
step (forward + head + sample), forward-only, head-only, codec encode/decode
over the 2 s context, and the whole fused chunk. Run:
    python profile_tpu.py [--skip-fused]

NOTE (axon tunnel): block_until_ready does NOT await completion there — every
measurement must round-trip real data, so each benched callable ends in a
jax.device_get of a small result slice.
"""
import argparse
import sys
import time

import numpy as np

from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def bench(label, fn, n=30, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    ts = np.array(ts)
    print(f"{label:36s} p50={np.percentile(ts,50):8.2f}ms p10={np.percentile(ts,10):8.2f}ms p90={np.percentile(ts,90):8.2f}ms", flush=True)
    return float(np.percentile(ts, 50))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-fused", action="store_true")
    args = parser.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    # --- 1. tunnel RTT / dispatch ---
    f_tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros((8,), jnp.float32)
    bench("tiny jit call + fetch (RTT)", lambda: jax.device_get(f_tiny(x8)))

    host_buf = np.zeros(1600, np.float32)
    bench("device_put 1600 f32", lambda: jax.device_put(host_buf).block_until_ready())
    dev_buf = jax.device_put(np.zeros(8000, np.float32))
    bench("device_get 8000 f32", lambda: jax.device_get(dev_buf))

    # 8 small transfers then one tiny call (mimics fused arg prep)
    def many_transfers():
        a = [jax.device_put(np.zeros(s, np.float32)) for s in (1600, 2, 7, 4, 4, 64, 64, 1)]
        jax.device_get(f_tiny(x8))
    bench("8 device_puts + tiny call+fetch", many_transfers)

    # --- 2. LM step at full size ---
    from realtime_codec_agent_tpu.models.llama import (
        forward, init_lm_params, llama32_1b_config, logits_from_hidden,
    )
    from realtime_codec_agent_tpu.ops.sampling import SamplerSettings, make_window, sample_token

    t0 = time.time()
    cfg = llama32_1b_config(vocab_size=259584, max_context=16384)
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    print(f"param init: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    cache_len = cfg.max_context + 2048
    kv_shape = (cfg.num_layers, 1, cache_len, cfg.num_kv_heads, cfg.head_dim)
    k = jnp.zeros(kv_shape, jnp.bfloat16)
    v = jnp.zeros(kv_shape, jnp.bfloat16)

    @jax.jit
    def fwd_only(params, k, v, tokens, offset):
        hidden, (k2, v2) = forward(params, tokens, cfg, kv_cache=(k, v), cache_offset=offset)
        return hidden[:, -1], k2, v2

    @jax.jit
    def fwd_nocache(params, tokens):
        hidden, _ = forward(params, tokens, cfg)
        return hidden[:, -1]

    @jax.jit
    def head_only(params, h):
        return logits_from_hidden(params, h, cfg)

    settings = SamplerSettings(top_k=100, temp=1.0)
    bias_ids, bias_vals = settings.bias_arrays()
    window_ids, window_mask = make_window([])
    scalars = settings.scalars()

    import functools

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def decode_step(params, k, v, tokens, offset, key, scalars, bias_ids, bias_vals, window_ids, window_mask):
        hidden, (k, v) = forward(params, tokens, cfg, kv_cache=(k, v), cache_offset=offset)
        logits = logits_from_hidden(params, hidden[:, -1], cfg)[0]
        token = sample_token(logits, key, scalars, bias_ids, bias_vals, window_ids, window_mask, top_k=100)
        return token, k, v

    toks = jnp.zeros((1, 2), jnp.int32)
    off = jnp.int32(1000)
    key = jax.random.PRNGKey(0)

    h, _, _ = fwd_only(params, k, v, toks, off)
    bench("LM fwd T=2 (no donate, ret kv)", lambda: jax.device_get(fwd_only(params, k, v, toks, off)[0][0, :4]))
    bench("LM head only (1,2048)@(2048,260k)", lambda: jax.device_get(head_only(params, h)[0, :4]))

    state = {"k": k, "v": v}
    def one_decode():
        tok, state["k"], state["v"] = decode_step(
            params, state["k"], state["v"], toks, off, key, scalars, bias_ids, bias_vals, window_ids, window_mask
        )
        jax.device_get(tok)
    bench("LM decode step (donated kv)", one_decode)

    # --- 3. codec at full size ---
    from realtime_codec_agent_tpu.models.codec import (
        CodecConfig, decode_frames, encode_frames, init_codec_params,
    )

    ccfg = CodecConfig()
    cparams = jax.device_put(init_codec_params(jax.random.PRNGKey(1), ccfg))
    jax.block_until_ready(cparams)
    enc_in = jnp.zeros((1, 32000), jnp.float32)  # 2 s context
    dec_in = jnp.zeros((1, 100), jnp.int32)
    enc_j = jax.jit(lambda p, a: encode_frames(p, a, ccfg))
    dec_j = jax.jit(lambda p, c: decode_frames(p, c, ccfg))
    bench("codec encode 2s ctx (100 fr)", lambda: jax.device_get(enc_j(cparams, enc_in)[0, :4]))
    bench("codec decode 2s ctx (100 fr)", lambda: jax.device_get(dec_j(cparams, dec_in)[0, :4]))
    enc5 = jnp.zeros((1, 1600), jnp.float32)
    dec5 = jnp.zeros((1, 5), jnp.int32)
    bench("codec encode 5 frames only", lambda: jax.device_get(enc_j(cparams, enc5)[0, :4]))
    bench("codec decode 5 frames only", lambda: jax.device_get(dec_j(cparams, dec5)[0, :4]))

    if args.skip_fused:
        return

    # --- 4. the real fused chunk via DuplexSession ---
    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.lm.duplex_session import DuplexSession
    from realtime_codec_agent_tpu.models.codec import JaxCodecModel

    eng = DuplexLMEngine(params, cfg)
    codec = JaxCodecModel(cparams, ccfg)
    session = DuplexSession(
        engine=eng,
        codec_model=codec,
        codec_vocab_start=128512,
        end_header_token_id=128300,
        end_audio_token_id=128258,
        agent_speaker_token_id=128290,
        user_speaker_token_id=128291,
        chunk_size_samples=1600,
        preroll_samples=320,
    )
    eng.settings = SamplerSettings(top_k=100, temp=1.0, min_token_id=128512)
    eng.commit_external_eval([128512, 128513] * 10)
    session.bind_sequence(list(eng._input_ids))
    chunk = np.zeros(1600, np.float32)

    def fused():
        session.bind_sequence(list(eng._input_ids[-4:]))
        res, n_final = session.process_chunk(chunk)
        eng._n_tokens = 20  # keep offset fixed for timing
    bench("fused_chunk end-to-end", fused, n=30)


if __name__ == "__main__":
    main()
