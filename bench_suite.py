"""Benchmark suite over the BASELINE.md configs (one JSON line per metric).

1. codec_roundtrip_rtf     — mono streaming encode->decode, 10 s WAV, 100 ms
                             chunks through AudioTokenizer (BASELINE config 1)
2. batch_encode_xrt        — offline corpus encoding throughput, sliding
                             2 s windows, batch 256 (config 2; replaces the
                             reference's 4-GPU shell sharding with one job)
3. ar_decode_tok_s         — interleaved AR decode rate through the fused
                             duplex chunk program (config 3)
4. self_play_rtf           — two full agents cross-feeding on one chip
                             (config 5)
5. decode_eff_gbps         — effective HBM bandwidth of the jitted AR decode
                             step (weights + KV traffic / measured time,
                             throughput mode: 32 sequential steps per program)
6. train_step_tok_s /      — one-chip SPMD training throughput at full scale
   train_mfu                 (remat on, dual-route codec embeddings) and the
                             model-FLOPs utilization it implies
                             (reference trains via train_vanilla_latest.py)

``python bench.py`` remains the headline full-duplex metric (config 4).
"""
import argparse
import json
import sys
import time

import numpy as np


def release_device_memory():
    """Drop dead device buffers between sections: each section allocates
    multi-GB params/caches and the next one needs the HBM back. gc alone is
    not enough — jitted programs capture params as constants and the global
    executable cache keeps those buffers alive until the cache is cleared."""
    import gc

    import jax

    gc.collect()
    jax.clear_caches()
    gc.collect()


# Section groups that each allocate multi-GB of HBM. Run in one process they
# starve each other even with release_device_memory() (measured: the train
# section OOMed at every seq_len after the inference sections ran first), so
# the full suite runs each group in its own subprocess with a fresh device.
SECTIONS = [
    "codec", "encode", "ar", "selfplay", "tts", "duplexserve", "snapshot",
    "batched", "bandwidth", "train", "whisper",
]
GROUPS = [
    ["codec", "encode"],
    ["batched"],
    ["bandwidth"],
    ["train"],
    ["whisper"],
    ["ar", "selfplay", "tts"],
    ["duplexserve"],
    ["snapshot"],
]


def run_groups(args, extra_argv):
    """Re-invoke this script once per section group (subprocess isolation)."""
    import subprocess

    rc = 0
    for group in GROUPS:
        wanted = [s for s in group if s not in args.skip]
        if not wanted:
            continue
        skip = [s for s in SECTIONS if s not in wanted]
        cmd = [sys.executable, __file__, "--inproc", "--skip", *skip, *extra_argv]
        print(f"# --- suite group: {'+'.join(wanted)} ---", file=sys.stderr)
        r = subprocess.run(cmd)
        if r.returncode != 0:
            print(f"# group {'+'.join(wanted)} failed (rc={r.returncode})", file=sys.stderr)
            rc = 1
    return rc


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 4), "unit": unit, **extra}))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument(
        "--inproc", action="store_true",
        help="run all requested sections in this process (no subprocess isolation)",
    )
    parser.add_argument(
        "--skip", nargs="+", default=[],
        choices=list(SECTIONS),
    )
    parser.add_argument("--serving_batch", type=int, default=8)
    parser.add_argument(
        "--serving_prefill", type=int, default=190,
        help="per-row prompt length (row r gets serving_prefill + r tokens): "
             "sets the occupancy regime the batched step is measured in",
    )
    parser.add_argument("--serving_context", type=int, default=2048)
    parser.add_argument(
        "--serving_int8", action="store_true",
        help="int8 decode weights for the batched section (q8_0-parity artifact)",
    )
    parser.add_argument(
        "--serving_int4", action="store_true",
        help="int4 decode weights for the batched section (Q4_K_M-parity "
             "affine groups, ops/int4_matmul.py)",
    )
    parser.add_argument(
        "--bandwidth_quant", choices=["none", "int8", "int4"], default="none",
        help="weight format for the bandwidth section's AR decode loop "
             "(A/B the per-step weight-read bytes across formats)",
    )
    parser.add_argument("--train_seq_len", type=int, default=2048)
    parser.add_argument("--train_steps", type=int, default=5)
    parser.add_argument("--train_batch", type=int, default=1)
    parser.add_argument("--train_loss_block", type=int, default=512)
    parser.add_argument(
        "--train_remat_policy",
        choices=["full", "dots", "attn", "flash", "none"], default="full",
    )
    parser.add_argument(
        "--train_optimizer", choices=["adamw", "adafactor"], default="adamw"
    )
    parser.add_argument(
        "--peak_tflops", type=float, default=None,
        help="peak bf16 TFLOP/s for MFU (default: inferred from device kind)",
    )
    parser.add_argument(
        "--duplex_sessions", type=int, default=4,
        help="concurrent full-duplex calls in the duplexserve section",
    )
    parser.add_argument(
        "--selfplay_pair", action="store_true",
        help="A/B: ride self-play on the shared batch-2 pair program with "
             "the INTERLEAVED drive. OFF by default: the batch-2 program's "
             "compute (~69 ms/tick) exceeds two unpaired pipelined programs "
             "(~43 ms/tick, healthy-window in-process ABA); see "
             "--selfplay_coord for the split-drive variant.",
    )
    parser.add_argument(
        "--agent_int8", action="store_true",
        help="int8 decode weights for the ar/selfplay/tts agent sections "
             "(the deployment-parity config the headline bench defaults to)",
    )
    parser.add_argument(
        "--selfplay_coord", action="store_true",
        help="ride self-play on the batch-2 pair program with the SPLIT "
             "dispatch/resolve drive. Loses to unpaired in healthy windows "
             "(69 vs 43 ms/tick) but wins degraded ones (~45 vs 80-85: "
             "GroupFetch halves inflated fetch fees) — degradation insurance",
    )
    parser.add_argument(
        "--no_duplex_group", action="store_true",
        help="A/B: serve the duplexserve section with per-session programs "
             "instead of the shared batch-R program + combined fetch",
    )
    parser.add_argument(
        "--duplex_int8", action="store_true",
        help="int8 decode weights for the duplexserve section (the capacity "
             "lever: R=6 at 67-68 ms/tick with the split drive)",
    )
    parser.add_argument(
        "--duplex_int4", action="store_true",
        help="int4 decode weights for the duplexserve section",
    )
    parser.add_argument(
        "--no_duplex_split", action="store_true",
        help="A/B: interleave each row's dispatch+resolve in the "
             "duplexserve section (the pre-split drive)",
    )
    parser.add_argument(
        "--duplex_ab", action="store_true",
        help="measure the duplexserve drive A/B (split, interleaved, split) "
             "back-to-back IN ONE PROCESS — the only window-valid comparison",
    )
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    if not args.inproc and not args.tiny:
        extra = [
            "--serving_batch", str(args.serving_batch),
            "--serving_prefill", str(args.serving_prefill),
            "--serving_context", str(args.serving_context),
            *(["--serving_int8"] if args.serving_int8 else []),
            *(["--serving_int4"] if args.serving_int4 else []),
            "--bandwidth_quant", args.bandwidth_quant,
            "--train_seq_len", str(args.train_seq_len),
            "--train_steps", str(args.train_steps),
            "--train_batch", str(args.train_batch),
            "--train_loss_block", str(args.train_loss_block),
            "--train_remat_policy", args.train_remat_policy,
            "--train_optimizer", args.train_optimizer,
            *(["--selfplay_pair"] if args.selfplay_pair else []),
            *(["--selfplay_coord"] if args.selfplay_coord else []),
            *(["--agent_int8"] if args.agent_int8 else []),
            *(["--no_duplex_group"] if args.no_duplex_group else []),
            *(["--duplex_int8"] if args.duplex_int8 else []),
            *(["--duplex_int4"] if args.duplex_int4 else []),
            *(["--no_duplex_split"] if args.no_duplex_split else []),
            *(["--duplex_ab"] if args.duplex_ab else []),
            "--duplex_sessions", str(args.duplex_sessions),
            "--seed", str(args.seed),
        ]
        if args.peak_tflops is not None:
            extra += ["--peak_tflops", str(args.peak_tflops)]
        sys.exit(run_groups(args, extra))

    from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
    from realtime_codec_agent_tpu.models.codec import (
        CodecConfig, JaxCodecModel, tiny_codec_config,
    )

    rng = np.random.default_rng(args.seed)
    ccfg = tiny_codec_config() if args.tiny else CodecConfig()
    codec = JaxCodecModel.random_init(ccfg, seed=0)
    sr = codec.sample_rate

    # ---- 1. codec streaming round trip -------------------------------------
    if "codec" not in args.skip:
        at = AudioTokenizer(codec_model=codec)
        audio = (0.2 * np.sin(2 * np.pi * 220 * np.arange(10 * sr) / sr)).astype(np.float32)
        chunk = int(0.1 * sr)
        # warmup
        for i in range(5):
            s = at.tokenize_audio(audio[i * chunk : (i + 1) * chunk])
            at.detokenize_audio(s)
        t0 = time.perf_counter()
        n = len(audio) // chunk
        for i in range(n):
            s = at.tokenize_audio(audio[i * chunk : (i + 1) * chunk])
            (_, out), _, _ = at.detokenize_audio(s)
        dt = time.perf_counter() - t0
        emit("codec_roundtrip_rtf", dt / (n * 0.1), "x_realtime (lower is better)")
        del at
        release_device_memory()

    # ---- 2. batched corpus encode throughput --------------------------------
    if "encode" not in args.skip:
        from realtime_codec_agent_tpu.data.encode_corpus import CorpusEncoder

        enc = CorpusEncoder(codec, chunk_secs=0.1, context_secs=2.0, batch_size=256)
        secs = 120
        audio = (0.1 * rng.normal(size=secs * sr)).astype(np.float32)
        enc.encode_channel(audio[: 10 * sr])  # warmup/compile
        t0 = time.perf_counter()
        codes = enc.encode_channel(audio)
        dt = time.perf_counter() - t0
        emit(
            "batch_encode_xrt", secs / dt, "x_realtime audio-seconds/second (higher is better)",
            frames=int(codes.shape[-1]),
        )
        del enc
        release_device_memory()

    # ---- 2b. batched serving throughput --------------------------------------
    if "batched" not in args.skip:
        import jax as _jax

        from realtime_codec_agent_tpu.lm.batched_engine import BatchedDecodeEngine
        from realtime_codec_agent_tpu.models.llama import (
            init_lm_params, llama32_1b_config, tiny_lm_config,
        )
        from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer

        tok = CodecTextTokenizer(codebook_size=ccfg.codebook_size)
        vocab = ((max(tok.vocab_size, 128512 + ccfg.codebook_size) + 7) // 8) * 8
        make_cfg = tiny_lm_config if args.tiny else llama32_1b_config
        lcfg = make_cfg(vocab_size=vocab)
        lparams = init_lm_params(_jax.random.PRNGKey(0), lcfg)
        if args.serving_int8:
            from realtime_codec_agent_tpu.models.llama import quantize_params_int8

            lparams = quantize_params_int8(lparams)
        elif args.serving_int4:
            from realtime_codec_agent_tpu.models.llama import quantize_params_int4

            lparams = _jax.jit(quantize_params_int4)(lparams)
        beng = BatchedDecodeEngine(
            lparams, lcfg, batch_size=args.serving_batch,
            max_context=args.serving_context,
        )
        for row in range(args.serving_batch):
            beng.set_row_sampler(row, temp=1.0)
            beng.prefill_row(row, list(range(10, 10 + args.serving_prefill + row)))
        active = [True] * args.serving_batch
        spd = 8  # BatchedCompletionBackend's steps_per_dispatch default
        # compile every occupancy-bucket variant up front (the backend does
        # the same): decoding across a bucket boundary mid-measurement would
        # put a multi-second cold compile inside the timed loop
        beng.prewarm(steps_list=(spd,), top_k=100)
        for _ in range(2):
            beng.step(active, top_k=100, steps=spd)
        n_disp = 12
        # the serving loop's pattern: S tokens per program, dispatch-first so
        # the fetch of dispatch k overlaps the compute of dispatch k+1
        t0 = time.perf_counter()
        pending = beng.step_async(active, top_k=100, steps=spd)
        for _ in range(n_disp - 1):
            nxt = beng.step_async(active, top_k=100, steps=spd)
            beng.resolve(pending)
            pending = nxt
        beng.resolve(pending)
        dt = time.perf_counter() - t0
        emit(
            "batched_serving_tok_s",
            n_disp * spd * args.serving_batch / dt,
            f"aggregate tokens/second, {args.serving_batch} concurrent streams, "
            f"{spd} tokens/dispatch, ~{args.serving_prefill}-token occupancy "
            f"in a {args.serving_context} cache"
            f"{', int8 weights' if args.serving_int8 else ''}"
            f"{', int4 weights' if args.serving_int4 else ''} (higher is better)",
        )
        del beng, lparams
        release_device_memory()

    # ---- 5. decode effective bandwidth ---------------------------------------
    if "bandwidth" not in args.skip:
        import jax as _jax
        import jax.numpy as jnp

        from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
        from realtime_codec_agent_tpu.models.llama import (
            fuse_lm_params_for_decode, init_lm_params, llama32_1b_config,
            tiny_lm_config,
        )
        from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer

        tok = CodecTextTokenizer(codebook_size=ccfg.codebook_size)
        vocab = ((max(tok.vocab_size, 128512 + ccfg.codebook_size) + 7) // 8) * 8
        make_cfg = tiny_lm_config if args.tiny else llama32_1b_config
        lcfg = make_cfg(vocab_size=vocab)
        lparams = init_lm_params(_jax.random.PRNGKey(0), lcfg)
        if args.bandwidth_quant == "int8":
            from realtime_codec_agent_tpu.models.llama import quantize_params_int8

            lparams = _jax.jit(quantize_params_int8)(lparams)
        elif args.bandwidth_quant == "int4":
            from realtime_codec_agent_tpu.models.llama import quantize_params_int4

            lparams = _jax.jit(quantize_params_int4)(lparams)
        lparams = _jax.jit(fuse_lm_params_for_decode)(lparams)
        eng = DuplexLMEngine(lparams, lcfg)
        eng.init_sampler_for_generate(temp=1.0, seed=0)
        ctx = min(4000, lcfg.max_context - 200)
        eng.eval([10 + (i % 1000) for i in range(ctx)])
        # weight bytes actually read per decode step (every matmul weight)
        def leaf_bytes(x):
            if isinstance(x, dict) and "q" in x:
                return x["q"].size + 4 * x["s"].size
            if isinstance(x, dict) and "q4" in x:
                return x["q4"].size + 4 * (x["d"].size + x["m"].size)
            return x.size * x.dtype.itemsize
        layer_bytes = sum(
            leaf_bytes(w) for blk in lparams["layers"] for w in blk.values()
        )
        head_bytes = leaf_bytes(lparams.get("lm_head", lparams["embed_tokens"]))
        kv_bytes_per_tok = (
            2 * lcfg.num_layers * lcfg.num_kv_heads * lcfg.head_dim
            * jnp.dtype(lcfg.compute_dtype).itemsize
        )
        steps_per_call = 32
        # warm EVERY cache-view bucket variant of the gen program: the timed
        # calls advance n_tokens and can cross a view boundary mid-loop — a
        # cold XLA compile inside the measurement once read as 292 ms/step
        eng.prewarm_detours(
            gen_buckets=(steps_per_call,), frames_bucket=None,
            include_probe=False, include_decode=False,
        )
        eng.generate_until(11, stop_id=0, max_n=steps_per_call)  # warmup
        n_calls = 4
        t0 = time.perf_counter()
        for _ in range(n_calls):
            eng.generate_until(11, stop_id=0, max_n=steps_per_call)
        dt = time.perf_counter() - t0
        n_steps = n_calls * steps_per_call
        step_ms = dt / n_steps * 1000
        bytes_per_step = layer_bytes + head_bytes + eng.n_tokens * kv_bytes_per_tok
        emit(
            "decode_step_ms", step_ms, "ms per AR decode step (throughput mode)",
            context_tokens=int(eng.n_tokens), quant=args.bandwidth_quant,
        )
        emit(
            "decode_eff_gbps", bytes_per_step / (dt / n_steps) / 1e9,
            "effective GB/s (weights + KV read per step / step time)",
            quant=args.bandwidth_quant,
        )
        del eng, lparams
        release_device_memory()

    # ---- 6. training throughput + MFU ----------------------------------------
    if "train" not in args.skip:
        import jax as _jax

        from realtime_codec_agent_tpu.models.llama import (
            init_lm_params, llama32_1b_config, tiny_lm_config,
        )
        from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer
        from realtime_codec_agent_tpu.train.trainer import (
            TrainConfig, Trainer, pad_batch,
        )

        tok = CodecTextTokenizer(codebook_size=ccfg.codebook_size)
        vocab = ((max(tok.vocab_size, 128512 + ccfg.codebook_size) + 7) // 8) * 8
        make_cfg = tiny_lm_config if args.tiny else llama32_1b_config
        # deployment-realistic codec boundary: full Llama-3 text vocab +
        # specials below it, the 131k codec region above
        cvs = vocab - ccfg.codebook_size
        lcfg = make_cfg(
            vocab_size=vocab,
            codec_vocab_start=cvs,
            codebook_size=ccfg.codebook_size,
        )
        from realtime_codec_agent_tpu.models.llama import stack_layer_params

        def fresh_params():
            # the train step DONATES params, so every (re)try needs its own
            # init — a failed attempt has already consumed the previous tree
            p = init_lm_params(
                _jax.random.PRNGKey(0), lcfg, with_codec_embed=True
            )
            # Dual-route training never gathers embed rows >=
            # codec_vocab_start (codec ids take the frozen-table+projector
            # path), so the codec region of the input embedding is dead
            # weight: trimming it saves ~1 GB of params and ~2 GB of AdamW
            # state on one chip. The reference keeps those rows
            # allocated-but-unused (codec_llama.py:107-112 +
            # resize_token_embeddings); persist re-materializes them at
            # deployment time.
            p["embed_tokens"] = p["embed_tokens"][:cvs]
            n = sum(
                x.size for blk in p["layers"] for x in _jax.tree_util.tree_leaves(blk)
            ) + p.get("lm_head", p["embed_tokens"]).size
            # stack to the trainer's scan-over-layers layout HERE so the
            # unrolled originals are released before the optimizer state
            # allocates (holding both layouts costs an extra ~2 GB)
            return stack_layer_params(p), n

        seq_len = args.train_seq_len if not args.tiny else 256
        done = False
        while not done and seq_len >= 128:
            try:
                release_device_memory()
                params, n_matmul = fresh_params()
                trainer = Trainer(
                    params, lcfg,
                    TrainConfig(
                        max_seq_len=seq_len, max_steps=10**9,
                        # "none" = no rematerialization: +O(layers) activation
                        # memory, 1/3 fewer hardware forward FLOPs — fits only
                        # at small B*T, measured in docs/PERFORMANCE.md
                        remat=args.train_remat_policy != "none",
                        remat_policy=args.train_remat_policy
                        if args.train_remat_policy != "none" else "full",
                        loss_block_size=args.train_loss_block or None,
                        optimizer=args.train_optimizer,
                    ),
                )
                rng2 = np.random.default_rng(0)
                seqs = [
                    list(rng2.integers(0, vocab, size=seq_len))
                    for _ in range(args.train_batch)
                ]
                batch, labels = pad_batch(seqs, seq_len, pad_id=0)
                trainer.train_batch(batch, labels)  # compile + warmup
                # dispatch-first (steps chain on device), one metrics fetch
                # at the end — per-step fetches pay the tunnel's completion
                # fee and serialize ~5x slower than the device step
                t0 = time.perf_counter()
                for _ in range(args.train_steps):
                    m_dev = trainer.train_batch_async(batch, labels)
                m = {k: float(v) for k, v in m_dev.items()}
                dt = time.perf_counter() - t0
                done = True
            except Exception as ex:  # OOM at full seq len: halve and retry
                msg = f"{type(ex).__name__}: {ex}"
                if "RESOURCE_EXHAUSTED" not in msg and "emory" not in msg:
                    raise
                print(
                    f"# train seq_len {seq_len} OOM; retrying at {seq_len//2}",
                    file=sys.stderr,
                )
                trainer = None
                params = None
                release_device_memory()
                if not args.tiny:
                    # the backend does not reliably return a failed attempt's
                    # HBM to this process (a 2048 retry OOMed right after a
                    # 4096 failure even though 2048 fits a fresh process) —
                    # retry in a clean subprocess instead
                    import subprocess

                    cmd = [
                        sys.executable, __file__, "--inproc",
                        "--skip", *[s for s in SECTIONS if s != "train"],
                        "--train_seq_len", str(seq_len // 2),
                        "--train_steps", str(args.train_steps),
                        "--train_batch", str(args.train_batch),
                        "--train_loss_block", str(args.train_loss_block),
                        "--train_remat_policy", args.train_remat_policy,
                        "--train_optimizer", args.train_optimizer,
                        "--seed", str(args.seed),
                    ]
                    if args.peak_tflops is not None:
                        cmd += ["--peak_tflops", str(args.peak_tflops)]
                    subprocess.run(cmd)
                    done = "subprocess"  # the child emitted the metrics
                    break
                seq_len //= 2
        if not done:
            print("# train section skipped: OOM at every seq_len", file=sys.stderr)
        elif done == "subprocess":
            pass  # metrics already emitted by the clean-process retry
        else:
            tok_s = args.train_steps * batch.shape[0] * seq_len / dt
            emit(
                "train_step_tok_s", tok_s,
                f"training tokens/second (B={batch.shape[0]}, T={seq_len}, "
                f"remat={args.train_remat_policy}, dual-route codec embed, "
                f"{args.train_optimizer})",
                loss=round(m["loss"], 3),
            )
            peak = args.peak_tflops
            if peak is None:
                kind = _jax.devices()[0].device_kind.lower()
                if "v5 lite" in kind or "v5e" in kind:
                    peak = 197.0
                elif "v4" in kind:
                    peak = 275.0
                elif "v5p" in kind or "v5" in kind:
                    peak = 459.0
            if peak:
                # standard model-FLOPs convention: 6 * N_matmul * tokens
                # (remat recompute is extra hardware work, not model FLOPs)
                mfu = 6.0 * n_matmul * tok_s / (peak * 1e12)
                emit(
                    "train_mfu", mfu,
                    f"model FLOPs utilization vs {peak:.0f} bf16 TFLOP/s "
                    f"(6*N*tok/s, N={n_matmul/1e9:.2f}B matmul params)",
                )
            trainer = None
        params = None
        release_device_memory()

    # ---- 7. on-TPU Whisper transcription latency -----------------------------
    if "whisper" not in args.skip:
        import jax as _jax

        from realtime_codec_agent_tpu.models.whisper import (
            JaxWhisperModel, WhisperConfig, init_whisper_params, tiny_whisper_config,
        )

        wcfg = tiny_whisper_config() if args.tiny else WhisperConfig()
        wparams = init_whisper_params(_jax.random.PRNGKey(0), wcfg)
        # the agent transcribes 1-10 s utterance tails
        # (realtime_agent_v2.py:415-430 pads to >= 1.2 s); measure the fixed
        # 30 s canonical window vs bucketed short windows
        utt = (0.1 * rng.normal(size=int(2.0 * wcfg.sample_rate))).astype(np.float32)
        buckets = [5.0, 10.0] if not args.tiny else []
        # the decoder start sequence occupies a few target positions; keep
        # max_new inside max_target_positions (the tiny config has only 24)
        max_new = min(32, wcfg.max_target_positions - 8)
        # REAL-path cost envelope (VERDICT r4 item 5): the gate's scripted
        # events bound Whisper at max_new_tokens=16 on 5/10 s windows (a
        # floor). The real path runs unconstrained greedy to EOT — with
        # random weights EOT never argmaxes, so the early-exit while_loop
        # runs to the cap, making max_new an exact proxy for generated
        # length. Realistic utterance lengths: ~4 tok/s of speech -> a 10 s
        # utterance decodes ~40 tokens, so n16/n64 bracket the real range;
        # the "full" label is the canonical 30 s window the gate never
        # exercises. Real mel from actual audio is computed in all cases
        # (transcribe_ids owns the on-TPU log-mel front end).
        n_greedy = [max_new] if args.tiny else [16, 64]
        for label, windows in [("full", None)] + [(f"{int(w)}s", [w]) for w in buckets]:
            for mn in n_greedy:
                mn = min(mn, wcfg.max_target_positions - 8)
                model = JaxWhisperModel(
                    wparams, wcfg, max_new_tokens=mn, window_secs=windows
                )
                model.transcribe_ids(utt)  # compile + warmup
                n = 5
                t0 = time.perf_counter()
                for _ in range(n):
                    model.transcribe_ids(utt)
                dt = (time.perf_counter() - t0) / n
                emit(
                    f"whisper_transcribe_ms_{label}_n{mn}", dt * 1000,
                    f"ms per 2s-utterance transcription (greedy to cap {mn}, "
                    "small.en geometry"
                    + (")" if windows else ") — canonical 30s window"),
                )
        del wparams
        release_device_memory()

    # ---- 3/4. full-agent metrics (shared resources) --------------------------
    need_agent = any(s not in args.skip for s in ("ar", "selfplay", "tts"))
    if need_agent:
        from realtime_codec_agent_tpu import RealtimeAgentConfig, RealtimeAgentResources
        from realtime_codec_agent_tpu.agent.agent import RealtimeAgent

        resources = RealtimeAgentResources(
            tiny=args.tiny, codec_model=codec, whisper_model=None,
            quantize_int8=args.agent_int8,
        )
        config = RealtimeAgentConfig(
            seed=args.seed, use_whisper=False, agent_opening_text=None,
            force_trans_after_inactivity_secs=0.0,
            force_response_after_inactivity_secs=0.0,
            pipeline_chunks=True,
        )
        agent = RealtimeAgent(resources=resources, config=config)
        orig = agent.set_sampler

        def pinned(for_trans=False, suppress_end_audio=False):
            orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
            resources.llm.settings.min_token_id = resources.tokenizer.codec_vocab_start

        agent.set_sampler = pinned
        agent.set_sampler()
        chunk_n = agent.chunk_size_samples

    # ---- 3. AR decode rate through the fused duplex chunk -------------------
    if "ar" not in args.skip:
        audio = (0.1 * rng.normal(size=30 * chunk_n)).astype(np.float32)
        n_chunks = len(audio) // chunk_n
        for i in range(10):
            agent.process_audio(audio[i * chunk_n : (i + 1) * chunk_n])
        t0 = time.perf_counter()
        toks = 0
        for i in range(10, n_chunks):
            agent.process_audio(audio[i * chunk_n : (i + 1) * chunk_n])
            toks += 2 * agent.chunk_size_frames_per_channel  # agent+user per frame
        dt = time.perf_counter() - t0
        emit("ar_decode_tok_s", toks / dt, "interleaved tokens/second (higher is better)")

    # ---- 4. self-play: two agents on one chip --------------------------------
    if "selfplay" not in args.skip:
        agent_b = RealtimeAgent(
            resources=resources.clone_for_self_play(),
            config=RealtimeAgentConfig(
                seed=args.seed + 1, use_whisper=False, agent_opening_text=None,
                force_trans_after_inactivity_secs=0.0,
                force_response_after_inactivity_secs=0.0,
                pipeline_chunks=True,
            ),
            self_play_mode=True,
        )
        agent.drain_pipeline()  # flush the in-flight chunk before switching modes
        agent.self_play_mode = True
        pair = None
        if args.selfplay_pair or args.selfplay_coord:
            from realtime_codec_agent_tpu.lm.pair_session import pair_self_play_agents

            pair = pair_self_play_agents(agent, agent_b)
            pair.prewarm()
        zero = np.zeros(chunk_n, np.float32)
        out_a, ids_a = zero, None
        out_b, ids_b = zero, None
        if args.selfplay_coord:
            # group-pipelined drive (VERDICT r4 item 4): both rows dispatch —
            # the batch-2 program launches and queues behind the in-flight
            # one — BEFORE either row's fetch, so the fetch RTT hides under
            # device compute instead of serializing the next launch (the
            # 87 ms/tick interleaved-paired failure mode). Token streams are
            # bit-identical to the plain drive (tests/test_pair_session.py).
            def tick():
                nonlocal out_a, ids_a, out_b, ids_b
                agent.process_audio_dispatch(out_b, ids_b)
                agent_b.process_audio_dispatch(out_a, ids_a)
                out_a, ids_a = agent.process_audio_resolve()
                out_b, ids_b = agent_b.process_audio_resolve()
        else:
            def tick():
                nonlocal out_a, ids_a, out_b, ids_b
                out_a_, ids_a_ = agent.process_audio(out_b, ids_b)
                out_b, ids_b = agent_b.process_audio(out_a, ids_a)
                out_a, ids_a = out_a_, ids_a_
        for _ in range(5):  # warmup
            tick()
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            tick()
        dt = time.perf_counter() - t0
        emit("self_play_rtf", dt / (n * 0.1), "x_realtime, both agents (lower is better)",
             coord=bool(args.selfplay_coord), paired=bool(args.selfplay_pair))
        if pair is not None:
            total = pair.paired_dispatches * 2 + pair.single_dispatches
            emit(
                "self_play_pair_frac",
                (2 * pair.paired_dispatches) / max(1, total),
                "fraction of chunks riding the shared batch-2 program",
            )

    # ---- 4b. external-TTS substitution path ----------------------------------
    # Timed datapoint for BASELINE.md config 4 (VERDICT r2 missing item 4):
    # every chunk runs the STEPWISE duplex path (TTS disables the fused
    # program), the aligner's interrupt score, and — when not interrupted —
    # set_audio_tokens' in-place agent-channel substitution + KV re-eval
    # (reference realtime_agent_v2.py:374-397). The TTS stream is a stub
    # producing codec-char chunks host-side (the real client reads an HTTP
    # stream; its cost lives on the TTS server, not this chip).
    if "tts" not in args.skip:
        from realtime_codec_agent_tpu.agent.external_tts_duplex_aligner import (
            ExternalTTSDuplexAligner,
        )

        tts_agent = RealtimeAgent(
            resources=resources.clone_for_self_play(),
            config=RealtimeAgentConfig(
                seed=args.seed + 7, use_whisper=False, agent_opening_text=None,
                force_trans_after_inactivity_secs=0.0,
                force_response_after_inactivity_secs=0.0,
                pipeline_chunks=True,
            ),
        )
        orig_t = tts_agent.set_sampler

        def pinned_t(for_trans=False, suppress_end_audio=False):
            orig_t(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
            tts_agent.resources.llm.settings.min_token_id = (
                tts_agent.resources.tokenizer.codec_vocab_start
            )

        tts_agent.set_sampler = pinned_t
        tts_agent.set_sampler()

        tok_t = tts_agent.resources.tokenizer
        fpc = tts_agent.chunk_size_frames_per_channel
        rng_t = np.random.default_rng(args.seed + 8)

        class _StubTTSStream:
            """Serves pre-built codec-char chunks; absorbs the client calls
            reset() makes (close_stream / set_voice_enrollment)."""

            def __init__(self):
                self._i = 0
                hi = min(512, tok_t.codebook_size)
                self._chunks = [
                    "".join(
                        chr(tok_t.unicode_offset + int(c))
                        for c in rng_t.integers(0, hi, size=fpc)
                    )
                    for _ in range(8)
                ]

            def next_chunk(self):
                self._i += 1
                return self._chunks[self._i % len(self._chunks)]

            def prep_stream(self, text):  # noqa: ARG002
                pass

            def close_stream(self):
                pass

            def set_voice_enrollment(self, *a, **k):  # noqa: ARG002
                pass

        tts_agent.config.use_external_tts = True
        tts_agent.tts_client = _StubTTSStream()
        tts_agent.tts_duplex_aligner = ExternalTTSDuplexAligner(
            tts_agent.resources.audio_tokenizer, tok_t.codec_vocab_start
        )
        tts_agent.reset()

        chunk_n = tts_agent.chunk_size_samples
        audio_t = (0.1 * rng_t.normal(size=50 * chunk_n)).astype(np.float32)
        for i in range(10):  # warmup (stepwise programs + substitution re-eval)
            tts_agent.process_audio(audio_t[i * chunk_n : (i + 1) * chunk_n])
        lats = []
        n_sub = 0
        t0 = time.perf_counter()
        for i in range(10, 50):
            t1 = time.perf_counter()
            tts_agent.process_audio(audio_t[i * chunk_n : (i + 1) * chunk_n])
            lats.append(time.perf_counter() - t1)
            n_sub += tts_agent.tts_interrupted_chunk_input_ids is None
        while tts_agent.drain_pipeline() is not None:
            pass
        dt = time.perf_counter() - t0
        lats_ms = np.array(lats) * 1000
        emit(
            "tts_substitution_rtf", dt / (len(lats) * 0.1),
            "x_realtime with per-chunk TTS substitution + KV re-eval (lower is better)",
            call_p50_ms=round(float(np.percentile(lats_ms, 50)), 1),
            call_p99_ms=round(float(np.percentile(lats_ms, 99)), 1),
            substituted_frac=round(n_sub / len(lats), 3),
        )
        release_device_memory()

    # ---- 5. duplex serving: R concurrent full-duplex calls on one chip ------
    # Each call is a complete RealtimeAgent (own KV cache, stream state,
    # events, trims) over shared weights; the group coordinator rides all R
    # pipelined fused chunks through ONE batch-R program per 100 ms tick
    # (lm/pair_session.py). No reference counterpart: the reference serves one
    # call per llama.cpp GPU process.
    if "duplexserve" not in args.skip:
        from realtime_codec_agent_tpu import RealtimeAgentConfig, RealtimeAgentResources
        from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
        from realtime_codec_agent_tpu.lm.pair_session import group_duplex_agents

        R = args.duplex_sessions
        base_res = RealtimeAgentResources(
            tiny=args.tiny, codec_model=codec, whisper_model=None,
            quantize_int8=args.duplex_int8, quantize_int4=args.duplex_int4,
        )
        agents = []
        for i in range(R):
            res_i = base_res if i == 0 else base_res.clone_for_self_play()
            cfg_i = RealtimeAgentConfig(
                seed=args.seed + i, use_whisper=False, agent_opening_text=None,
                force_trans_after_inactivity_secs=0.0,
                force_response_after_inactivity_secs=0.0,
                # the serving config (duplex_server defaults): pump-thread
                # fetches keep the group launch off the fetch critical path
                # (measured 91 vs 103 ms/tick at R=4)
                pipeline_chunks=True, async_detours=True, incremental_trim=True,
            )
            a = RealtimeAgent(resources=res_i, config=cfg_i)
            orig_i = a.set_sampler

            def pinned_i(for_trans=False, suppress_end_audio=False,
                         _orig=orig_i, _res=res_i):
                _orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
                _res.llm.settings.min_token_id = _res.tokenizer.codec_vocab_start

            a.set_sampler = pinned_i
            a.set_sampler()
            agents.append(a)
        coord = None
        if not args.no_duplex_group:
            coord = group_duplex_agents(agents)
            coord.prewarm()
        chunk_n = agents[0].chunk_size_samples
        streams = [
            (0.1 * np.random.default_rng(args.seed + 100 + i).normal(
                size=80 * chunk_n)).astype(np.float32)
            for i in range(R)
        ]
        def serve_tick(t, split):
            if split:
                # the serving drive (duplex_server._Pool): all rows dispatch
                # (batch-R launch queues behind the in-flight one), then all
                # resolve — the fetch RTT hides under device compute
                for a, s in zip(agents, streams):
                    a.process_audio_dispatch(s[t * chunk_n : (t + 1) * chunk_n])
                for a in agents:
                    a.process_audio_resolve()
            else:
                for a, s in zip(agents, streams):
                    a.process_audio(s[t * chunk_n : (t + 1) * chunk_n])

        def measure(split):
            for a in agents:
                while a.drain_pipeline() is not None:
                    pass
                a.reset()
            # adaptive warm-in: the opening chunks detour (header tokens)
            # and the rows desynchronize until every backlog drains — a
            # fixed 10-tick warmup measured the catch-up, not the steady
            # state (instrumented run: warm-in lasted ~14 ticks with cold
            # compiles inside). Tick until the group runs clean for 4
            # consecutive ticks (or 30 ticks).
            grouped_before = coord.paired_dispatches if coord else 0
            clean, t = 0, 0
            while t < 30 and clean < 4:
                serve_tick(t, split)
                t += 1
                if coord is None:
                    clean = 4 if t >= 10 else 0
                    continue
                grouped_now = coord.paired_dispatches
                clean = clean + 1 if grouped_now > grouped_before else 0
                grouped_before = grouped_now
            n = 40
            t0 = time.perf_counter()
            for tt in range(t, t + n):
                serve_tick(tt, split)
            return (time.perf_counter() - t0) / (n * 0.1)

        # in-process drive A/B when requested: the tunnel's health drifts
        # 2-3x BETWEEN invocations on bad days, so split-vs-interleaved is
        # only meaningful measured back-to-back in one process/window
        modes = [not args.no_duplex_split]
        if args.duplex_ab:
            modes = [True, False, True]
        vals = {}
        for split in modes:
            c0 = (coord.paired_dispatches, coord.single_dispatches,
                  coord.timeout_flushes) if coord else (0, 0, 0)
            rtf = measure(split)
            c1 = (coord.paired_dispatches, coord.single_dispatches,
                  coord.timeout_flushes) if coord else (0, 0, 0)
            vals.setdefault(split, []).append(rtf)
            emit(
                "duplex_serving_rtf", rtf,
                f"x_realtime serving {R} concurrent full-duplex calls "
                "(lower is better; <1 = every call realtime)",
                sessions=R, int8=args.duplex_int8, int4=args.duplex_int4,
                split=split, grouped_ticks=c1[0] - c0[0],
                single_chunks=c1[1] - c0[1], lazy_timeouts=c1[2] - c0[2],
            )
        if args.duplex_ab and False in vals:
            emit(
                "duplex_split_speedup",
                vals[False][0] / min(vals[True]),
                "interleaved-drive rtf / best split-drive rtf (same window)",
                sessions=R,
            )
        if coord is not None:
            total = coord.paired_dispatches * R + coord.single_dispatches
            emit(
                "duplex_serving_group_frac",
                (R * coord.paired_dispatches) / max(1, total),
                f"fraction of chunks riding the shared batch-{R} program",
            )

    # ---- 10. live-call snapshot/restore (migration cost) ---------------------
    if "snapshot" not in args.skip:
        import pickle

        from realtime_codec_agent_tpu import RealtimeAgentConfig, RealtimeAgentResources
        from realtime_codec_agent_tpu.agent.agent import RealtimeAgent

        res = RealtimeAgentResources(
            tiny=args.tiny, codec_model=codec, whisper_model=None
        )
        cfg = RealtimeAgentConfig(
            seed=args.seed, use_whisper=False, agent_opening_text=None,
            force_trans_after_inactivity_secs=0.0,
            force_response_after_inactivity_secs=0.0,
            pipeline_chunks=True, async_detours=True, incremental_trim=True,
        )
        a = RealtimeAgent(resources=res, config=cfg)
        orig = a.set_sampler

        def pinned(for_trans=False, suppress_end_audio=False):
            orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
            res.llm.settings.min_token_id = res.tokenizer.codec_vocab_start

        a.set_sampler = pinned
        a.set_sampler()
        chunk_n = a.chunk_size_samples
        n_call = 100  # a 10 s call at capture time
        stream = (0.1 * np.random.default_rng(args.seed + 7).normal(
            size=(n_call + 2) * chunk_n)).astype(np.float32)
        for t in range(n_call):
            a.process_audio(stream[t * chunk_n : (t + 1) * chunk_n])
        a.quiesce()
        t0 = time.perf_counter()
        snap = a.snapshot()
        cap_ms = (time.perf_counter() - t0) * 1e3
        blob = pickle.dumps(snap)
        # restore = fresh agent + KV rebuild from tokens + first live chunk
        # (includes the new session's program loads from the persistent
        # cache — what a migration to a fresh process actually pays)
        t0 = time.perf_counter()
        b = RealtimeAgent.from_snapshot(res.clone_for_self_play(), snap)
        b.resources.llm.settings.min_token_id = res.tokenizer.codec_vocab_start
        b.process_audio(stream[n_call * chunk_n : (n_call + 1) * chunk_n])
        b.quiesce()
        rest_ms = (time.perf_counter() - t0) * 1e3
        emit("snapshot_capture_ms", cap_ms,
             "ms to quiesce+serialize a live 10 s call")
        emit("snapshot_restore_cold_ms", rest_ms,
             "ms to resume in a FRESH agent (program loads + KV rebuild + first chunk)")
        # the serving path restores into an already-warm pool slot
        # (duplex_server reuses the slot's prewarmed agent): only the
        # config/reset + KV rebuild from tokens + first chunk remain
        t0 = time.perf_counter()
        b.set_config(cfg)
        b.reset()
        b.restore_state(snap)
        b.resources.llm.settings.min_token_id = res.tokenizer.codec_vocab_start
        b.process_audio(stream[(n_call + 1) * chunk_n : (n_call + 2) * chunk_n])
        b.quiesce()
        warm_ms = (time.perf_counter() - t0) * 1e3
        emit("snapshot_restore_warm_ms", warm_ms,
             "ms to resume into a prewarmed serving slot (KV rebuild + first chunk)")
        emit("snapshot_bytes", len(blob),
             "pickled call state (KV cache not serialized)")


if __name__ == "__main__":
    main()
