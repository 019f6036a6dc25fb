"""In-process A/B: cache-view bucket granularity on the fused fast path.

At high occupancy (~70 s of context) the default gran=4096 rounds the
attention read up to the next 4k bucket; gran=2048 halves the rounding
waste. ``RTCA_VIEW_GRAN`` is read per dispatch, so both arms run on the
SAME live agent in one process (ABAB segments — the only window-valid
comparison on the tunnel, CLAUDE.md band).

Usage: python scripts/ab_view_gran.py --fill_chunks 700 --segments 6 --ticks 50
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fill_chunks", type=int, default=700,
                    help="chunks of context to accumulate before measuring")
    ap.add_argument("--segments", type=int, default=6)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--grans", default="4096,2048")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--int8", action="store_true", default=True)
    ap.add_argument("--bf16", dest="int8", action="store_false")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    grans = [int(g) for g in args.grans.split(",")]

    from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from realtime_codec_agent_tpu import RealtimeAgentConfig, RealtimeAgentResources
    from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
    from realtime_codec_agent_tpu.models.codec import (
        CodecConfig, JaxCodecModel, tiny_codec_config,
    )

    ccfg = tiny_codec_config() if args.tiny else CodecConfig()
    codec = JaxCodecModel.random_init(ccfg, seed=0)
    res = RealtimeAgentResources(
        tiny=args.tiny, codec_model=codec, whisper_model=None,
        quantize_int8=args.int8,
    )
    cfg = RealtimeAgentConfig(
        seed=args.seed, use_whisper=False, agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
        pipeline_chunks=True,
    )
    a = RealtimeAgent(resources=res, config=cfg)
    orig = a.set_sampler

    def pinned(for_trans=False, suppress_end_audio=False):
        orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
        res.llm.settings.min_token_id = res.tokenizer.codec_vocab_start

    a.set_sampler = pinned
    a.set_sampler()

    chunk_n = a.chunk_size_samples
    total = args.fill_chunks + args.segments * args.ticks + 40
    rng = np.random.default_rng(args.seed + 100)
    stream = (0.1 * rng.normal(size=total * chunk_n)).astype(np.float32)

    t = 0

    def tick():
        nonlocal t
        a.process_audio(stream[t * chunk_n : (t + 1) * chunk_n])
        t += 1

    print(f"filling {args.fill_chunks} chunks of context...", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(args.fill_chunks):
        tick()
    a.drain_pipeline()
    print(f"fill done in {time.perf_counter() - t0:.1f}s "
          f"n_tokens={res.llm.n_tokens} seq={len(a.input_ids)}", file=sys.stderr)

    # warm both arms' program variants
    for g in grans:
        os.environ["RTCA_VIEW_GRAN"] = str(g)
        for _ in range(15):
            tick()
        a.drain_pipeline()

    results = {g: [] for g in grans}
    for seg in range(args.segments):
        g = grans[seg % len(grans)]
        os.environ["RTCA_VIEW_GRAN"] = str(g)
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            tick()
        a.drain_pipeline()
        dt = (time.perf_counter() - t0) / args.ticks
        results[g].append(dt)
        print(f"seg {seg} gran={g:5d} {dt * 1000:7.2f} ms/chunk "
              f"(n_tokens={res.llm.n_tokens})", file=sys.stderr)

    for g in grans:
        vals = results[g]
        if vals:
            print(f"gran {g}: median {np.median(vals) * 1000:.2f} ms/chunk "
                  f"all={['%.1f' % (v * 1000) for v in vals]}")


if __name__ == "__main__":
    main()
