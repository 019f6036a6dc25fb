"""In-process A/B for grouped (batch-R program) vs per-session dispatch.

The device tunnel's health drifts between runs (CLAUDE.md band), so the only
valid comparison interleaves the two arms over the SAME live agents in ONE
process: ABAB... segments, alternating the GroupCoordinator attachment.
Pairing is token-identical by construction, so flipping it mid-stream does
not perturb session state.

Modes:
  selfplay     two cross-fed agents (bench_suite section 4 shape)
  duplexserve  R independent full-duplex calls (bench_suite section 5 shape)

Usage: python scripts/ab_group_dispatch.py --mode duplexserve --sessions 4 \
           --segments 6 --ticks 30
Prints per-segment seconds/tick and the paired-segment summary.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def detach(coord):
    coord.flush()
    for s in coord.sessions:
        s._pair = None


def attach(coord):
    for s in coord.sessions:
        s._pair = coord


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["selfplay", "duplexserve"], default="duplexserve")
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--segments", type=int, default=6, help="total segments (alternating)")
    ap.add_argument("--ticks", type=int, default=30, help="100 ms ticks per segment")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--grouped_first", action="store_true")
    ap.add_argument("--async_detours", action="store_true",
                    help="serving-config agents (async_detours + incremental_trim): "
                    "fetches ride each agent's pump thread, so the group launch "
                    "is not serialized behind the previous fetch")
    ap.add_argument("--int8", action="store_true",
                    help="int8 decode weights (q8_0-parity): halves the per-tick "
                    "weight read, the capacity lever past R=4")
    args = ap.parse_args()

    from realtime_codec_agent_tpu import RealtimeAgentConfig, RealtimeAgentResources
    from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
    from realtime_codec_agent_tpu.lm.pair_session import group_duplex_agents
    from realtime_codec_agent_tpu.models.codec import (
        CodecConfig, JaxCodecModel, tiny_codec_config,
    )

    ccfg = tiny_codec_config() if args.tiny else CodecConfig()
    codec = JaxCodecModel.random_init(ccfg, seed=0)
    R = 2 if args.mode == "selfplay" else args.sessions
    base_res = RealtimeAgentResources(
        tiny=args.tiny, codec_model=codec, whisper_model=None,
        quantize_int8=args.int8,
    )
    agents = []
    for i in range(R):
        res_i = base_res if i == 0 else base_res.clone_for_self_play()
        cfg_i = RealtimeAgentConfig(
            seed=args.seed + i, use_whisper=False, agent_opening_text=None,
            force_trans_after_inactivity_secs=0.0,
            force_response_after_inactivity_secs=0.0,
            pipeline_chunks=True,
            async_detours=args.async_detours,
            incremental_trim=args.async_detours,
        )
        a = RealtimeAgent(
            resources=res_i, config=cfg_i, self_play_mode=(args.mode == "selfplay")
        )
        if args.mode == "duplexserve":
            orig_i = a.set_sampler

            def pinned_i(for_trans=False, suppress_end_audio=False,
                         _orig=orig_i, _res=res_i):
                _orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
                _res.llm.settings.min_token_id = _res.tokenizer.codec_vocab_start

            a.set_sampler = pinned_i
            a.set_sampler()
        agents.append(a)

    coord = group_duplex_agents(agents)
    coord.prewarm()
    chunk_n = agents[0].chunk_size_samples

    if args.mode == "selfplay":
        zero = np.zeros(chunk_n, np.float32)
        state = {"out_a": zero, "ids_a": None, "out_b": zero, "ids_b": None}

        def tick(_t):
            out_a_, ids_a_ = agents[0].process_audio(state["out_b"], state["ids_b"])
            state["out_b"], state["ids_b"] = agents[1].process_audio(
                state["out_a"], state["ids_a"])
            state["out_a"], state["ids_a"] = out_a_, ids_a_
    else:
        total_ticks = 20 + args.segments * args.ticks
        streams = [
            (0.1 * np.random.default_rng(args.seed + 100 + i).normal(
                size=total_ticks * chunk_n)).astype(np.float32)
            for i in range(R)
        ]

        def tick(t):
            for a, s in zip(agents, streams):
                a.process_audio(s[t * chunk_n : (t + 1) * chunk_n])

    # warmup both arms so each segment starts hot
    t_global = 0
    for _ in range(10):
        tick(t_global); t_global += 1
    detach(coord)
    for _ in range(10):
        tick(t_global); t_global += 1
    attach(coord)

    results = {"grouped": [], "single": []}
    arms = ["grouped", "single"] if args.grouped_first else ["single", "grouped"]
    for seg in range(args.segments):
        arm = arms[seg % 2]
        if arm == "grouped":
            attach(coord)
        else:
            detach(coord)
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            tick(t_global); t_global += 1
        # drain in-flight pipelined chunks so the segment pays its own tail
        if arm == "grouped":
            coord.flush()
        for a in agents:
            a.drain_pipeline()
        dt = time.perf_counter() - t0
        per_tick = dt / args.ticks
        results[arm].append(per_tick)
        print(f"seg {seg} {arm:8s} {per_tick * 1000:7.2f} ms/tick "
              f"(rtf {per_tick / 0.1:.3f}) paired={coord.paired_dispatches} "
              f"singles={coord.single_dispatches}", file=sys.stderr)

    for arm in ("grouped", "single"):
        vals = results[arm]
        if vals:
            print(f"{arm}: median {np.median(vals) * 1000:.2f} ms/tick "
                  f"rtf {np.median(vals) / 0.1:.4f}  all={['%.1f' % (v * 1000) for v in vals]}")


if __name__ == "__main__":
    main()
