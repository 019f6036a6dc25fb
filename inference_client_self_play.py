"""Dual-agent self-play client: two agent processes cross-feed audio.

Rebuild of reference inference_client_self_play.py:31-246: each agent's output
chunk becomes the other's input; in self-play mode process_audio also returns
the generated token ids so the receiving agent skips re-encoding (reference
realtime_agent_v2.py:552-553). The browser/UI emits the mixed mean of both
channels. Headless mode (--headless --secs N) runs without gradio and dumps
session artifacts.
"""
import argparse
import os
import time

import numpy as np

from realtime_codec_agent_tpu import (
    RealtimeAgentConfig,
    RealtimeAgentMultiprocessing,
    add_common_inference_args,
)
from realtime_codec_agent_tpu.utils.audio_io import write_wav


class InprocSelfPlayAgent:
    """RealtimeAgentMultiprocessing-protocol adapter over an in-process
    RealtimeAgent, so the self-play loop/UI runs either way. The TPU-native
    one-chip mode: both agents share one weight pytree
    (resources.clone_for_self_play), each pipelined on its own fused program
    (the measured-best layout for cross-fed agents; ``--pair`` rides one
    batch-2 program instead) — versus the reference's
    one-llama.cpp-process-per-GPU layout
    (reference inference_client_self_play.py:148-159)."""

    def __init__(self, agent):
        self.agent = agent
        self._outputs = []

    def queue_input(self, item) -> None:
        import time as _time

        audio, ids = item
        t0 = _time.perf_counter()
        out = self.agent.process_audio(audio, ids)
        rtf = (_time.perf_counter() - t0) / self.agent.config.chunk_size_secs
        self._outputs.append((out, rtf))

    def next_output(self, block: bool = False):
        return self._outputs.pop(0) if self._outputs else None

    def get_info(self):
        from realtime_codec_agent_tpu.agent.agent import (
            RealtimeAgentMultiprocessingInfo,
        )

        a = self.agent
        # like the mp child's snapshot: settle in-flight work first so the
        # transcript/sequence include every processed chunk
        a.join_detours()
        while True:
            out = a.drain_pipeline()
            if out is None:
                break
            self._outputs.append((out, None))
        return RealtimeAgentMultiprocessingInfo(
            config=a.config,
            sampling_rate=a.resources.audio_tokenizer.sampling_rate,
            chunk_size_samples=a.chunk_size_samples,
            total_secs=a.total_secs,
            transcript=a.format_transcript(),
            sequence=a.get_sequence_str(),
            audio_history=a.get_audio_history(),
            external_llm_messages=a.get_external_llm_messages(),
        )


def build_agents(args):
    config_a = RealtimeAgentConfig(
        agent_opening_text=args.opening_text, seed=args.seed,
        pipeline_chunks=args.inproc,
    )
    config_b = RealtimeAgentConfig(
        agent_opening_text=None, seed=args.seed + 1,
        pipeline_chunks=args.inproc,
    )
    if args.inproc:
        from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
        from realtime_codec_agent_tpu.agent.resources import RealtimeAgentResources
        from realtime_codec_agent_tpu.lm.pair_session import pair_self_play_agents

        resources = RealtimeAgentResources(
            llm_model_path=args.llm_model_path, tiny=args.tiny
        )
        agent_a = RealtimeAgent(
            resources=resources, config=config_a, self_play_mode=True
        )
        agent_b = RealtimeAgent(
            resources=resources.clone_for_self_play(),
            config=config_b,
            self_play_mode=True,
        )
        if args.pair or args.coord:
            pair_self_play_agents(agent_a, agent_b)
        return InprocSelfPlayAgent(agent_a), InprocSelfPlayAgent(agent_b)
    agent_a = RealtimeAgentMultiprocessing(
        config=config_a,
        self_play_mode=True,
        device_id=args.device_a,
        llm_model_path=args.llm_model_path,
        tiny=args.tiny,
    )
    agent_b = RealtimeAgentMultiprocessing(
        config=config_b,
        self_play_mode=True,
        device_id=args.device_b,
        llm_model_path=args.llm_model_path,
        tiny=args.tiny,
    )
    return agent_a, agent_b


def self_play_loop(agent_a, agent_b, n_chunks: int, chunk_samples: int):
    """Cross-feed loop: A's out chunk (+ids) feeds B and vice versa."""
    silence = np.zeros(chunk_samples, dtype=np.float32)
    a_out, a_ids = silence, None
    mixed = []
    for _ in range(n_chunks):
        agent_b.queue_input((a_out, a_ids))
        b_out, b_ids = _next_output(agent_b)
        agent_a.queue_input((b_out, b_ids))
        a_out, a_ids = _next_output(agent_a)
        mixed.append((a_out + b_out) / 2.0)
        yield a_out, b_out, np.concatenate(mixed)


def self_play_loop_coord(agent_a, agent_b, n_chunks: int, chunk_samples: int):
    """Group-coordinated cross-feed (``--coord``): both agents dispatch into
    the shared batch-2 program — which launches and queues behind the
    in-flight one — before either resolves, so the fetch RTT hides under
    device compute (the duplex-serving drive applied to self-play). Both
    sides consume the partner's PREVIOUS tick output (the sequential loop
    feeds A the partner's same-tick chunk), the same one-chunk-stale
    semantics as the reference's queue-based cross-feed."""
    A, B = agent_a.agent, agent_b.agent
    silence = np.zeros(chunk_samples, dtype=np.float32)
    a_out, a_ids = silence, None
    b_out, b_ids = silence, None
    mixed = []
    for _ in range(n_chunks):
        A.process_audio_dispatch(b_out, b_ids)
        B.process_audio_dispatch(a_out, a_ids)
        a_out, a_ids = A.process_audio_resolve()
        b_out, b_ids = B.process_audio_resolve()
        mixed.append((a_out + b_out) / 2.0)
        yield a_out, b_out, np.concatenate(mixed)


def _next_output(agent):
    while True:
        out = agent.next_output(block=True)
        if out is not None:
            (audio, ids), _rtf = out[0], out[1]
            return audio, ids


def main():
    parser = argparse.ArgumentParser(description="Dual-agent self-play")
    add_common_inference_args(parser)
    parser.add_argument("--device_a", type=int, default=None)
    parser.add_argument("--device_b", type=int, default=None)
    parser.add_argument(
        "--inproc", action="store_true",
        help="both agents in THIS process on one chip, pipelined",
    )
    parser.add_argument(
        "--pair", action="store_true",
        help="with --inproc: ride both agents' fused chunks in one batch-2 "
             "program. Measured SLOWER for cross-fed self-play (87 vs 59 "
             "ms/tick in-window A/B): B's input is A's fetched output, so the "
             "group launch serializes behind the fetch and the device bubbles. "
             "Grouping wins only for independent streams (duplex serving).",
    )
    parser.add_argument(
        "--coord", action="store_true",
        help="with --inproc: batch-2 pair program driven SPLIT (both agents "
             "dispatch before either resolves). Loses to the default "
             "unpaired layout in healthy tunnel windows (69 vs 43 ms/tick) "
             "but wins heavily degraded ones (~45 vs 80-85) — use as "
             "degradation insurance",
    )
    parser.add_argument("--opening_text", default="hello?")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--headless", action="store_true")
    parser.add_argument("--secs", type=float, default=20.0)
    parser.add_argument("--output_dir", default="recordings")
    args = parser.parse_args()
    if args.coord and not args.inproc:
        raise SystemExit("--coord requires --inproc")

    agent_a, agent_b = build_agents(args)
    info = agent_a.get_info()
    chunk_samples = info.chunk_size_samples
    chunk_secs = info.config.chunk_size_secs

    loop = self_play_loop_coord if args.coord else self_play_loop
    if args.headless:
        n_chunks = int(args.secs / chunk_secs)
        t0 = time.time()
        for i, (a, b, _) in enumerate(
            loop(agent_a, agent_b, n_chunks, chunk_samples)
        ):
            if (i + 1) % 50 == 0:
                rtf = (time.time() - t0) / ((i + 1) * chunk_secs)
                print(f"chunk {i+1}/{n_chunks} RTF={rtf:.3f}")
        os.makedirs(args.output_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d-%H%M%S")
        for name, agent in [("a", agent_a), ("b", agent_b)]:
            inf = agent.get_info()
            with open(os.path.join(args.output_dir, f"selfplay_{name}_{stamp}.txt"), "w") as f:
                f.write(inf.transcript)
            if inf.audio_history.size:
                write_wav(
                    os.path.join(args.output_dir, f"selfplay_{name}_{stamp}.wav"),
                    inf.sampling_rate,
                    inf.audio_history,
                )
        print(f"Artifacts saved under {args.output_dir}/selfplay_*_{stamp}.*")
        return

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed; run with --headless.")

    with gr.Blocks() as ui:
        n_secs = gr.Number(value=30, label="seconds")
        run_btn = gr.Button("Run self-play")
        audio_out = gr.Audio(label="Conversation (mixed)")
        trans_a = gr.Textbox(label="Agent A transcript", lines=8)
        trans_b = gr.Textbox(label="Agent B transcript", lines=8)

        def run(n_secs):
            n_chunks = int(float(n_secs) / chunk_secs)
            mixed = None
            for _, _, mixed in loop(agent_a, agent_b, n_chunks, chunk_samples):
                pass
            return (
                (info.sampling_rate, mixed),
                agent_a.get_info().transcript,
                agent_b.get_info().transcript,
            )

        run_btn.click(run, inputs=[n_secs], outputs=[audio_out, trans_a, trans_b])
    ui.launch()


if __name__ == "__main__":
    main()
