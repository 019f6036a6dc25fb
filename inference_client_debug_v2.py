"""Single-process file-driven debug client.

Rebuild of reference inference_client_debug_v2.py:79-180: loop a WAV through
``RealtimeAgent.process_audio`` chunkwise with streaming RTF plot + audio /
transcript / sequence outputs in a gradio UI. Requires gradio (gated); the
headless equivalent is cli_benchmark.py.
"""
import argparse

import numpy as np

from realtime_codec_agent_tpu import (
    RealtimeAgent,
    RealtimeAgentConfig,
    RealtimeAgentResources,
    add_common_inference_args,
)
from realtime_codec_agent_tpu.utils.audio_io import read_audio
from realtime_codec_agent_tpu.utils.audio_utils import resample


def run_agent(agent: RealtimeAgent, audio_file: str, config: RealtimeAgentConfig):
    """Generator: yields (sr, out_audio_so_far), transcript, sequence, rtf_fig
    per processed second."""
    agent.set_config(config)
    agent.reset()
    sr = agent.resources.audio_tokenizer.sampling_rate
    in_sr, audio = read_audio(audio_file, mono=True)
    audio = resample(audio, in_sr, sr)
    chunk = agent.chunk_size_samples
    out_chunks = []
    for i in range(len(audio) // chunk):
        out = agent.process_audio(audio[i * chunk : (i + 1) * chunk])
        out_chunks.append(out)
        if (i + 1) % int(1.0 / config.chunk_size_secs) == 0:
            yield (
                (sr, np.concatenate(out_chunks)),
                agent.format_transcript(),
                agent.get_sequence_str(),
                agent.profilers.build_plot(),
            )
    yield (
        (sr, np.concatenate(out_chunks)) if out_chunks else (sr, np.zeros(0, np.float32)),
        agent.format_transcript(),
        agent.get_sequence_str(),
        agent.profilers.build_plot(),
    )


def main():
    parser = argparse.ArgumentParser(description="File-driven debug client (gradio UI)")
    add_common_inference_args(parser)
    args = parser.parse_args()

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed; use cli_benchmark.py for a headless run."
        )

    resources = RealtimeAgentResources(
        llm_model_path=args.llm_model_path, tiny=args.tiny, whisper_model=None
    )
    agent = RealtimeAgent(resources=resources)

    with gr.Blocks() as demo:
        audio_in = gr.Audio(type="filepath", label="Input audio")
        temperature = gr.Slider(0.0, 2.0, value=1.0, label="temperature")
        top_k = gr.Slider(1, 500, value=100, step=1, label="top_k")
        seed = gr.Number(value=42, precision=0, label="seed")
        run_btn = gr.Button("Run")
        audio_out = gr.Audio(label="Agent output", streaming=True)
        transcript_out = gr.Textbox(label="Transcript", lines=10)
        sequence_out = gr.Textbox(label="Sequence", lines=10)
        plot_out = gr.Plot(label="Realtime factor")

        def launch(audio_file, temperature, top_k, seed):
            config = RealtimeAgentConfig(
                temperature=float(temperature), top_k=int(top_k), seed=int(seed)
            )
            yield from run_agent(agent, audio_file, config)

        run_btn.click(
            launch,
            inputs=[audio_in, temperature, top_k, seed],
            outputs=[audio_out, transcript_out, sequence_out, plot_out],
        )
    demo.launch()


if __name__ == "__main__":
    main()
