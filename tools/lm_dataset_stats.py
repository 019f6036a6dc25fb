"""Duration statistics over a prepared LM dataset .txt
(reference tools/lm_dataset_stats.py): audio seconds per example measured by
counting codec unicode units between audio markers."""
import argparse

import numpy as np


def example_audio_secs(
    line: str,
    num_codebooks: int,
    num_channels: int,
    framerate: float,
    audio_start_token: str = "<|audio|>",
    audio_end_token: str = "<|end_audio|>",
) -> float:
    """Audio duration of one dataset line: keep only the spans between
    <|audio|> and <|end_audio|>; text-only lines count words as units."""
    if audio_start_token and audio_end_token:
        parts = line.split(audio_start_token)
        parts = [p.split(audio_end_token)[0] for p in parts]
        line = "".join(parts)
    if line[:1] == "<":
        line = line.replace("<", "").replace(">", "")
    num_units = len(line) / (num_codebooks * num_channels)
    return num_units / framerate


def main(argv=None):
    parser = argparse.ArgumentParser(description="Statistics for a codec LM text dataset")
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--num_codebooks", type=int, required=True)
    parser.add_argument("--codec_framerate", type=float, required=True)
    parser.add_argument("--audio_start_token", default="<|audio|>")
    parser.add_argument("--audio_end_token", default="<|end_audio|>")
    parser.add_argument("--num_channels", type=int, default=1)
    parser.add_argument("--num_examples", type=int, default=None)
    args = parser.parse_args(argv)

    lengths = []
    with open(args.dataset_path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i == args.num_examples:
                break
            line = line.rstrip()
            if not line:
                continue
            lengths.append(
                example_audio_secs(
                    line, args.num_codebooks, args.num_channels, args.codec_framerate,
                    args.audio_start_token, args.audio_end_token,
                )
            )
    total = float(np.sum(lengths))
    print(f"{len(lengths)} examples")
    print(f"Total: {total:.2f} seconds ({total / 3600:.2f} hours)")
    print(f"Max: {np.max(lengths):.2f} seconds")
    print(f"Min: {np.min(lengths):.2f} seconds")
    print(f"Median: {np.median(lengths):.2f} seconds")
    print(f"Mean: {np.mean(lengths):.2f} seconds")
    print(f"Std: {np.std(lengths):.2f} seconds")
    return lengths


if __name__ == "__main__":
    main()
