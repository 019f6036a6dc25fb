"""Compile encoded codes + transcripts into the line-per-example LM text
dataset the trainer consumes.

Capability rebuild of reference prep_lm_dataset.py:54-97: reads codec
parameters from ``codec_info.json`` in --codes_path (written by
data/encode_corpus.py) or from explicit flags, drives
LMDatasetBuilder.iterate_examples, and writes ``<save_path>.txt`` (one
example per line) plus ``<save_path>_metadata.jsonl`` (file_id /
interleave_order / agent_speaker / example_index per line, consumed by
tools/split_lm_dataset.py).
"""
from __future__ import annotations

import argparse
import functools
import json
import os

from ..units.codes import UNICODE_OFFSET_LARGE
from .encode_corpus import get_codec_info
from .lm_dataset_builder import InterleaveOrder, LMDatasetBuilder


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=(
            "Construct a plain-text codec LM dataset (+ metadata jsonl) from "
            "codes .npy files and transcripts"
        )
    )
    parser.add_argument("--codes_path", type=str, required=True)
    parser.add_argument("--transcripts_path", type=str, required=True)
    parser.add_argument("--num_codebooks", type=int, default=None)
    parser.add_argument("--codebook_size", type=int, default=None)
    parser.add_argument("--codec_framerate", type=float, default=None)
    parser.add_argument(
        "--interleave_order",
        type=InterleaveOrder,
        choices=list(InterleaveOrder),
        default=InterleaveOrder.ALL,
    )
    # hex-friendly int (e.g. 0xE000)
    parser.add_argument(
        "--unicode_offset", type=functools.partial(int, base=0), default=UNICODE_OFFSET_LARGE
    )
    parser.add_argument("--context_secs", type=float, default=80.0)
    parser.add_argument("--overlap_secs", type=float, default=20.0)
    parser.add_argument("--text_only_context_words", type=int, default=3000)
    parser.add_argument("--text_only_overlap_words", type=int, default=750)
    parser.add_argument("--max_voice_enrollment_secs", type=float, default=6.0)
    parser.add_argument("--voice_enrollment_selection_seed", type=int, default=42)
    parser.add_argument("--agent_identity", type=str, default="A")
    parser.add_argument("--speaker_proportion_threshold", type=float, default=0.1)
    parser.add_argument("--save_path", type=str, default="output/lm_dataset.txt")
    parser.add_argument("--codes_filter", type=str, nargs="+", default=None)
    parser.add_argument("--codes_filter_exclude", type=str, nargs="+", default=None)
    parser.add_argument("--num_examples", type=int, default=None)
    return parser


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    codec_info = get_codec_info(args.codes_path)
    if codec_info:
        if args.num_codebooks is None:
            args.num_codebooks = codec_info.get("num_codebooks")
        if args.codebook_size is None:
            args.codebook_size = codec_info.get("codebook_size")
        if args.codec_framerate is None:
            args.codec_framerate = codec_info.get(
                "codec_framerate", codec_info.get("framerate")
            )
    if args.num_codebooks is None or args.codebook_size is None or args.codec_framerate is None:
        raise ValueError(
            "codec_info.json does not exist in --codes_path so you must specify "
            "--num_codebooks, --codebook_size, and --codec_framerate manually."
        )

    builder = LMDatasetBuilder(
        num_codebooks=args.num_codebooks,
        codebook_size=args.codebook_size,
        codec_framerate=args.codec_framerate,
        interleave_order=args.interleave_order,
        unicode_offset=args.unicode_offset,
        context_secs=args.context_secs,
        overlap_secs=args.overlap_secs,
        text_only_context_words=args.text_only_context_words,
        text_only_overlap_words=args.text_only_overlap_words,
        max_voice_enrollment_secs=args.max_voice_enrollment_secs,
        voice_enrollment_selection_seed=args.voice_enrollment_selection_seed,
        agent_identity=args.agent_identity,
        speaker_proportion_threshold=args.speaker_proportion_threshold,
    )

    save_dir = os.path.dirname(args.save_path)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    root, _ = os.path.splitext(args.save_path)
    metadata_path = f"{root}_metadata.jsonl"

    n = 0
    with open(args.save_path, "w", encoding="utf-8") as f, open(
        metadata_path, "w", encoding="utf-8"
    ) as f_meta:
        for i, (example, metadata) in enumerate(
            builder.iterate_examples(
                args.codes_path,
                args.transcripts_path,
                args.codes_filter,
                args.codes_filter_exclude,
            )
        ):
            if i == args.num_examples:
                break
            f.write(example)
            f.write("\n")
            f_meta.write(json.dumps(metadata) + "\n")
            n = i + 1
    print(f"wrote {n} examples to {args.save_path} (+ {metadata_path})")
    return args.save_path


if __name__ == "__main__":
    main()
