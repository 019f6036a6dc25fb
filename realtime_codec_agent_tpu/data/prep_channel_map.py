"""Speaker -> stereo-channel assignment from per-segment amplitudes.

Behavioral rebuild of reference prep_channel_map.py:13-70: each transcript
speaker is assigned the channel with the highest mean |amplitude| over their
speech segments; results land in ``*_channel_map.json`` next to the transcript.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..utils.audio_io import read_audio
from ..utils.audio_utils import resample
from .transcript_utils import load_transcript

SUPPORTED_EXTENSIONS = (".wav", ".flac", ".mp3", ".opus", ".ogg")


def get_files(path: str, extension: str) -> List[str]:
    out = []
    for root, _, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files if f.endswith(extension))
    return sorted(out)


def build_channel_map(
    audio: np.ndarray, sr: int, transcript_lines, speakers
) -> Dict[str, Dict]:
    """audio: (C, T). Returns {speaker: {channel, duration_secs}}."""
    channel_map: Dict[str, Dict] = {}
    for speaker in speakers:
        segments = [line for line in transcript_lines if line[2] == speaker]
        pieces = [
            audio[:, int(start * sr) : int(end * sr)] for start, end, _, _ in segments
        ]
        speaker_audio = (
            np.concatenate(pieces, axis=-1) if pieces else np.zeros((audio.shape[0], 0))
        )
        if speaker_audio.size == 0:
            channel_map[speaker] = {"channel": None, "duration_secs": 0.0}
        else:
            channel = int(np.argmax(np.mean(np.abs(speaker_audio), axis=-1)))
            channel_map[speaker] = {
                "channel": channel,
                "duration_secs": speaker_audio.shape[-1] / sr,
            }
    return channel_map


def process_transcript_file(
    transcript_file: str,
    transcripts_path: str,
    audio_path: str,
    overwrite: bool = False,
    target_sr: int = 16000,
) -> Optional[str]:
    """Returns the channel-map path written, or None if skipped."""
    audio_file = None
    for ext in SUPPORTED_EXTENSIONS:
        candidate = transcript_file.replace(transcripts_path, audio_path).replace(".txt", ext)
        if os.path.exists(candidate):
            audio_file = candidate
            break
    if audio_file is None:
        print(f"Skipping {transcript_file}: no audio file found.")
        return None
    channel_map_file = transcript_file.replace(".txt", "_channel_map.json")
    if not overwrite and os.path.exists(channel_map_file):
        print(f"Skipping {transcript_file}: channel map already exists.")
        return None
    sr, audio = read_audio(audio_file)
    if audio.ndim == 1:
        print(f"Skipping {transcript_file}: audio is mono.")
        return None
    if sr != target_sr:
        audio = resample(audio, sr, target_sr)
        sr = target_sr
    transcript_lines, speakers, _ = load_transcript(transcript_file)
    channel_map = build_channel_map(audio, sr, transcript_lines, speakers)
    with open(channel_map_file, "w") as f:
        json.dump(channel_map, f, indent=4)
    return channel_map_file


def main(argv=None):
    import argparse

    from tqdm import tqdm

    parser = argparse.ArgumentParser(
        description="Map transcript speaker ids to the audio channel they are on"
    )
    parser.add_argument("--transcripts_path", type=str, required=True)
    parser.add_argument("--audio_path", type=str, required=True)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args(argv)

    for transcript_file in tqdm(get_files(args.transcripts_path, ".txt"), desc="Transcript files"):
        process_transcript_file(
            transcript_file, args.transcripts_path, args.audio_path, args.overwrite
        )


if __name__ == "__main__":
    main()
