"""Transcript file parsing and speaker bookkeeping.

Behavioral rebuild of reference utils/transcript_utils.py:5-89. Transcript
format: one utterance per line, ``start_secs end_secs speaker: text``; an
optional sibling ``*_channel_map.json`` maps speakers to stereo channels.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

TranscriptLine = Tuple[float, float, str, str]  # (start_secs, end_secs, speaker, text)


def load_transcript(
    transcript_file: str,
    speaker_proportion_threshold: float = 0.0,
) -> Tuple[List[TranscriptLine], List[str], Dict[str, Any]]:
    """Parse a transcript + channel map; drop speakers below the duration
    proportion threshold and remap remaining ids to contiguous A, B, C, ...
    (reference transcript_utils.py:5-52)."""
    lines: List[TranscriptLine] = []
    durations: Dict[str, float] = {}
    if os.path.exists(transcript_file):
        with open(transcript_file, "r", encoding="utf-8") as f:
            for raw in f:
                raw = raw.strip()
                if not raw:
                    continue
                parts = raw.split()
                start_secs, end_secs = float(parts[0]), float(parts[1])
                speaker = parts[2].rstrip(":")
                text = " ".join(parts[3:]).strip()
                if not text:
                    continue
                lines.append((start_secs, end_secs, speaker, text))
                durations[speaker] = durations.get(speaker, 0.0) + (end_secs - start_secs)

    channel_map_file = transcript_file.replace(".txt", "_channel_map.json")
    channel_map: Dict[str, Any] = {}
    if os.path.exists(channel_map_file):
        with open(channel_map_file, "r", encoding="utf-8") as f:
            channel_map = json.load(f)

    total = sum(durations.values())
    kept = {
        sp
        for sp, dur in durations.items()
        if total > 0 and dur / total >= speaker_proportion_threshold
    }
    speaker_map = {sp: chr(ord("A") + i % 26) for i, sp in enumerate(sorted(kept))}

    indexed = [
        (i, start, end, speaker_map[sp], text)
        for i, (start, end, sp, text) in enumerate(lines)
        if sp in speaker_map
    ]
    # order by start, then end, then original index (reference :50-52)
    indexed.sort(key=lambda x: (x[1], x[2], x[0]))
    out_lines = [(start, end, sp, text) for _, start, end, sp, text in indexed]
    out_channel_map = {
        speaker_map[sp]: ch for sp, ch in channel_map.items() if sp in speaker_map
    }
    speakers = sorted(speaker_map.values())
    return out_lines, speakers, out_channel_map


def is_speaker_channel_isolated(channel_map: Dict[str, Any], speaker: str) -> bool:
    """True iff no other speaker shares this speaker's channel (reference :54-64)."""
    if speaker not in channel_map:
        return False
    ch = channel_map[speaker]["channel"]
    return all(
        other == speaker or channel_map[other]["channel"] != ch for other in channel_map
    )


def set_agent_speaker(
    transcript_lines: List[TranscriptLine],
    speakers: List[str],
    channel_map: Dict[str, Any],
    agent_speaker: str,
) -> Tuple[List[TranscriptLine], Dict[str, Any]]:
    """Swap ``agent_speaker`` with "A" in lines + channel map (reference :66-89)."""
    if agent_speaker == "A":
        return transcript_lines, channel_map
    if agent_speaker not in speakers:
        raise ValueError(
            f"Agent speaker {agent_speaker} not found in transcript speakers: {speakers}"
        )
    swap = {agent_speaker: "A", "A": agent_speaker}
    swapped_lines = [
        (start, end, swap.get(sp, sp), text) for start, end, sp, text in transcript_lines
    ]
    swapped_map = {swap.get(sp, sp): ch for sp, ch in channel_map.items()}
    return swapped_lines, swapped_map
