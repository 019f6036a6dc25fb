"""Offline corpus -> interleaved LM-text compiler.

Behavioral rebuild of the reference dataset builder
(realtime_codec_agent/lm_dataset_builder.py:15-483): per recording it emits up
to five interleave variants —

- ``audio_only``: the raw frame-interleaved code stream;
- ``text_only``: the transcript text stream;
- ``audio_first``: audio, with each utterance's text spliced in at the
  utterance END (transcription-style);
- ``text_first``: text spliced at the utterance START (planning-style);
- ``agent``: per candidate agent speaker, the agent's text-first stream merged
  with everyone else's audio-first stream (two-pointer audio-preserving merge),
  plus a seeded voice-enrollment sample in the header.

Examples are windows of ``context_secs`` with ``overlap_secs`` overlap snapped
to acoustic-unit boundaries; text_only windows by word count.
"""
from __future__ import annotations

import os
import random
import re
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

from ..units.codes import UNICODE_OFFSET, audio_code_positions, codes_to_chars
from ..units import special_tokens as st
from .transcript_utils import (
    TranscriptLine,
    is_speaker_channel_isolated,
    load_transcript,
    set_agent_speaker,
)


class InterleaveOrder(Enum):
    AUDIO_ONLY = "audio_only"
    TEXT_ONLY = "text_only"
    AUDIO_FIRST = "audio_first"
    TEXT_FIRST = "text_first"
    AGENT = "agent"
    ALL = "all"


CODES_FILE_RE = re.compile(r"(.+)_c(\d+)[_.]")


def get_codes_files(codes_path: str, codes_filter=None) -> List[str]:
    """Recursively list .npy code files, optionally substring-filtered
    (codec_bpe get_codes_files equivalent)."""
    if isinstance(codes_filter, str):
        codes_filter = [codes_filter]
    out = []
    for root, _, files in os.walk(codes_path):
        for fname in sorted(files):
            if not fname.endswith(".npy"):
                continue
            path = os.path.join(root, fname)
            if codes_filter and not any(f in path for f in codes_filter):
                continue
            out.append(path)
    return sorted(out)


@dataclass
class LMDatasetBuilder:
    num_codebooks: int
    codebook_size: int
    codec_framerate: float
    interleave_order: InterleaveOrder = InterleaveOrder.ALL
    audio_start_token: str = st.START_AUDIO
    audio_end_token: str = st.END_AUDIO
    header_audio_only_token: str = st.HEADER_AUDIO_ONLY
    header_text_only_token: str = st.HEADER_TEXT_ONLY
    header_audio_first_token: str = st.HEADER_AUDIO_FIRST
    header_text_first_token: str = st.HEADER_TEXT_FIRST
    header_agent_token: str = st.HEADER_AGENT
    header_agent_voice_token: str = st.HEADER_AGENT_VOICE
    header_speaker_token: str = st.HEADER_SPEAKER
    header_end_token: str = st.END_HEADER
    unicode_offset: int = UNICODE_OFFSET
    context_secs: float = 80.0
    overlap_secs: float = 20.0
    text_only_context_words: int = 3000
    text_only_overlap_words: int = 750
    max_voice_enrollment_secs: float = 6.0
    voice_enrollment_selection_seed: int = 42
    agent_identity: str = "A"
    speaker_proportion_threshold: float = 0.1

    # ----------------------------------------------------------- file groups
    def _group_codes_files(self, codes_files: List[str]) -> List[Tuple[str, List[List[str]]]]:
        """Group files by recording root, then by channel; multiple timestamped
        segments per channel stay ordered (reference :75-101)."""
        groups: List[Tuple[str, List[Tuple[str, int]]]] = []
        last_root = None
        for path in codes_files:
            m = CODES_FILE_RE.match(path)
            if not m:
                raise ValueError(
                    f"Invalid codes file name format: {path}. "
                    "Expected *_c<channel>.npy or *_c<channel>_<timestamp>.npy"
                )
            root, channel = m.group(1), int(m.group(2))
            if root != last_root:
                groups.append((root, []))
                last_root = root
            groups[-1][1].append((path, channel))
        out = []
        for root, members in groups:
            num_channels = max(ch for _, ch in members) + 1
            out.append(
                (root, [[p for p, ch in members if ch == c] for c in range(num_channels)])
            )
        return out

    # --------------------------------------------------------- string builds
    def _secs_to_pos(self, secs: float) -> int:
        pos = int(secs * self.codec_framerate * self.num_codebooks)
        return pos - pos % self.num_codebooks  # snap to acoustic-unit start

    def _interleave_slice(self, channels_chars: List[str], start: int, end: int) -> str:
        parts = [chars[start:end] for chars in channels_chars]
        if len(parts) == 1:
            return parts[0]
        n = min(len(p) for p in parts)
        arrs = [np.frombuffer(p[:n].encode("utf-32-le"), dtype=np.uint32) for p in parts]
        return np.stack(arrs, axis=1).reshape(-1).tobytes().decode("utf-32-le")

    def _agent_channel_first(
        self, channels_chars: List[str], channel_map: Dict[str, Dict]
    ) -> List[str]:
        """Ensure the agent speaker's channel is channel 0 (reference :182-193)."""
        agent_ch = channel_map.get(self.agent_identity, {"channel": 0})["channel"]
        if agent_ch == 0:
            return channels_chars
        swapped = list(channels_chars)
        swapped[0], swapped[agent_ch] = channels_chars[agent_ch], channels_chars[0]
        return swapped

    def _build_codes_str(
        self,
        channels_chars: List[str],
        transcript_lines: List[Optional[TranscriptLine]],
        channel_map: Dict[str, Dict],
        interleave_order: InterleaveOrder,
        trans_start_pos: Optional[int] = None,
        trans_end_pos: Optional[int] = None,
    ) -> str:
        """Audio with text spliced at utterance starts (text_first) or ends
        (audio_first); a trailing None line flushes remaining audio
        (reference :170-230)."""
        if interleave_order in (InterleaveOrder.AGENT, InterleaveOrder.ALL):
            raise ValueError(f"{interleave_order} cannot be passed here.")
        channels_chars = self._agent_channel_first(channels_chars, channel_map)

        parts: List[str] = []
        last_pos = trans_start_pos if trans_start_pos is not None else 0
        last_speaker = None
        for line in transcript_lines:
            start_secs, end_secs, speaker, text = line
            anchor_secs = end_secs if interleave_order == InterleaveOrder.AUDIO_FIRST else start_secs
            if anchor_secs is None:
                line_pos = trans_end_pos if trans_end_pos is not None else len(channels_chars[0])
            else:
                line_pos = self._secs_to_pos(anchor_secs)
            if line_pos > last_pos:
                parts.append(self.audio_start_token)
                parts.append(self._interleave_slice(channels_chars, last_pos, line_pos))
                last_pos = line_pos
                parts.append(self.audio_end_token)
                last_speaker = None  # audio intervened: restate the speaker
            if speaker is not None:
                if speaker == last_speaker:
                    parts.append(f" {text}")
                else:
                    parts.append(f" {speaker}: {text}")
                    last_speaker = speaker
        return "".join(parts)

    def _build_text_only_str(self, transcript_lines) -> str:
        return "".join(
            f" {sp}: {text}" for _, _, sp, text in transcript_lines if sp is not None and text
        )

    def _is_audio_code(self, char: str) -> bool:
        return ord(char) >= self.unicode_offset

    def _merge_codes_strs(self, codes_str_1: str, codes_str_2: str) -> str:
        """Two-pointer merge of two streams sharing identical audio tokens but
        disjoint transcribed speakers; codes_str_1's text wins position ties
        (reference :237-279)."""
        _, audio_1 = audio_code_positions(codes_str_1, self.unicode_offset)
        _, audio_2 = audio_code_positions(codes_str_2, self.unicode_offset)
        if audio_1 != audio_2:
            raise ValueError("The audio tokens in the two strings do not match.")

        out: List[str] = []
        i1 = i2 = 0
        n1, n2 = len(codes_str_1), len(codes_str_2)
        while i1 < n1 and i2 < n2:
            c1 = codes_str_1[i1]
            if c1 == codes_str_2[i2] and self._is_audio_code(c1):
                out.append(c1)
                i1 += 1
                i2 += 1
            elif not self._is_audio_code(c1):
                out.append(c1)
                i1 += 1
            elif not self._is_audio_code(codes_str_2[i2]):
                out.append(codes_str_2[i2])
                i2 += 1
        out.append(codes_str_1[i1:])
        out.append(codes_str_2[i2:])
        merged = "".join(out)

        sa, ea = self.audio_start_token, self.audio_end_token
        merged = merged.replace(sa + sa, sa).replace(ea + ea, ea).replace(sa + ea, "")
        if merged.startswith(sa) and not self._is_audio_code(merged[len(sa)]):
            merged = merged[len(sa):]

        _, merged_audio = audio_code_positions(merged, self.unicode_offset)
        if merged_audio != audio_1:
            raise ValueError("The merged audio tokens do not match the original audio tokens.")
        return merged

    # --------------------------------------------------------- voice samples
    def _select_agent_voice(
        self,
        agent_channel_chars: str,
        example_start_code: int,
        example_end_code: int,
        transcript_lines: List[TranscriptLine],
        agent_speaker: str,
        agent_channel_isolated: bool,
        target_min_candidates: int = 20,
        target_min_length_secs: float = 3.0,
    ) -> Optional[str]:
        """Seeded pick of a clean (non-overlapped, out-of-window, <=6 s) agent
        speech span for the enrollment header (reference :290-339)."""
        ranges = [
            (self._secs_to_pos(s), self._secs_to_pos(e), sp, e - s)
            for s, e, sp, _ in transcript_lines
        ]
        overlap = np.zeros(len(agent_channel_chars), dtype=np.int32)
        if not agent_channel_isolated:
            for start, end, sp, _ in ranges:
                if sp != agent_speaker:
                    overlap[start:end] += 1
        candidates = [
            (agent_channel_chars[start:end], length)
            for start, end, sp, length in ranges
            if sp == agent_speaker
            and length <= self.max_voice_enrollment_secs
            and overlap[start:end].sum() == 0
            and (end <= example_start_code or start >= example_end_code)
        ]
        candidates.sort(key=lambda x: x[1], reverse=True)
        pool = [
            chars
            for i, (chars, length) in enumerate(candidates)
            if i < target_min_candidates or length >= target_min_length_secs
        ]
        if not pool:
            return None
        return random.choice(pool)

    # -------------------------------------------------------------- variants
    def _build_codes_strs(
        self,
        channels_chars: List[str],
        transcript_lines: List[TranscriptLine],
        trans_pos_bounds: Tuple[int, int],
        speakers: List[str],
        channel_map: Dict[str, Dict],
    ) -> List[Tuple[str, InterleaveOrder, Optional[str]]]:
        lines = list(transcript_lines) + [(None, None, None, None)]  # flush tail audio
        order = self.interleave_order
        out: List[Tuple[str, InterleaveOrder, Optional[str]]] = []

        if order in (InterleaveOrder.AUDIO_ONLY, InterleaveOrder.ALL):
            s = self._build_codes_str(channels_chars, lines[-1:], channel_map, InterleaveOrder.AUDIO_ONLY)
            out.append((s, InterleaveOrder.AUDIO_ONLY, None))
        if order in (InterleaveOrder.TEXT_ONLY, InterleaveOrder.ALL) and speakers:
            out.append((self._build_text_only_str(lines), InterleaveOrder.TEXT_ONLY, None))
        if order in (InterleaveOrder.AUDIO_FIRST, InterleaveOrder.ALL) and speakers:
            s = self._build_codes_str(
                channels_chars, lines, channel_map, InterleaveOrder.AUDIO_FIRST, *trans_pos_bounds
            )
            out.append((s, InterleaveOrder.AUDIO_FIRST, None))
        if order in (InterleaveOrder.TEXT_FIRST, InterleaveOrder.ALL) and speakers:
            s = self._build_codes_str(
                channels_chars, lines, channel_map, InterleaveOrder.TEXT_FIRST, *trans_pos_bounds
            )
            out.append((s, InterleaveOrder.TEXT_FIRST, None))
        if order in (InterleaveOrder.AGENT, InterleaveOrder.ALL) and len(speakers) == 2:
            # each speaker takes a turn as the agent so both speaking and
            # listening roles are learned in every combination (reference :133-153)
            for agent_speaker in speakers:
                sw_lines, sw_map = set_agent_speaker(lines, speakers, channel_map, agent_speaker)
                agent_lines = [l for l in sw_lines if l[2] == self.agent_identity or l[2] is None]
                other_lines = [l for l in sw_lines if l[2] != self.agent_identity]
                agent_str = self._build_codes_str(
                    channels_chars, agent_lines, sw_map, InterleaveOrder.TEXT_FIRST, *trans_pos_bounds
                )
                other_str = self._build_codes_str(
                    channels_chars, other_lines, sw_map, InterleaveOrder.AUDIO_FIRST, *trans_pos_bounds
                )
                # other (audio-first) passed first: transcription text precedes
                # planning text at shared positions
                merged = self._merge_codes_strs(other_str, agent_str)
                out.append((merged, InterleaveOrder.AGENT, agent_speaker))
        return out

    def _common_header(self, interleave_order: InterleaveOrder, speakers: List[str]) -> str:
        token = {
            InterleaveOrder.AUDIO_ONLY: self.header_audio_only_token,
            InterleaveOrder.TEXT_ONLY: self.header_text_only_token,
            InterleaveOrder.AUDIO_FIRST: self.header_audio_first_token,
            InterleaveOrder.TEXT_FIRST: self.header_text_first_token,
            InterleaveOrder.AGENT: self.header_agent_token,
        }[interleave_order]
        header = token
        if interleave_order != InterleaveOrder.AUDIO_ONLY:
            header += "".join(f"{self.header_speaker_token} {sp}" for sp in speakers)
        return header

    # -------------------------------------------------------------- iterator
    def iterate_examples(
        self,
        codes_path: str,
        transcripts_path: str,
        codes_filter: Optional[Union[str, List[str]]] = None,
        codes_filter_exclude: Optional[Union[str, List[str]]] = None,
        show_progress: bool = True,
    ) -> Iterator[Tuple[str, Dict]]:
        codes_files = get_codes_files(codes_path, codes_filter)
        if codes_filter_exclude:
            if isinstance(codes_filter_exclude, str):
                codes_filter_exclude = [codes_filter_exclude]
            codes_files = [
                f for f in codes_files if not any(ex in f for ex in codes_filter_exclude)
            ]
        groups = self._group_codes_files(codes_files)
        if show_progress:
            from tqdm import tqdm

            groups = tqdm(groups, desc="Codes file groups")

        for file_root, file_channels in groups:
            rel_root = os.path.relpath(file_root, codes_path)
            transcript_file = os.path.join(transcripts_path, f"{rel_root}.txt")
            transcript_lines, speakers, channel_map = load_transcript(
                transcript_file, self.speaker_proportion_threshold
            )
            if (
                self.interleave_order not in (InterleaveOrder.AUDIO_ONLY, InterleaveOrder.ALL)
                and not transcript_lines
            ):
                print(f"No transcript found for {file_root}. Skipping file...")
                continue

            num_channels = len(file_channels)
            if num_channels == 1:
                channel_map = {}  # mono encode: channel map is meaningless
            unit = self.num_codebooks * num_channels
            context_codes = int(self.context_secs * self.codec_framerate * unit)
            overlap_codes = int(self.overlap_secs * self.codec_framerate * unit)
            if context_codes % unit or overlap_codes % unit:
                raise ValueError(
                    f"context/overlap codes must be divisible by {unit} so examples "
                    "don't split an acoustic unit or channel pair."
                )

            codes = np.stack(
                [
                    np.concatenate([np.load(f) for f in group], axis=-1)
                    for group in file_channels
                ]
            )
            # accept (C, ..., num_codebooks, T) layouts from the batch encoder
            while codes.ndim > 3:
                codes = codes[:, 0]
            codes = codes[:, : self.num_codebooks]

            channels_chars = [
                codes_to_chars(ch, self.codebook_size, unicode_offset=self.unicode_offset)
                for ch in codes
            ]

            if transcript_lines:
                trans_pos_bounds = (
                    self._secs_to_pos(min(l[0] for l in transcript_lines)),
                    self._secs_to_pos(max(l[1] for l in transcript_lines)),
                )
            else:
                trans_pos_bounds = (0, len(channels_chars[0]))

            codes_strs = self._build_codes_strs(
                channels_chars, transcript_lines, trans_pos_bounds, speakers, channel_map
            )

            random.seed(self.voice_enrollment_selection_seed)
            for codes_str, order, agent_speaker in codes_strs:
                metadata = {
                    "file_id": rel_root,
                    "interleave_order": order.value,
                    "agent_speaker": agent_speaker,
                    "example_index": 0,
                }
                if order == InterleaveOrder.TEXT_ONLY:
                    yield from self._window_text_only(codes_str, speakers, metadata)
                else:
                    yield from self._window_codes(
                        codes_str,
                        order,
                        speakers,
                        agent_speaker,
                        channels_chars,
                        channel_map,
                        transcript_lines,
                        trans_pos_bounds,
                        context_codes,
                        overlap_codes,
                        num_channels,
                        metadata,
                    )

    def _window_text_only(self, text_str: str, speakers: List[str], metadata: Dict):
        """Word-count windows snapped forward to speaker-turn starts (reference :435-452)."""
        words = text_str.split()
        speaker_words = {f"{sp}:" for sp in speakers}
        start = 0
        while True:
            end = start + self.text_only_context_words
            example = " ".join(words[start:end])
            header = self._common_header(InterleaveOrder.TEXT_ONLY, speakers)
            yield f"{header}{self.header_end_token} {example}", metadata.copy()
            metadata["example_index"] += 1
            if end >= len(words):
                break
            start = end - self.text_only_overlap_words
            while start < end and words[start] not in speaker_words:
                start += 1

    def _window_codes(
        self,
        codes_str: str,
        order: InterleaveOrder,
        speakers: List[str],
        agent_speaker: Optional[str],
        channels_chars: List[str],
        channel_map: Dict,
        transcript_lines: List[TranscriptLine],
        trans_pos_bounds: Tuple[int, int],
        context_codes: int,
        overlap_codes: int,
        num_channels: int,
        metadata: Dict,
    ):
        """Audio-aligned windows over the mixed stream (reference :453-483)."""
        audio_idx, _ = audio_code_positions(codes_str, self.unicode_offset)
        start_code = 0
        while True:
            end_code = start_code + context_codes
            start = audio_idx[start_code] if start_code > 0 else 0
            end = audio_idx[end_code] if end_code < len(audio_idx) else len(codes_str)
            example = codes_str[start:end]
            header = self._common_header(order, speakers)
            if order == InterleaveOrder.AGENT:
                agent_ch = channel_map.get(agent_speaker, {"channel": 0})["channel"]
                isolated = is_speaker_channel_isolated(channel_map, agent_speaker)
                voice = self._select_agent_voice(
                    channels_chars[agent_ch],
                    trans_pos_bounds[0] + start_code // num_channels,
                    trans_pos_bounds[0] + end_code // num_channels,
                    transcript_lines,
                    agent_speaker,
                    isolated,
                )
                if voice is not None:
                    header += f"{self.header_agent_voice_token}{voice}"
            yield f"{header}{self.header_end_token}{example}", metadata.copy()
            metadata["example_index"] += 1
            if end_code >= len(audio_idx):
                break
            start_code = end_code - overlap_codes
