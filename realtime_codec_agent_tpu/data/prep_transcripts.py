"""Corpus transcript normalization into the unified ``start end speaker: text`` format.

Behavioral rebuild of reference prep_transcripts.py:9-336 for four corpora:
TalkBank CHAT zips (via pylangacq, gated), Fisher LDC transcripts, GigaSpeech
JSON, and LibriHeavy jsonl (with overlap dedup). The text cleaner is an
ordered transform pipeline with the same normalization semantics.
"""
from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterable, List, Optional, Tuple

# Ordered cleaning pipeline (reference clean_line, prep_transcripts.py:9-59).
_PSEUDO_PUNCT = [
    ("<comma>", ","),
    ("<period>", "."),
    ("<questionmark>", "?"),
    ("<exclamationpoint>", "!"),
    ("<sil>", "[sil]"),
    ("<music>", "[music]"),
    ("<noise>", "[noise]"),
    ("<other>", "[other]"),
]
_CLEAN_STEPS: List[Tuple[re.Pattern, str]] = [
    (re.compile(r" \[!\]"), "!"),  # 'hello [!]' -> 'hello!'
    (re.compile(r"\d+?_\d+?"), ""),  # inline timestamps
    (re.compile(r'\+[",]'), ""),
    (re.compile(r"\+/\."), ""),
    (re.compile("&-"), ""),  # filler prefix
    (re.compile("[°☺⁎]"), " "),
    (re.compile(r"[^\w !?.,;\"'`()&=%\-\[\]]"), ""),  # drop exotic chars
    (re.compile("ʔ"), ""),
    (re.compile(r"&[l,n]=.+?(?=(?:\s|\Z))"), ""),  # long-event notations
    (
        re.compile(r"&=(?:lengthened|tsk|in|nonvocal|ex)(?=(?:\s|\Z))", re.IGNORECASE),
        "",
    ),
    (re.compile(r"\(\( *(.*?) *\)\)"), r"\1"),  # uncertain-transcription parens
    (re.compile(r"(?<=[ _]\w)\.?_"), "."),  # acronym underscores mid-string
    (re.compile(r"(?<=\A\w)\.?_"), "."),  # ...and at string start
    (re.compile("_"), " "),
    (re.compile(" {2,}"), " "),
    (re.compile(" (?=[!?.,;'])"), ""),  # re-attach punctuation
    (re.compile(" (?=n')"), ""),
]
_BRACKETED = re.compile(r"\[[^%\]].*?\]")


def clean_line(line: str, remove_bracketed: bool = False) -> str:
    for literal, repl in _PSEUDO_PUNCT:
        line = line.replace(literal, repl)
    line = _CLEAN_STEPS[0][0].sub(_CLEAN_STEPS[0][1], line)
    if remove_bracketed:
        line = _BRACKETED.sub("", line)
    for pattern, repl in _CLEAN_STEPS[1:]:
        line = pattern.sub(repl, line)
    return line.strip()


# ---------------------------------------------------------------------------
# TalkBank CHAT (gated on pylangacq)
# ---------------------------------------------------------------------------

def expand_talkbank_utterances(utterances):
    """Split multi-time-marked utterances on their inline timestamps
    (reference :61-86)."""
    from pylangacq.objects import Utterance

    expanded = []
    for utt in utterances:
        text = utt.tiers[utt.participant]
        marks = list(re.finditer(r"(\d+?)_(\d+?)", text))
        sub_utts = [
            Utterance(
                participant=utt.participant,
                tokens=[],
                time_marks=(int(m.group(1)), int(m.group(2))),
                tiers={
                    utt.participant: text[
                        (marks[i - 1].end() if i > 0 else 0) : m.end()
                    ].lstrip()
                },
            )
            for i, m in enumerate(marks)
        ]
        if sub_utts and sub_utts[0].time_marks != utt.time_marks:
            raise ValueError(
                f"Time marks of first parsed utterance {sub_utts[0].time_marks} "
                f"do not match original {utt.time_marks}."
            )
        expanded.extend(sub_utts if len(sub_utts) > 1 else [utt])
    return expanded


def get_talkbank_cleaned_utterances(header, utterances) -> List[str]:
    """Clean + speaker-remap; buffer untimed utterances until one carries time
    marks (reference :88-113)."""
    part_map = {
        part: chr(ord("A") + i % 26)
        for i, part in enumerate(header["Participants"])
    }
    out: List[str] = []
    buffer: List[str] = []
    for utt in utterances:
        text = clean_line(utt.tiers[utt.participant], remove_bracketed=True)
        if text in (".", "0."):
            continue
        buffer.append(f"{part_map[utt.participant]}: {text}")
        if utt.time_marks is None:
            continue
        start, end = utt.time_marks[0] / 1000, utt.time_marks[1] / 1000
        out.extend(f"{start:.2f} {end:.2f} {u}" for u in buffer)
        buffer.clear()
    return out


# ---------------------------------------------------------------------------
# Fisher
# ---------------------------------------------------------------------------

# LDC disk layout: transcript subfolder number -> audio partition (reference :131-164)
_FISHER_P1 = [
    (0, 7, "fisher_eng_tr_sp_d1"),
    (8, 16, "fisher_eng_tr_sp_d2"),
    (17, 25, "fisher_eng_tr_sp_d3"),
    (26, 34, "fisher_eng_tr_sp_d4"),
    (35, 43, "fisher_eng_tr_sp_d5"),
    (44, 52, "fisher_eng_tr_sp_d6"),
    (53, 58, "fisher_eng_tr_sp_d7"),
]
_FISHER_P2 = [
    (58, 66, "fe_03_p2_sph1"),
    (67, 75, "fe_03_p2_sph2"),
    (76, 83, "fe_03_p2_sph3"),
    (84, 91, "fe_03_p2_sph4"),
    (92, 99, "fe_03_p2_sph5"),
    (100, 108, "fe_03_p2_sph6"),
    (109, 116, "fe_03_p2_sph7"),
]


def lookup_fisher_partition(fisher_tran_part: str, number_subfolder: str) -> str:
    num = int(number_subfolder)
    table = {"fe_03_p1_tran": _FISHER_P1, "fe_03_p2_tran": _FISHER_P2}.get(fisher_tran_part, [])
    for lo, hi, partition in table:
        if lo <= num <= hi:
            return partition
    raise ValueError(f"Unknown partition for {fisher_tran_part} and {number_subfolder}")


def get_fisher_cleaned_utterances(transcript_file: str) -> List[str]:
    """Fisher lines are already `start end speaker:` prefixed (reference :115-129)."""
    out = []
    with open(transcript_file, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            text = clean_line(" ".join(parts[3:]))
            if text:
                out.append(f"{' '.join(parts[:3])} {text}")
    return out


# ---------------------------------------------------------------------------
# GigaSpeech / LibriHeavy
# ---------------------------------------------------------------------------

def _speaker_letters(speakers: Iterable[str]) -> Dict[str, str]:
    part_map: Dict[str, str] = {}
    for sp in speakers:
        if sp not in part_map:
            part_map[sp] = chr(ord("A") + len(part_map) % 26)
    return part_map


def get_gigaspeech_cleaned_utterances(segments: List[Dict]) -> List[str]:
    part_map = _speaker_letters(seg["speaker"] for seg in segments)
    out = []
    for seg in segments:
        text = clean_line(seg["text_tn"].lower())
        if text:
            out.append(
                f"{seg['begin_time']:.2f} {seg['end_time']:.2f} {part_map[seg['speaker']]}: {text}"
            )
    return out


def get_libriheavy_cleaned_utterances(supervisions: List[Dict], trans_start: float) -> List[str]:
    part_map = _speaker_letters(sup["speaker"] for sup in supervisions)
    out = []
    for sup in supervisions:
        text = clean_line(sup["custom"]["texts"][0])
        if text:
            start = trans_start + sup["start"]
            out.append(
                f"{start:.2f} {start + sup['duration']:.2f} {part_map[sup['speaker']]}: {text}"
            )
    return out


def dedup_libriheavy_lines(out_file_lines: List[str], new_lines: List[str]) -> None:
    """Append new utterance lines, dropping overlaps/duplicates from the cut
    overlap windows (reference :312-335). Mutates out_file_lines."""
    for line in new_lines:
        new_start, new_end, new_sp = line.split()[:3]
        new_start, new_end = float(new_start), float(new_end)
        if out_file_lines:
            last = out_file_lines[-1].split()
            last_start, last_end, last_sp = float(last[0]), float(last[1]), last[2]
            if last_start == new_start and last_sp == new_sp and new_end > last_end:
                out_file_lines[-1] = line  # longer rewrite of the same utterance
                continue
            if last_end == new_end and last_sp == new_sp and new_start > last_start:
                continue  # shorter duplicate
            if new_start < last_end:
                continue  # overlapping fragment
        out_file_lines.append(line)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def process_talkbank(raw_path: str, processed_path: str) -> None:
    import pylangacq
    from tqdm import tqdm

    for fname in os.listdir(raw_path):
        if not fname.endswith(".zip"):
            continue
        zip_path = os.path.join(raw_path, fname)
        print(f"Processing {zip_path}")
        target = os.path.join(processed_path, os.path.splitext(fname)[0])
        os.makedirs(target, exist_ok=True)
        reader = pylangacq.read_chat(zip_path)
        for filepath, header, utts in tqdm(
            zip(reader.file_paths(), reader.headers(), reader.utterances(by_files=True)),
            desc="Files",
        ):
            utts = expand_talkbank_utterances(utts)
            cleaned = get_talkbank_cleaned_utterances(header, utts)
            out_name = os.path.splitext(os.path.basename(filepath))[0] + ".txt"
            _write_lines(os.path.join(target, out_name), cleaned)


def process_fisher(raw_path: str, processed_path: str) -> None:
    from tqdm import tqdm

    for tran_part, audio_part in [
        ("fe_03_p1_tran", "fisher_eng_tr_sp_LDC2004S13"),
        ("fe_03_p2_tran", "fe_03_p2_LDC2005S13"),
    ]:
        print(f"Processing {tran_part}")
        trans_path = os.path.join(raw_path, tran_part, "data", "trans")
        for root, _, files in os.walk(trans_path):
            txts = sorted(os.path.join(root, f) for f in files if f.endswith(".txt"))
            for transcript_file in tqdm(txts, desc=f"Files in {root}") if txts else []:
                cleaned = get_fisher_cleaned_utterances(transcript_file)
                subfolder = os.path.basename(os.path.dirname(transcript_file))
                partition = lookup_fisher_partition(tran_part, subfolder)
                target = os.path.join(processed_path, audio_part, partition, "audio")
                out_path = transcript_file.replace(trans_path, target)
                _write_lines(out_path, cleaned)


def process_gigaspeech(raw_path: str, processed_path: str) -> None:
    from tqdm import tqdm

    with open(os.path.join(raw_path, "GigaSpeech.json"), "r", encoding="utf-8") as f:
        data = json.load(f)
    for audio in tqdm(data["audios"], desc="GigaSpeech"):
        path = audio["path"]
        if not re.search("/podcast/P0000/", path) and not re.search(
            "/youtube/P00[0-3][0-9]/", path
        ):
            continue
        cleaned = get_gigaspeech_cleaned_utterances(audio["segments"])
        out_path = os.path.join(processed_path, "gigaspeech", path.replace(".opus", ".txt"))
        _write_lines(out_path, cleaned)


def process_libriheavy(raw_path: str, processed_path: str) -> None:
    from tqdm import tqdm

    cuts = []
    for size in ["small", "medium"]:
        with open(
            os.path.join(raw_path, f"libriheavy_cuts_{size}.jsonl"), "r", encoding="utf-8"
        ) as f:
            cuts.extend(json.loads(line) for line in f)
    cuts.sort(key=lambda x: (x["recording"]["id"], x["start"]))
    cuts.append(None)  # flush sentinel
    lines: List[str] = []
    last_audio_path: Optional[str] = None
    for cut in tqdm(cuts, desc="LibriHeavy"):
        audio_path = "libri-light-" + cut["recording"]["id"] if cut is not None else None
        if audio_path != last_audio_path and last_audio_path is not None:
            _write_lines(os.path.join(processed_path, f"{last_audio_path}.txt"), lines)
            lines = []
        last_audio_path = audio_path
        if cut is None:
            continue
        dedup_libriheavy_lines(
            lines, get_libriheavy_cleaned_utterances(cut["supervisions"], cut["start"])
        )


def _write_lines(path: str, lines: List[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for line in lines:
            f.write(line + "\n")


SOURCES = {
    "talkbank": process_talkbank,
    "fisher": process_fisher,
    "gigaspeech": process_gigaspeech,
    "libriheavy": process_libriheavy,
}


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="Prepare transcripts for the LM dataset")
    parser.add_argument("--transcripts_path", type=str, required=True)
    parser.add_argument("--sources", nargs="+", default=list(SOURCES))
    args = parser.parse_args(argv)
    raw = os.path.join(args.transcripts_path, "raw")
    processed = os.path.join(args.transcripts_path, "processed")
    os.makedirs(processed, exist_ok=True)
    for source in args.sources:
        SOURCES[source](raw, processed)


if __name__ == "__main__":
    main()
