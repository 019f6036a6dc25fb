"""Tests for the offline data pipeline: transcripts, dataset builder, splits,
transcript cleaning (reference lm_dataset_builder.py / transcript_utils.py /
prep_transcripts.py / tools/split_lm_dataset.py behaviors)."""
import json
import os

import numpy as np
import pytest

from realtime_codec_agent_tpu.data.lm_dataset_builder import (
    InterleaveOrder,
    LMDatasetBuilder,
)
from realtime_codec_agent_tpu.data.prep_transcripts import (
    clean_line,
    dedup_libriheavy_lines,
    get_fisher_cleaned_utterances,
    lookup_fisher_partition,
)
from realtime_codec_agent_tpu.data.split_lm_dataset import (
    compute_file_splits,
    load_file_splits,
    save_file_splits,
    split_dataset,
)
from realtime_codec_agent_tpu.data.transcript_utils import (
    is_speaker_channel_isolated,
    load_transcript,
    set_agent_speaker,
)
from realtime_codec_agent_tpu.units.codes import chars_to_codes, codes_to_chars

FR = 50.0  # codec framerate
CB = 1024


def make_builder(**kw):
    kw.setdefault("num_codebooks", 1)
    kw.setdefault("codebook_size", CB)
    kw.setdefault("codec_framerate", FR)
    kw.setdefault("unicode_offset", 0xE000)
    return LMDatasetBuilder(**kw)


# -- transcript utils --------------------------------------------------------

def write_transcript(tmp_path, name, lines, channel_map=None):
    path = os.path.join(tmp_path, f"{name}.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    if channel_map is not None:
        with open(path.replace(".txt", "_channel_map.json"), "w") as f:
            json.dump(channel_map, f)
    return path


def test_load_transcript_remaps_speakers(tmp_path):
    path = write_transcript(
        tmp_path,
        "t1",
        ["0.0 1.0 X: hello", "1.0 2.0 Z: world", "2.0 3.0 X: again"],
    )
    lines, speakers, cmap = load_transcript(path)
    assert speakers == ["A", "B"]
    assert lines[0] == (0.0, 1.0, "A", "hello")
    assert lines[1][2] == "B"


def test_load_transcript_filters_minor_speakers(tmp_path):
    path = write_transcript(
        tmp_path,
        "t2",
        ["0.0 10.0 X: main speaker", "10.0 10.1 Y: blip", "10.2 20.0 X: more"],
    )
    lines, speakers, _ = load_transcript(path, speaker_proportion_threshold=0.1)
    assert speakers == ["A"]
    assert all(l[2] == "A" for l in lines)


def test_load_transcript_sorts_by_time(tmp_path):
    path = write_transcript(
        tmp_path, "t3", ["5.0 6.0 X: later", "0.0 1.0 X: earlier"]
    )
    lines, _, _ = load_transcript(path)
    assert lines[0][3] == "earlier"


def test_channel_map_remap_and_isolation(tmp_path):
    cmap = {"X": {"channel": 1}, "Z": {"channel": 0}}
    path = write_transcript(
        tmp_path, "t4", ["0.0 1.0 X: a", "1.0 2.0 Z: b"], channel_map=cmap
    )
    _, speakers, out_map = load_transcript(path)
    assert out_map == {"A": {"channel": 1}, "B": {"channel": 0}}
    assert is_speaker_channel_isolated(out_map, "A")
    out_map["C"] = {"channel": 1}
    assert not is_speaker_channel_isolated(out_map, "A")


def test_set_agent_speaker_swaps():
    lines = [(0.0, 1.0, "A", "a"), (1.0, 2.0, "B", "b")]
    cmap = {"A": {"channel": 0}, "B": {"channel": 1}}
    swapped, smap = set_agent_speaker(lines, ["A", "B"], cmap, "B")
    assert swapped[0][2] == "B" and swapped[1][2] == "A"
    assert smap["A"]["channel"] == 1
    same, _ = set_agent_speaker(lines, ["A", "B"], cmap, "A")
    assert same == lines


# -- dataset builder ---------------------------------------------------------

def _codes_str(codes):
    return codes_to_chars(np.asarray(codes), CB, unicode_offset=0xE000)


def test_build_codes_str_audio_only():
    b = make_builder()
    chars = _codes_str(np.arange(100))  # 2 s of audio
    s = b._build_codes_str([chars], [(None, None, None, None)], {}, InterleaveOrder.AUDIO_ONLY)
    assert s == f"<|audio|>{chars}<|end_audio|>"


def test_build_codes_str_text_first_vs_audio_first():
    b = make_builder()
    chars = _codes_str(np.arange(100))
    lines = [(0.4, 1.0, "A", "hi"), (None, None, None, None)]
    tf = b._build_codes_str([chars], lines, {}, InterleaveOrder.TEXT_FIRST)
    af = b._build_codes_str([chars], lines, {}, InterleaveOrder.AUDIO_FIRST)
    # text_first splices at utterance start (0.4 s -> 20 codes), audio_first at
    # end (1.0 s -> 50 codes)
    assert tf.index(" A: hi") < af.index(" A: hi")
    assert tf == f"<|audio|>{chars[:20]}<|end_audio|> A: hi<|audio|>{chars[20:]}<|end_audio|>"
    assert af == f"<|audio|>{chars[:50]}<|end_audio|> A: hi<|audio|>{chars[50:]}<|end_audio|>"


def test_build_codes_str_same_speaker_no_restate():
    b = make_builder()
    chars = _codes_str(np.arange(100))
    lines = [(0.0, 0.2, "A", "one"), (0.0, 0.3, "A", "two"), (None, None, None, None)]
    s = b._build_codes_str([chars], lines, {}, InterleaveOrder.TEXT_FIRST)
    # consecutive same-speaker text with no audio between: speaker stated once
    assert " A: one two" in s


def test_merge_preserves_audio_and_text_order():
    b = make_builder()
    chars = _codes_str(np.arange(100))
    other_lines = [(0.4, 1.0, "B", "question"), (None, None, None, None)]
    agent_lines = [(1.0, 1.5, "A", "answer"), (None, None, None, None)]
    other = b._build_codes_str([chars], other_lines, {}, InterleaveOrder.AUDIO_FIRST)
    agent = b._build_codes_str([chars], agent_lines, {}, InterleaveOrder.TEXT_FIRST)
    merged = b._merge_codes_strs(other, agent)
    from realtime_codec_agent_tpu.units.codes import audio_code_positions

    _, merged_audio = audio_code_positions(merged, 0xE000)
    assert merged_audio == chars
    # both texts appear at position 50 (1.0 s); audio-first text comes first
    assert merged.index(" B: question") < merged.index(" A: answer")


def test_merge_rejects_mismatched_audio():
    b = make_builder()
    s1 = "<|audio|>" + _codes_str([1, 2, 3]) + "<|end_audio|>"
    s2 = "<|audio|>" + _codes_str([1, 2, 4]) + "<|end_audio|>"
    with pytest.raises(ValueError):
        b._merge_codes_strs(s1, s2)


def _write_codes_corpus(tmp_path, codes_by_channel, name="rec1"):
    codes_dir = os.path.join(tmp_path, "codes")
    trans_dir = os.path.join(tmp_path, "transcripts")
    os.makedirs(codes_dir, exist_ok=True)
    os.makedirs(trans_dir, exist_ok=True)
    for ch, codes in enumerate(codes_by_channel):
        np.save(os.path.join(codes_dir, f"{name}_c{ch}.npy"), np.asarray(codes)[None, :])
    return codes_dir, trans_dir


def test_iterate_examples_audio_only(tmp_path):
    codes_dir, trans_dir = _write_codes_corpus(str(tmp_path), [np.arange(500) % CB])
    b = make_builder(interleave_order=InterleaveOrder.AUDIO_ONLY, context_secs=4.0, overlap_secs=1.0)
    examples = list(b.iterate_examples(codes_dir, trans_dir, show_progress=False))
    # 10 s of audio -> 4 s windows stepping 3 s: [0,4), [3,7), [6,10)
    assert len(examples) == 3
    text, meta = examples[0]
    assert text.startswith("<|audio_only|><|end_header|><|audio|>")
    assert meta["interleave_order"] == "audio_only"
    assert meta["example_index"] == 0
    assert examples[1][1]["example_index"] == 1
    # window boundaries align to audio codes: 4 s = 200 codes
    body = examples[0][0].split("<|audio|>")[1].replace("<|end_audio|>", "")
    assert len(body) == 200


def test_iterate_examples_agent_variant(tmp_path):
    codes = np.arange(500) % CB
    codes_dir, trans_dir = _write_codes_corpus(str(tmp_path), [codes])
    with open(os.path.join(trans_dir, "rec1.txt"), "w") as f:
        f.write("0.0 2.0 X: hello there\n3.0 5.0 Y: hi friend\n6.0 8.0 X: how are you\n")
    b = make_builder(context_secs=10.0, overlap_secs=2.0)
    examples = list(b.iterate_examples(codes_dir, trans_dir, show_progress=False))
    orders = {m["interleave_order"] for _, m in examples}
    assert orders == {"audio_only", "text_only", "audio_first", "text_first", "agent"}
    agent_examples = [(t, m) for t, m in examples if m["interleave_order"] == "agent"]
    # both speakers take a turn as agent
    assert {m["agent_speaker"] for _, m in agent_examples} == {"A", "B"}
    for text, meta in agent_examples:
        assert text.startswith("<|agent|><|speaker|> A<|speaker|> B")
        assert "<|end_header|>" in text


def test_agent_voice_enrollment_in_header(tmp_path):
    codes = np.arange(3000) % CB  # 60 s
    codes_dir, trans_dir = _write_codes_corpus(str(tmp_path), [codes])
    # agent speech (4 s, clean) far outside a 10 s window
    with open(os.path.join(trans_dir, "rec1.txt"), "w") as f:
        f.write("0.0 2.0 X: in window speech here\n")
        f.write("2.0 4.0 Y: other speaker text\n")
        f.write("40.0 44.0 X: clean enrollment sample speech\n")
        f.write("50.0 54.0 Y: other clean speech sample\n")
    b = make_builder(
        interleave_order=InterleaveOrder.AGENT, context_secs=10.0, overlap_secs=2.0
    )
    examples = list(b.iterate_examples(codes_dir, trans_dir, show_progress=False))
    with_voice = [t for t, m in examples if "<|agent_voice|>" in t]
    assert with_voice, "expected at least one example with voice enrollment"
    # enrollment chars are audio codes
    seg = with_voice[0].split("<|agent_voice|>")[1].split("<|end_header|>")[0]
    assert all(ord(c) >= 0xE000 for c in seg)


def test_text_only_windowing():
    b = make_builder(text_only_context_words=10, text_only_overlap_words=4)
    words = " ".join(f"A: w{i}" for i in range(20))  # 'A:' every other word
    meta = {"file_id": "x", "interleave_order": "text_only", "agent_speaker": None, "example_index": 0}
    examples = list(b._window_text_only(words, ["A"], meta))
    assert len(examples) >= 2
    # text_only headers include the speaker list (reference lm_dataset_builder.py:353-354)
    assert examples[0][0].startswith("<|text_only|><|speaker|> A<|end_header|> ")
    # overlap windows start at a speaker turn
    body = examples[1][0].split("<|end_header|> ")[1]
    assert body.startswith("A:")


# -- splits ------------------------------------------------------------------

def test_compute_and_apply_splits(tmp_path):
    dataset = os.path.join(str(tmp_path), "ds.txt")
    meta_path = dataset.replace(".txt", "_metadata.jsonl")
    with open(dataset, "w") as f, open(meta_path, "w") as m:
        for corpus in ("fisher", "giga"):
            for fid in range(30):
                for ex in range(2):
                    f.write(f"example-{corpus}-{fid}-{ex}\n")
                    m.write(
                        json.dumps(
                            {
                                "file_id": f"{corpus}/f{fid}",
                                "interleave_order": "audio_only",
                                "agent_speaker": None,
                                "example_index": ex,
                            }
                        )
                        + "\n"
                    )
    splits = compute_file_splits(meta_path, 0.8, 0.1, 0.1, seed=0)
    assert len(splits) == 60
    for corpus in ("fisher", "giga"):
        vals = [v for k, v in splits.items() if k.startswith(corpus)]
        assert vals.count("train") == 24 and vals.count("dev") == 3 and vals.count("test") == 3

    csv_path = os.path.join(str(tmp_path), "splits.csv")
    save_file_splits(splits, csv_path)
    assert load_file_splits(csv_path) == splits

    train, dev, test = split_dataset(dataset, splits)
    n_train = sum(1 for _ in open(train))
    n_dev = sum(1 for _ in open(dev))
    n_test = sum(1 for _ in open(test))
    assert n_train + n_dev + n_test == 120
    # all examples of one file_id land in the same split
    assert n_train == 96


# -- transcript cleaning -----------------------------------------------------

def test_clean_line_punctuation_and_noise():
    assert clean_line("hello<comma> world<period>") == "hello, world."
    assert clean_line("so <noise> yes") == "so [noise] yes"
    assert clean_line("wow [!]") == "wow!"
    assert clean_line("u_s_a") == "u.s.a"
    assert clean_line("((maybe this))") == "maybe this"
    assert clean_line("too  many   spaces") == "too many spaces"
    assert clean_line("word [laughs] more", remove_bracketed=True) == "word more"
    assert clean_line("keep [% comment] this", remove_bracketed=True) == "keep [% comment] this"


def test_fisher_utterances(tmp_path):
    path = os.path.join(str(tmp_path), "f.txt")
    with open(path, "w") as f:
        f.write("# header\n\n0.00 1.50 A: hello there\n1.50 3.00 B: (( hi ))\n")
    utts = get_fisher_cleaned_utterances(path)
    assert utts == ["0.00 1.50 A: hello there", "1.50 3.00 B: hi"]


def test_fisher_partition_lookup():
    assert lookup_fisher_partition("fe_03_p1_tran", "000") == "fisher_eng_tr_sp_d1"
    assert lookup_fisher_partition("fe_03_p1_tran", "45") == "fisher_eng_tr_sp_d6"
    assert lookup_fisher_partition("fe_03_p2_tran", "100") == "fe_03_p2_sph6"
    with pytest.raises(ValueError):
        lookup_fisher_partition("fe_03_p1_tran", "99")


def test_libriheavy_dedup():
    lines = []
    dedup_libriheavy_lines(lines, ["0.00 2.00 A: hello"])
    dedup_libriheavy_lines(lines, ["0.00 3.00 A: hello world"])  # longer rewrite
    assert lines == ["0.00 3.00 A: hello world"]
    dedup_libriheavy_lines(lines, ["1.00 3.00 A: world"])  # shorter duplicate
    assert len(lines) == 1
    dedup_libriheavy_lines(lines, ["2.50 4.00 A: overlap"])  # overlapping start
    assert len(lines) == 1
    dedup_libriheavy_lines(lines, ["3.00 4.00 B: next"])
    assert len(lines) == 2
