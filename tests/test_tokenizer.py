"""Tests for the self-contained duplex tokenizer (vocab layout + mixed encode/decode)."""
import numpy as np

from realtime_codec_agent_tpu.tokenization import ByteTextTokenizer, CodecTextTokenizer
from realtime_codec_agent_tpu.units.special_tokens import (
    END_AUDIO,
    END_HEADER,
    HEADER_AGENT,
    HEADER_AGENT_VOICE,
    HEADER_SPEAKER,
    SPECIAL_TOKENS,
    START_AUDIO,
)


def make_tok(codebook_size=1024):
    return CodecTextTokenizer(codebook_size=codebook_size)


def test_vocab_layout_end_header_below_codec():
    tok = make_tok()
    end_header_id = tok.convert_tokens_to_ids(END_HEADER)
    # every special except end_header is below it
    for sp in SPECIAL_TOKENS[:-1]:
        assert tok.convert_tokens_to_ids(sp) < end_header_id
    # all codec ids are above end_header (agent audio-mode invariant,
    # reference realtime_agent_v2.py:345, 361)
    assert tok.codec_vocab_start == end_header_id + 1
    assert tok.vocab_size == tok.codec_vocab_start + 1024


def test_codec_char_encode_maps_to_codec_vocab_start():
    tok = make_tok()
    # train_vanilla_latest.py:556-561 semantics
    assert tok.convert_tokens_to_ids(chr(tok.unicode_offset)) == tok.codec_vocab_start
    ids = tok.encode(chr(tok.unicode_offset + 5), add_special_tokens=False)
    assert ids == [tok.codec_vocab_start + 5]


def test_mixed_encode_decode_roundtrip():
    tok = make_tok()
    codes = "".join(chr(0xE000 + i) for i in [1, 2, 3])
    text = f"{HEADER_AGENT}{HEADER_SPEAKER} A{HEADER_SPEAKER} B{HEADER_AGENT_VOICE}{codes}{END_HEADER} A: hello{START_AUDIO}{codes}{END_AUDIO}"
    ids = tok.encode(text, add_special_tokens=False)
    assert tok.decode(ids) == text


def test_speaker_tokens_single_id():
    tok = make_tok()
    a_ids = tok.encode(" A", add_special_tokens=False)
    b_ids = tok.encode(" B", add_special_tokens=False)
    assert len(a_ids) == 1 and len(b_ids) == 1 and a_ids != b_ids


def test_bos_prepended_by_default():
    tok = make_tok()
    ids = tok.encode("hi")
    assert ids[0] == tok.bos_token_id
    assert tok.encode("hi", add_special_tokens=False) == ids[1:]


def test_skip_special_tokens_decode():
    tok = make_tok()
    ids = tok.encode(f"{START_AUDIO} yes{END_AUDIO}", add_special_tokens=False)
    assert tok.decode(ids, skip_special_tokens=True) == " yes"
    assert tok.decode(ids) == f"{START_AUDIO} yes{END_AUDIO}"


def test_unicode_text_roundtrip():
    tok = make_tok()
    text = " héllo † wörld"
    ids = tok.encode(text, add_special_tokens=False)
    assert tok.decode(ids) == text


def test_save_load_roundtrip(tmp_path):
    tok = make_tok()
    tok.save(str(tmp_path))
    tok2 = CodecTextTokenizer.load(str(tmp_path))
    text = f"{HEADER_AGENT} A: hi{START_AUDIO}" + chr(0xE000 + 7)
    assert tok2.encode(text) == tok.encode(text)
    assert tok2.codec_vocab_start == tok.codec_vocab_start


def test_byte_tokenizer_atomic_tokens():
    bt = ByteTextTokenizer()
    ids = bt.encode(" A: hello")
    assert ids[0] == bt._atomic_to_id[" A"]
    assert bt.decode(ids) == " A: hello"
