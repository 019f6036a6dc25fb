"""Unit tests for codes<->unicode conversion and interleaving.

Golden behavior from reference codec_bpe converter semantics as used in
audio_tokenizer.py:89-96, 116-127 and lm_dataset_builder.py:281-288.
"""
import numpy as np
import pytest

from realtime_codec_agent_tpu.units import (
    UNICODE_OFFSET_LARGE,
    audio_code_positions,
    chars_to_codes,
    codes_to_chars,
    deinterleave_channels,
    drop_hanging_channel_codes,
    interleave_channels,
    is_audio_code,
)


def test_codes_to_chars_roundtrip_1d():
    codes = np.array([0, 1, 5, 1023, 77])
    s = codes_to_chars(codes, 1024)
    assert len(s) == 5
    assert s[0] == chr(0xE000)
    assert s[3] == chr(0xE000 + 1023)
    back = chars_to_codes(s, 1, 1024)
    np.testing.assert_array_equal(back, codes[None, :])


def test_codes_to_chars_multi_codebook():
    codes = np.array([[0, 1], [2, 3]])  # (num_codebooks=2, T=2)
    s = codes_to_chars(codes, 1024)
    # frame-major flattening with per-codebook offset
    assert [ord(c) - 0xE000 for c in s] == [0, 1024 + 2, 1, 1024 + 3]
    back = chars_to_codes(s, 2, 1024)
    np.testing.assert_array_equal(back, codes)


def test_custom_offset():
    codes = np.array([3])
    s = codes_to_chars(codes, 16, unicode_offset=0x4E00)
    assert ord(s) == 0x4E00 + 3
    back = chars_to_codes(s, 1, 16, unicode_offset=0x4E00)
    assert back[0, 0] == 3


def test_interleave_deinterleave():
    a = "".join(chr(0xE000 + i) for i in range(5))
    b = "".join(chr(0xE100 + i) for i in range(5))
    inter = interleave_channels([a, b])
    assert inter[0] == a[0] and inter[1] == b[0] and inter[2] == a[1]
    chans = deinterleave_channels(inter, 2)
    assert chans == [a, b]


def test_interleave_single_channel_identity():
    a = "".join(chr(0xE000 + i) for i in range(7))
    assert interleave_channels([a]) == a


def test_drop_hanging_channel_codes_matches_reference_quirk():
    # reference audio_tokenizer.py:161-168 computes end_hanging AFTER trimming
    s = "abcde"
    trimmed, hanging = drop_hanging_channel_codes(s, 2)
    assert trimmed == "abcd"
    assert hanging == "d"  # reference quirk: tail of the *trimmed* string
    trimmed2, hanging2 = drop_hanging_channel_codes("abcd", 2)
    assert trimmed2 == "abcd" and hanging2 == ""


def test_is_audio_code_and_positions():
    s = "A" + chr(0xE005) + "B" + chr(0xE006)
    assert not is_audio_code("A")
    assert is_audio_code(chr(0xE005))
    idx, audio = audio_code_positions(s)
    np.testing.assert_array_equal(idx, [1, 3])
    assert audio == chr(0xE005) + chr(0xE006)


def test_large_vocab_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 131072, size=1000)
    s = codes_to_chars(codes, 131072)
    back = chars_to_codes(s, 1, 131072)
    np.testing.assert_array_equal(back[0], codes)


def test_top_k_exact_matches_lax():
    import jax
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.ops.sampling import top_k_exact

    rng = np.random.default_rng(0)
    for v, k in ((256 * 128, 100), (256 * 128, 1), (259584, 40), (1000, 5)):
        x = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
        v1, i1 = top_k_exact(x, k)
        v2, i2 = jax.lax.top_k(x, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
