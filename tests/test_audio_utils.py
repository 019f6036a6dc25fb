"""Tests for host-side audio utilities (crossfade, pad/trim, RMS, prep)."""
import numpy as np

from realtime_codec_agent_tpu.utils.audio_utils import (
    create_crossfade_ramps,
    normalize_audio_rms,
    pad_or_trim,
    prep_audio,
    resample,
    smooth_join,
    to_mono,
)


def test_crossfade_ramps_equal_power_shape():
    L, fade_in, fade_out = create_crossfade_ramps(16000, 0.02)
    assert L == 320 and fade_in.shape == (320,) and fade_out.shape == (320,)
    assert fade_in[0] == 0.0
    np.testing.assert_allclose(fade_out, fade_in[::-1])


def test_smooth_join_overlaps_by_L():
    # output length = len1 + len2 - L: chunk2 carries L preroll samples so the
    # agent's joined chunk pair is exactly 2*chunk_size
    # (reference realtime_agent_v2.py:560-568)
    L, fi, fo = create_crossfade_ramps(16000, 0.02)
    a = np.ones(1600, dtype=np.float32)
    b = np.ones(1600 + L, dtype=np.float32) * 2
    joined = smooth_join(a, b, L, fi, fo)
    assert joined.shape[-1] == 3200
    # outside the crossfade region the chunks are untouched
    np.testing.assert_array_equal(joined[: 1600 - L], a[: 1600 - L])
    np.testing.assert_array_equal(joined[1600:], b[L:])


def test_smooth_join_empty_first():
    L, fi, fo = create_crossfade_ramps(16000, 0.02)
    b = np.ones(100, dtype=np.float32)
    assert smooth_join(np.zeros(0, dtype=np.float32), b, L, fi, fo) is b


def test_smooth_join_constant_signal_near_identity():
    # equal-power sine ramps on a constant signal: fade_in + fade_out != 1
    # exactly, but the join stays bounded and close
    L, fi, fo = create_crossfade_ramps(16000, 0.02)
    a = np.ones(640, dtype=np.float32)
    joined = smooth_join(a, a, L, fi, fo)
    cross = joined[640 - L : 640]
    assert cross.min() > 0.9 and cross.max() <= 1.5


def test_pad_or_trim():
    x = np.arange(5, dtype=np.float32)
    padded = pad_or_trim(x, 8)
    assert padded.shape == (8,) and padded[5] == 0
    left = pad_or_trim(x, 8, pad_side="left")
    assert left[0] == 0 and left[-1] == 4
    trimmed = pad_or_trim(x, 3)
    np.testing.assert_array_equal(trimmed, [0, 1, 2])
    assert pad_or_trim(x, 5) is x


def test_normalize_audio_rms():
    x = np.ones(100, dtype=np.float32) * 0.5
    y = normalize_audio_rms(x, target_rms=0.05)
    np.testing.assert_allclose(np.sqrt(np.mean(y**2)), 0.05, rtol=1e-5)
    silent = np.zeros(100, dtype=np.float32)
    assert normalize_audio_rms(silent) is silent


def test_prep_audio_int16_and_tuple():
    x = (np.ones(100) * 16384).astype(np.int16)
    y = prep_audio(x, 16000)
    assert y.dtype == np.float32
    np.testing.assert_allclose(y, 0.5)


def test_prep_audio_resample():
    sr_in = 8000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    y = prep_audio((sr_in, x), 16000)
    assert abs(y.shape[-1] - 16000) <= 1


def test_to_mono():
    stereo = np.stack([np.ones(10), np.zeros(10)])
    np.testing.assert_allclose(to_mono(stereo), 0.5)
    # (T, C) orientation heuristic
    np.testing.assert_allclose(to_mono(stereo.T), 0.5)


def test_resample_identity():
    x = np.ones(10, dtype=np.float32)
    assert resample(x, 16000, 16000) is x
