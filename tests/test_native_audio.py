"""Native C++ streaming resampler (native/rtca_audio.cpp) + numpy fallback.

The contract: chunked streaming output equals one-shot output exactly (the
stateless-per-chunk approach the reference's clients inherit from librosa has
a filter restart at every 100 ms chunk seam), the native core and the numpy
fallback agree to float precision, and both track scipy's resample_poly.
"""
import numpy as np
import pytest

from realtime_codec_agent_tpu.utils import native_audio as na
from realtime_codec_agent_tpu.utils.audio_utils import resample


def signal(secs=1.0, sr=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=t.shape)).astype(
        np.float32
    )


@pytest.mark.parametrize("rates", [(48000, 16000), (16000, 48000), (44100, 16000)])
def test_chunked_equals_oneshot(rates):
    sr_in, sr_out = rates
    sig = signal(sr=sr_in)
    r = na.StreamingResampler(sr_in, sr_out)
    chunk = sr_in // 10
    chunked = np.concatenate(
        [r.process(sig[i : i + chunk]) for i in range(0, len(sig), chunk)] + [r.flush()]
    )
    oneshot = na.resample_streaming_oneshot(sig, sr_in, sr_out)
    n = min(len(chunked), len(oneshot))
    np.testing.assert_allclose(chunked[:n], oneshot[:n], atol=1e-7)
    assert len(oneshot) == -(-len(sig) * r.up // r.down)


def test_matches_scipy_resample_poly():
    scipy_signal = pytest.importorskip("scipy.signal")
    sig = signal()
    ours = na.resample_streaming_oneshot(sig, 48000, 16000)
    ref = scipy_signal.resample_poly(sig, 1, 3).astype(np.float32)
    m = min(len(ours), len(ref))
    # same filter family (Kaiser-sinc, beta 5, 10*max_rate half-length); tiny
    # design differences vs firwin only
    np.testing.assert_allclose(ours[200 : m - 200], ref[200 : m - 200], atol=2e-3)


def test_native_and_fallback_agree():
    if not na.native_available():
        pytest.skip("native extension not built")
    sig = signal(secs=0.5)
    r_native = na.StreamingResampler(48000, 16000)
    out_native = np.concatenate([r_native.process(sig), r_native.flush()])

    saved, na._NATIVE = na._NATIVE, None
    try:
        r_py = na.StreamingResampler(48000, 16000)
        out_py = np.concatenate([r_py.process(sig), r_py.flush()])
    finally:
        na._NATIVE = saved
    n = min(len(out_native), len(out_py))
    np.testing.assert_allclose(out_native[:n], out_py[:n], atol=1e-6)


def test_audio_utils_resample_dispatch():
    sig = signal(secs=0.2)
    out = resample(sig, 48000, 16000)
    assert out.shape[-1] == pytest.approx(len(sig) / 3, abs=2)
    stereo = np.stack([sig, -sig])
    out2 = resample(stereo, 48000, 16000)
    assert out2.shape[0] == 2
    np.testing.assert_allclose(out2[0], -out2[1], atol=1e-6)


def test_fastrtc_handler_streaming_resample():
    """The live client's mic path: 48 kHz frames resample statefully to the
    codec rate and chunk at exactly 1600 samples."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from inference_client_fastrtc_v2 import AgentHandler

    class FakeAgentProc:
        def __init__(self):
            self.inputs = []

        def get_info(self):
            class I:
                sampling_rate = 16000
                chunk_size_samples = 1600
            return I()

        def queue_input(self, item):
            self.inputs.append(item)

    fake = FakeAgentProc()
    h = AgentHandler(fake)
    sr = 48000
    t = np.arange(sr) / sr  # 1 s of mic audio in 20 ms frames
    mic = (8000 * np.sin(2 * np.pi * 300 * t)).astype(np.int16)
    frame = sr // 50
    for i in range(50):
        h.receive((sr, mic[i * frame : (i + 1) * frame]))
    # 1 s at 16 kHz = 10 chunks of 1600 (minus filter delay, at least 9)
    assert len(fake.inputs) >= 9
    for in_sr, chunk in fake.inputs:
        assert in_sr == 16000
        assert chunk.shape == (1600,)
        assert chunk.dtype == np.float32
    # the resampled audio still carries the 300 Hz tone (not noise/zeros)
    joined = np.concatenate([c for _, c in fake.inputs])
    assert np.abs(joined).max() > 0.1
    spec = np.abs(np.fft.rfft(joined))
    peak_hz = np.argmax(spec) * 16000 / len(joined)
    assert 280 < peak_hz < 320
