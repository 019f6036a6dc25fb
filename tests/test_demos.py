"""Smoke-run the offline vLLM-style demos (reference run_demo*.py) in-process
with tiny models: free-form continuation, streaming ASR probing, and
line-by-line TTS all exercise the completion backend + AudioTokenizer the way
the reference drives its persisted model through vLLM."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from realtime_codec_agent_tpu.utils.audio_io import read_audio, write_wav


def test_run_demo_continuation(tmp_path, monkeypatch):
    import run_demo

    out = str(tmp_path / "demo.wav")
    monkeypatch.chdir(tmp_path)
    run_demo.main(
        ["--in_process", "--tiny", "--seconds", "0.5", "--output", out,
         "--text_prompt", " A: hi"]
    )
    sr, audio = read_audio(out)
    assert sr == 16000
    assert audio.shape[-1] >= int(0.4 * sr)


def test_run_demo_asr(tmp_path, capsys):
    import run_demo_asr

    sr = 16000
    wav = str(tmp_path / "in.wav")
    write_wav(wav, sr, (0.2 * np.sin(np.arange(sr) / 25.0)).astype(np.float32))
    run_demo_asr.main(["--in_process", "--tiny", "--audio_file", wav])
    outp = capsys.readouterr().out
    # the demo prints the decoded sequence (audio markers + any transcription)
    assert "<|audio|>" in outp


def test_run_demo_tts(tmp_path):
    import run_demo_tts

    out = str(tmp_path / "tts.wav")
    run_demo_tts.main(
        ["--in_process", "--tiny", "--transcript", "A: hello\nB: hi there",
         "--output", out]
    )
    sr, audio = read_audio(out)
    assert sr == 16000
    assert audio.shape[-1] > 0
