"""tools/ utilities + external-TTS demo pipeline (headless)."""
import json
import os
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from realtime_codec_agent_tpu.utils.audio_io import read_audio, write_wav


@pytest.fixture()
def wav_corpus(tmp_path):
    sr = 16000
    d = tmp_path / "raw" / "sub"
    d.mkdir(parents=True)
    for i, secs in enumerate((2.0, 3.0)):
        wav = 0.1 * np.sin(np.arange(int(secs * sr)) / 30.0).astype(np.float32)
        write_wav(str(d / f"f{i}.wav"), sr, wav)
    return str(tmp_path / "raw")


def test_total_duration(wav_corpus, capsys):
    from tools.total_duration import main

    total = main(["--audio_dir", wav_corpus])
    assert abs(total - 5.0) < 0.01
    assert "2 files" in capsys.readouterr().out


def test_total_duration_codes(tmp_path, capsys):
    from tools.total_duration_codes import main

    codes_dir = tmp_path / "codes"
    codes_dir.mkdir()
    np.save(codes_dir / "a_c0.npy", np.zeros((1, 250), np.int32))  # 5 s @ 50 Hz
    np.save(codes_dir / "b_c0.npy", np.zeros((1, 100), np.int32))  # 2 s
    with open(codes_dir / "codec_info.json", "w") as f:
        json.dump({"codec_framerate": 50.0, "num_codebooks": 1, "codebook_size": 16}, f)
    total = main(["--codes_path", str(codes_dir)])
    assert abs(total - 7.0) < 1e-6


def test_lm_dataset_stats(tmp_path, capsys):
    from tools.lm_dataset_stats import main

    path = tmp_path / "ds.txt"
    # 100 codec units between audio markers = 2 s at 50 Hz
    with open(path, "w") as f:
        f.write("<|audio|>" + chr(0xE000) * 100 + "<|end_audio|> hello\n")
        f.write("<|audio|>" + chr(0xE001) * 50 + "<|end_audio|>\n")
    lengths = main(
        ["--dataset_path", str(path), "--num_codebooks", "1", "--codec_framerate", "50"]
    )
    assert len(lengths) == 2
    assert abs(lengths[0] - 2.0) < 1e-6
    assert abs(lengths[1] - 1.0) < 1e-6


def test_cut_audio(tmp_path, monkeypatch):
    from tools.cut_audio import main

    sr = 16000
    src = tmp_path / "long.wav"
    write_wav(str(src), sr, 0.1 * np.ones(sr * 3, np.float32))
    monkeypatch.chdir(tmp_path)
    out = main(["--filename", str(src), "--keep_secs", "1.5"])
    sr2, audio = read_audio(out)
    assert sr2 == sr
    assert audio.shape[-1] == int(1.5 * sr)


def test_run_demo_external_tts_pipeline(tmp_path):
    """Headless external-TTS demo against the in-process server: enrollment +
    two lines of text -> one continuous crossfaded waveform."""
    from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
    from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
    from realtime_codec_agent_tpu.serving.tts_server import (
        SyntheticTTSEngine, TTSServer, make_http_server,
    )
    from run_demo_external_tts import tts_pipeline

    codec = JaxCodecModel.random_init(tiny_codec_config(), seed=0)
    server_at = AudioTokenizer(codec_model=codec)
    httpd = make_http_server(TTSServer(SyntheticTTSEngine(), server_at), "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        client_at = AudioTokenizer(codec_model=codec)
        sr = client_at.sampling_rate
        enrollment = (sr, 0.2 * np.sin(np.arange(sr) / 20.0).astype(np.float32))
        result = tts_pipeline(
            client_at,
            f"http://127.0.0.1:{httpd.server_address[1]}",
            enrollment,
            "test voice",
            "hello there.\nhow are you?",
        )
        assert result is not None
        out_sr, audio = result
        assert out_sr == sr
        assert audio.shape[-1] >= sr  # at least a second of audio came back
        assert np.isfinite(audio).all()
    finally:
        httpd.shutdown()


def test_enrollment_selector_minsec():
    from run_enrollment_selector import minsec_to_secs, select_audio

    assert minsec_to_secs(1.30) == pytest.approx(90.0)
    assert minsec_to_secs(0.05) == pytest.approx(5.0)
    with pytest.raises(ValueError):
        minsec_to_secs(1.75)

    sr = 100
    stereo = np.stack([np.arange(1000.0), -np.arange(1000.0)], axis=1)
    sel, c1, c2 = select_audio((sr, stereo), 0.01, 0.03)
    assert sel[1].shape == (200, 2)
    np.testing.assert_array_equal(c1[1], stereo[100:300, 0])


def test_bench_suite_orchestrator_groups(monkeypatch):
    """The full-suite orchestrator covers every section exactly once across
    subprocess groups, forwards knobs, and honors --skip."""
    import subprocess
    import sys as _sys

    import bench_suite

    calls = []

    def fake_run(cmd, **kwargs):
        calls.append(cmd)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(
        _sys, "argv",
        ["bench_suite.py", "--skip", "train", "--serving_batch", "4"],
    )
    with pytest.raises(SystemExit) as exc:
        bench_suite.main()
    assert exc.value.code == 0

    covered = []
    for cmd in calls:
        assert cmd[1].endswith("bench_suite.py") and "--inproc" in cmd
        skip = cmd[cmd.index("--skip") + 1 : cmd.index("--serving_batch")]
        wanted = [s for s in bench_suite.SECTIONS if s not in skip]
        covered.extend(wanted)
        assert cmd[cmd.index("--serving_batch") + 1] == "4"
        # every train knob the section reads must be forwarded — a missing
        # one silently benchmarks the DEFAULT config under the flag's label
        for knob in (
            "--serving_prefill", "--serving_context",
            "--train_seq_len", "--train_steps", "--train_batch",
            "--train_loss_block", "--train_remat_policy", "--train_optimizer",
        ):
            assert knob in cmd, f"group subprocess drops {knob}"
    assert sorted(covered) == sorted(s for s in bench_suite.SECTIONS if s != "train")
    assert len(covered) == len(set(covered))  # each section exactly once
