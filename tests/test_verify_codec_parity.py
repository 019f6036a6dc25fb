"""The verify_codec_parity harness runs end-to-end on a real-layout fixture.

Guards the deliverable itself: given a torch checkpoint in the flash-attn
MagiCodec layout, the harness must pass coverage/framerate/margin/streaming
stages and exit 0 (VERDICT r1 item 3's "runnable the moment weights are
present" requirement).
"""
import json
import os
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

_ENV = dict(os.environ, JAX_PLATFORMS="cpu")  # no TPU dependency in the test


def test_harness_passes_on_fixture_checkpoint(tmp_path):
    sys.path.insert(0, "tests")
    from test_codec_torch_parity import _TorchMagiCodecLike

    torch.manual_seed(7)
    m = _TorchMagiCodecLike().eval()
    with torch.no_grad():
        m.quantizer.codebook.weight.mul_(3.0)
    ckpt = tmp_path / "fixture_magicodec.ckpt"
    torch.save(m.state_dict(), ckpt)

    out = subprocess.run(
        [
            sys.executable, "verify_codec_parity.py",
            "--checkpoint", str(ckpt),
            "--hidden_size", "32", "--num_layers", "2", "--num_heads", "4",
            "--hop_length", "40", "--secs", "1",
            "--expect_framerate", "400.0",
            "--tokens_out", str(tmp_path / "tokens.npy"),
        ],
        capture_output=True, text=True, timeout=1200, env=_ENV,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "stage 1 OK" in out.stdout
    assert "stage 4 OK" in out.stdout
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    assert json.loads(last)["parity_harness"] == "passed"
    assert (tmp_path / "tokens.npy").exists()


def test_harness_fails_loudly_on_unknown_layout(tmp_path):
    """A checkpoint whose keys the map does not cover must FAIL, not silently
    convert a subset."""
    ckpt = tmp_path / "bogus.ckpt"
    torch.save({"mystery.block.weight": torch.zeros(4, 4)}, ckpt)
    out = subprocess.run(
        [sys.executable, "verify_codec_parity.py", "--checkpoint", str(ckpt)],
        capture_output=True, text=True, timeout=600, env=_ENV,
    )
    assert out.returncode != 0
