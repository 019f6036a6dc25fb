"""verify_codec_parity.py --dry: the CI-able structural parity mode.

VERDICT r3 item 6: the remaining real-checkpoint codec risk should be only
NUMERICS, not layout. Dry mode builds the genuine MagiCodec ``Generator``
(random init) from ``--magicodec_src``, feeds its REAL ``state_dict`` module
tree through the converter key map, and — when the module can forward on this
host — closes the token cross-check too (reference audio_tokenizer.py:189-201
defines the call surface; magicodec_build.sh the build).

Two tests:

1. ``test_dry_mode_pipeline_end_to_end`` — always runs: a fixture package
   laid out exactly like the MagiCodec public repo (``codec/generator.py``
   exposing ``Generator(sample_rate=..., token_hz=...)`` with
   encoder/quantizer/decoder + ``pad_audio`` + ``quantizer.inference``) is
   written to a tmp dir and the WHOLE dry pipeline (key-map coverage,
   framerate probe, margin audit, streaming equivalence, token cross-check
   against the torch forward) must pass against it via the real CLI.
2. ``test_dry_mode_against_genuine_magicodec`` — consumes the actual
   MagiCodec package when present (RTCA_MAGICODEC_SRC or importable
   ``codec.generator``), skips cleanly otherwise. On a host with the real
   repo this retires the published module-tree risk without weights.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

pytest.importorskip("torch")

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
_VERIFY = os.path.join(_REPO, "verify_codec_parity.py")

# geometry of the fixture module (mirrors tests/test_codec_torch_parity.py)
_H, _NH, _LAYERS, _HOP, _V, _RAW, _D = 32, 4, 2, 40, 64, 12, 8

_FIXTURE_GENERATOR = f"""
import math
import torch
import torch.nn as nn

H, NH, LAYERS, HOP, V, RAW, D = {_H}, {_NH}, {_LAYERS}, {_HOP}, {_V}, {_RAW}, {_D}


def _rope_cos_sin(t, dh, theta=10000.0):
    inv = 1.0 / (theta ** (torch.arange(0, dh, 2, dtype=torch.float32) / dh))
    freqs = torch.arange(t, dtype=torch.float32)[:, None] * inv
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def _rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat([-x[..., half:], x[..., :half]], dim=-1)


class _Mixer(nn.Module):
    def __init__(self):
        super().__init__()
        self.Wqkv = nn.Linear(H, 3 * H)
        self.out_proj = nn.Linear(H, H)

    def forward(self, x):
        b, t, _ = x.shape
        dh = H // NH
        q, k, v = self.Wqkv(x).split(H, dim=-1)
        q = q.view(b, t, NH, dh)
        k = k.view(b, t, NH, dh)
        v = v.view(b, t, NH, dh)
        cos, sin = _rope_cos_sin(t, dh)
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
        out = torch.einsum("bhqk,bkhd->bqhd", scores.softmax(-1), v)
        return self.out_proj(out.reshape(b, t, H))


class _Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(H, eps=1e-5)
        self.mixer = _Mixer()
        self.norm2 = nn.LayerNorm(H, eps=1e-5)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(H, 2 * H)
        self.mlp.fc2 = nn.Linear(2 * H, H)

    def forward(self, x):
        x = x + self.mixer(self.norm1(x))
        return x + self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class _Stack(nn.Module):
    def __init__(self, d_in, d_out, in_is_audio):
        super().__init__()
        if in_is_audio:
            self.patch_embed = nn.Linear(HOP, H)
        else:
            self.in_proj = nn.Linear(d_in, H)
        self.blocks = nn.ModuleList(_Block() for _ in range(LAYERS))
        self.norm_f = nn.LayerNorm(H, eps=1e-5)
        self.out_proj = nn.Linear(H, d_out)
        self._in_is_audio = in_is_audio

    def forward(self, x):
        if self._in_is_audio:
            b, t = x.shape
            x = self.patch_embed(x.view(b, t // HOP, HOP))
        else:
            x = self.in_proj(x)
        for blk in self.blocks:
            x = blk(x)
        out = self.out_proj(self.norm_f(x))
        if not self._in_is_audio:
            b, f, hop = out.shape
            out = out.reshape(b, f * hop)
        return out


class _Quantizer(nn.Module):
    def __init__(self):
        super().__init__()
        self.codebook = nn.Embedding(V, RAW)
        self.codebook_proj = nn.Linear(RAW, D)

    def inference(self, z_e):
        cb = self.codebook_proj(self.codebook.weight)
        d = (z_e[:, :, None, :] - cb[None, None]).pow(2).sum(-1)
        idx = d.argmin(-1)
        return nn.functional.embedding(idx, cb), idx


class Generator(nn.Module):
    def __init__(self, sample_rate=16000, token_hz=400, **kw):
        super().__init__()
        torch.manual_seed(7)
        self.sample_rate = sample_rate
        self.encoder = _Stack(HOP, D, in_is_audio=True)
        self.quantizer = _Quantizer()
        self.decoder = _Stack(D, HOP, in_is_audio=False)
        with torch.no_grad():
            self.quantizer.codebook.weight.mul_(3.0)

    def pad_audio(self, x):
        t = x.shape[-1]
        target = (t + HOP - 1) // HOP * HOP
        return nn.functional.pad(x, (0, target - t))
"""


def _write_fixture_pkg(tmp_path) -> str:
    pkg = os.path.join(str(tmp_path), "magicodec_fixture")
    os.makedirs(os.path.join(pkg, "codec"), exist_ok=True)
    with open(os.path.join(pkg, "codec", "__init__.py"), "w") as f:
        f.write("")
    with open(os.path.join(pkg, "codec", "generator.py"), "w") as f:
        f.write(textwrap.dedent(_FIXTURE_GENERATOR))
    return pkg


def _run_dry(src: str, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [
            sys.executable, _VERIFY, "--dry", "--cpu",
            "--magicodec_src", src,
            "--secs", "2.0",
        ] + extra,
        capture_output=True, text=True, timeout=600, env=env, cwd=_REPO,
    )


def test_dry_mode_pipeline_end_to_end(tmp_path):
    pkg = _write_fixture_pkg(tmp_path)
    proc = _run_dry(
        pkg,
        [
            "--hidden_size", str(_H), "--num_layers", str(_LAYERS),
            "--num_heads", str(_NH), "--hop_length", str(_HOP),
            "--expect_framerate", "400",
        ],
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = proc.stdout
    assert "stage 1 OK" in out       # key-map coverage over the module tree
    assert "stage 2 OK" in out       # framerate probe from the architecture
    assert "stage 4 OK" in out       # streaming == trailing-window encode
    # the fixture forwards on CPU, so the token cross-check must CLOSE, not skip
    assert "stage 5 OK: token-exact parity" in out, out
    tail = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    parsed = json.loads(tail)
    assert parsed["parity_harness"] == "passed"
    assert parsed["dry"] is True


def test_dry_mode_against_genuine_magicodec():
    src = os.environ.get("RTCA_MAGICODEC_SRC", "")
    probe_env = dict(os.environ)
    if src:
        probe_env["PYTHONPATH"] = src + os.pathsep + probe_env.get("PYTHONPATH", "")
    probe = subprocess.run(
        [sys.executable, "-c", "from codec.generator import Generator"],
        capture_output=True, text=True, env=probe_env,
    )
    if probe.returncode != 0:
        pytest.skip(
            "genuine MagiCodec package not importable here "
            "(set RTCA_MAGICODEC_SRC to its repo root to run)"
        )
    proc = _run_dry(src or ".", ["--expect_framerate", "50"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "stage 1 OK" in proc.stdout
