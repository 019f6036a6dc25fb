"""run_real.py bring-up harness smoke over fabricated real-format assets.

VERDICT r2 item 8: the day real weights exist there must be ZERO integration
work left. This fabricates the three asset kinds in their real on-disk formats
— a torch MagiCodec-layout checkpoint, a genuine HF fast-tokenizer directory,
and a llama-arch GGUF — and runs run_real.py end-to-end: codec parity harness,
tokenizer invariants, GGUF load, live duplex session, pass/fail manifest.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

_ENV = dict(os.environ, JAX_PLATFORMS="cpu")
# the suite's 8-virtual-device XLA_FLAGS slow every subprocess compile; the
# bring-up harness is a single-device path
_ENV.pop("XLA_FLAGS", None)


def _fabricate_codec_ckpt(path):
    sys.path.insert(0, "tests")
    from test_codec_torch_parity import _TorchMagiCodecLike

    torch.manual_seed(7)
    m = _TorchMagiCodecLike().eval()
    with torch.no_grad():
        m.quantizer.codebook.weight.mul_(3.0)
    torch.save(m.state_dict(), path)
    return m.codebook_size


def _fabricate_tokenizer_dir(path):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    merges = []
    for letter in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        vocab[f"Ġ{letter}"] = len(vocab)
        merges.append(("Ġ", letter))
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|begin_of_text|>",
        eos_token="<|end_of_text|>",
    )
    fast.add_special_tokens(
        {"additional_special_tokens": ["<|finetune_right_pad_id|>"]}
    )
    fast.save_pretrained(str(path))
    return len(fast)


def _fabricate_gguf(path, vocab):
    from test_gguf import write_gguf

    h, layers, heads, kv, dh, ffn = 16, 2, 4, 2, 4, 32
    rng = np.random.default_rng(3)
    t = {
        "token_embd.weight": rng.normal(size=(vocab, h)).astype(np.float32) * 0.05,
        "output_norm.weight": np.ones(h, np.float32),
        "output.weight": rng.normal(size=(vocab, h)).astype(np.float32) * 0.05,
    }
    for i in range(layers):
        t[f"blk.{i}.attn_norm.weight"] = np.ones(h, np.float32)
        t[f"blk.{i}.attn_q.weight"] = rng.normal(size=(heads * dh, h)).astype(np.float32) * 0.1
        t[f"blk.{i}.attn_k.weight"] = rng.normal(size=(kv * dh, h)).astype(np.float32) * 0.1
        t[f"blk.{i}.attn_v.weight"] = rng.normal(size=(kv * dh, h)).astype(np.float32) * 0.1
        t[f"blk.{i}.attn_output.weight"] = rng.normal(size=(h, heads * dh)).astype(np.float32) * 0.1
        t[f"blk.{i}.ffn_norm.weight"] = np.ones(h, np.float32)
        t[f"blk.{i}.ffn_gate.weight"] = rng.normal(size=(ffn, h)).astype(np.float32) * 0.1
        t[f"blk.{i}.ffn_up.weight"] = rng.normal(size=(ffn, h)).astype(np.float32) * 0.1
        t[f"blk.{i}.ffn_down.weight"] = rng.normal(size=(h, ffn)).astype(np.float32) * 0.1
    meta = {
        "general.architecture": "llama",
        "general.alignment": 32,
        "llama.embedding_length": h,
        "llama.block_count": layers,
        "llama.attention.head_count": heads,
        "llama.attention.head_count_kv": kv,
        "llama.feed_forward_length": ffn,
        "llama.rope.dimension_count": dh,
        "llama.rope.freq_base": 500000.0,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "llama.vocab_size": vocab,
    }
    write_gguf(path, meta, t, {})


def test_run_real_passes_on_fabricated_assets(tmp_path):
    sys.path.insert(0, "tests")
    from realtime_codec_agent_tpu.units.special_tokens import SPECIAL_TOKENS

    codebook_size = _fabricate_codec_ckpt(tmp_path / "magicodec.ckpt")
    text_vocab = _fabricate_tokenizer_dir(tmp_path / "tokenizer")
    vocab = text_vocab + len(SPECIAL_TOKENS) + codebook_size
    _fabricate_gguf(tmp_path / "model.gguf", vocab)

    out = subprocess.run(
        [
            sys.executable, "run_real.py",
            "--gguf", str(tmp_path / "model.gguf"),
            "--tokenizer_dir", str(tmp_path / "tokenizer"),
            "--magicodec_ckpt", str(tmp_path / "magicodec.ckpt"),
            # the codec-parity subprocess stage is exercised end-to-end by
            # tests/test_verify_codec_parity.py; skipping it here saves ~5
            # CPU-minutes (the codec still loads for the live session below)
            "--skip_codec_parity",
            # --smoke: random weights make the full event config generate
            # unbounded inline text; the 400 Hz fixture codec also needs a
            # small cache to compile quickly on CPU
            "--secs", "1", "--n_ctx", "4096", "--smoke",
            # fixture codec geometry (tests/test_codec_torch_parity.py)
            "--hidden_size", "32", "--num_layers", "2", "--num_heads", "4",
            "--hop_length", "40", "--codec_framerate", "400.0",
        ],
        capture_output=True, text=True, timeout=1500, env=_ENV,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    manifest = json.loads(last)
    assert manifest["run_real"] == "passed"
    stages = manifest["stages"]
    assert stages["codec-parity"]["status"] == "SKIP"
    assert stages["tokenizer"]["status"] == "OK"
    assert stages["lm-load"]["status"] == "OK"
    assert stages["asr"]["status"] == "SKIP"
    assert stages["live-session"]["status"] == "OK"


def test_run_real_fails_loudly_on_bad_lm(tmp_path):
    """A missing LM checkpoint must produce a FAIL manifest + exit 1, not a
    crash or a silent pass."""
    _fabricate_codec_ckpt(tmp_path / "magicodec.ckpt")
    _fabricate_tokenizer_dir(tmp_path / "tokenizer")
    out = subprocess.run(
        [
            sys.executable, "run_real.py",
            "--gguf", str(tmp_path / "nonexistent.gguf"),
            "--tokenizer_dir", str(tmp_path / "tokenizer"),
            "--magicodec_ckpt", str(tmp_path / "magicodec.ckpt"),
            "--skip_codec_parity", "--secs", "1", "--n_ctx", "4096", "--smoke",
            "--hidden_size", "32", "--num_layers", "2", "--num_heads", "4",
            "--hop_length", "40", "--codec_framerate", "400.0",
        ],
        capture_output=True, text=True, timeout=900, env=_ENV,
    )
    assert out.returncode == 1, out.stdout[-2000:] + out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    manifest = json.loads(last)
    assert manifest["run_real"] == "failed"
    assert manifest["stages"]["lm-load"]["status"] == "FAIL"
    assert manifest["stages"]["live-session"]["status"] == "SKIP"
