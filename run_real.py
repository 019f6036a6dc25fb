"""Zero-integration bring-up for REAL assets: codec + tokenizer + LM (+ ASR).

The reference wires its real assets in ``realtime_agent_resources.py:10-39``
(a trained GGUF via llama.cpp, the HF tokenizer dir, the MagiCodec-50Hz-Base
checkpoint, whisper.cpp small.en). This framework's loaders for each were
built and tested against fabricated fixtures; this script is the one command
to run the day the actual weights are on disk — it loads everything through
the SAME paths the tests exercise, validates each stage, runs a short live
duplex session, and prints a pass/fail manifest. No code changes needed.

Usage:
    python run_real.py \
        --gguf /path/model.gguf            # or an HF dir / orbax checkpoint \
        --tokenizer_dir /path/tokenizer    # HF tokenizer directory \
        --magicodec_ckpt /path/codec.ckpt  # MagiCodec torch checkpoint \
        [--whisper_dir /path/whisper]      # HF Whisper checkpoint (optional) \
        [--int8 | --int4] [--secs 10] [--audio call.wav] \
        [--skip_codec_parity]              # skip the slow torch cross-check

Stages (each prints OK/FAIL/SKIP; exit 0 iff no FAIL):
  1 codec-parity   verify_codec_parity.py harness on the checkpoint
                   (key-map coverage, framerate probe, argmax margins,
                   streaming==batch, torch cross-check when importable)
  2 tokenizer      HF tokenizer through HFTextTokenizerAdapter: the layout
                   invariants the agent relies on (single-token " A".." Z"
                   speakers, 1:1 codec-char mapping, pad fallback)
  3 lm-load        weights through RealtimeAgentResources (GGUF reader /
                   HF safetensors / orbax), optional int8/int4 quantize,
                   logits sanity on a short prompt
  4 asr            JaxWhisperASR.from_hf_checkpoint + one transcription
  5 live-session   a real RealtimeAgent over the loaded assets processes
                   --secs of audio end-to-end; reports RTF + transcript
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

MANIFEST = {}


def stage(name: str, status: str, detail: str = "") -> None:
    MANIFEST[name] = {"status": status, "detail": detail}
    print(f"[run_real] {name}: {status}" + (f" — {detail}" if detail else ""), flush=True)


def run_codec_parity(args) -> None:
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "verify_codec_parity.py"),
        "--checkpoint", args.magicodec_ckpt,
        "--expect_framerate", str(args.codec_framerate),
        "--hidden_size", str(args.hidden_size),
        "--num_layers", str(args.num_layers),
        "--num_heads", str(args.num_heads),
        "--hop_length", str(args.hop_length),
        "--norm_type", args.norm_type,
        "--frontend", args.frontend,
    ]
    if args.rope_interleaved:
        cmd.append("--rope_interleaved")
    if args.audio:
        cmd += ["--audio", args.audio]
    if args.magicodec_src:
        cmd += ["--magicodec_src", args.magicodec_src]
    for flag in args.codec_args or []:
        cmd.append(flag)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    tail = (out.stdout or out.stderr).strip().splitlines()[-3:]
    if out.returncode == 0:
        stage("codec-parity", "OK", " | ".join(tail))
    else:
        stage("codec-parity", "FAIL", " | ".join(tail))


def load_codec(args):
    """The converted codec for the live session — the same torch-state-dict ->
    convert.codec_params_from_torch path the parity harness validates."""
    import torch

    from realtime_codec_agent_tpu.models import convert
    from realtime_codec_agent_tpu.models.codec import CodecConfig, JaxCodecModel

    sd = torch.load(args.magicodec_ckpt, map_location="cpu", weights_only=False)
    for wrapper in ("state_dict", "model", "generator"):
        if isinstance(sd, dict) and wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}
    prefixes = {k.split(".")[0] for k in sd}
    if not ({"encoder", "quantizer", "decoder"} & prefixes):
        first = next(iter(sorted(prefixes)))
        sd = {k[len(first) + 1:]: v for k, v in sd.items() if k.startswith(first + ".")}
    cfg_kw = dict(
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        hop_length=args.hop_length,
        norm_type=args.norm_type,
        rope_interleaved=args.rope_interleaved,
        frontend=args.frontend,
    )
    cb = next((k for k in sd if k.endswith("quantizer.codebook.weight")), None)
    pw = next((k for k in sd if k.endswith("quantizer.codebook_proj.weight")), None)
    if cb is not None:
        cfg_kw["codebook_size"], cfg_kw["codebook_raw_dim"] = sd[cb].shape
    if pw is not None:
        cfg_kw["codebook_dim"] = sd[pw].shape[0]
    cfg = CodecConfig(**cfg_kw)
    return JaxCodecModel(convert.codec_params_from_torch(sd, cfg), cfg)


def load_tokenizer(args, codebook_size: int):
    from transformers import AutoTokenizer

    from realtime_codec_agent_tpu.tokenization.tokenizer import (
        CodecTextTokenizer,
        HFTextTokenizerAdapter,
    )

    hf = AutoTokenizer.from_pretrained(args.tokenizer_dir, local_files_only=True)
    tok = CodecTextTokenizer(
        text_tokenizer=HFTextTokenizerAdapter(hf), codebook_size=codebook_size
    )
    problems = []
    for letter in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        ids = tok.encode(f" {letter}", add_special_tokens=False)
        if len(ids) != 1:
            problems.append(f"' {letter}' -> {len(ids)} tokens")
    for k in (0, 1, codebook_size - 1):
        ch = chr(tok.unicode_offset + k)
        if tok.convert_tokens_to_ids(ch) != tok.codec_vocab_start + k:
            problems.append(f"codec char {k} misplaced")
    s = " A: hello" + chr(tok.unicode_offset + 3)
    if tok.decode(tok.encode(s, add_special_tokens=False)) != s:
        problems.append("mixed text+codec round-trip broken")
    if problems:
        stage("tokenizer", "FAIL", "; ".join(problems[:5]))
        return None
    stage(
        "tokenizer", "OK",
        f"vocab={tok.vocab_size} codec_vocab_start={tok.codec_vocab_start}",
    )
    return tok


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--gguf", "--lm", dest="lm_path", required=True,
                   help="LM weights: .gguf file, HF checkpoint dir, or orbax dir")
    p.add_argument("--tokenizer_dir", required=True)
    p.add_argument("--magicodec_ckpt", required=True)
    p.add_argument("--whisper_dir", default=None)
    p.add_argument("--magicodec_src", default=None,
                   help="MagiCodec repo path for the torch cross-check stage")
    p.add_argument("--audio", default=None, help="real test WAV (default: synthetic)")
    p.add_argument("--secs", type=float, default=10.0)
    # MagiCodec-50Hz-Base geometry defaults (verify_codec_parity.py's too)
    p.add_argument("--codec_framerate", type=float, default=50.0)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--hop_length", type=int, default=320)
    p.add_argument("--norm_type", default="layer", choices=("rms", "layer"))
    p.add_argument("--rope_interleaved", action="store_true")
    p.add_argument("--frontend", default="patchify", choices=("patchify", "conv"))
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true")
    p.add_argument("--n_ctx", type=int, default=12288,
                   help="KV cache length (smaller = faster bring-up compiles)")
    p.add_argument("--smoke", action="store_true",
                   help="hot-loop-only live session (no opening text, no "
                        "inactivity-forced events): for fabricated/untrained "
                        "weights, whose event text generation is unbounded")
    p.add_argument("--skip_codec_parity", action="store_true")
    p.add_argument("--codec_args", nargs="*", default=None,
                   help="extra flags passed through to verify_codec_parity.py")
    args = p.parse_args()

    # ---- stage 1: codec parity harness (subprocess: it exits on failure) ----
    if args.skip_codec_parity:
        stage("codec-parity", "SKIP", "--skip_codec_parity")
    else:
        run_codec_parity(args)

    codec = load_codec(args)

    # ---- stage 2: tokenizer invariants ----
    tok = load_tokenizer(args, codec.codebook_size)

    # ---- stage 3: LM weights through the deployment loader ----
    from realtime_codec_agent_tpu import (
        RealtimeAgent,
        RealtimeAgentConfig,
        RealtimeAgentResources,
    )

    resources = None
    try:
        t0 = time.time()
        resources = RealtimeAgentResources(
            llm_model_path=args.lm_path,
            llm_n_ctx=args.n_ctx,
            codec_model=codec,
            tokenizer=tok,
            whisper_model=None,
            quantize_int8=args.int8,
            quantize_int4=args.int4,
        )
        llm = resources.llm
        ids = resources.tokenizer.encode(" A: hello")
        llm.eval(ids)
        lp = llm.get_logprobs(ids[:-1], ids[1:])
        if not np.all(np.isfinite(lp)):
            raise ValueError("non-finite logprobs on a short prompt")
        stage(
            "lm-load", "OK",
            f"{args.lm_path} in {time.time() - t0:.0f}s, "
            f"vocab={resources.lm_config.vocab_size}, mean logprob {lp.mean():.3f}",
        )
        llm.reset()
    except Exception as e:  # noqa: BLE001 — manifest harness: record, don't crash
        stage("lm-load", "FAIL", f"{type(e).__name__}: {e}")

    # ---- stage 4: on-TPU whisper ----
    asr = None
    if args.whisper_dir is None:
        stage("asr", "SKIP", "no --whisper_dir")
    else:
        try:
            from realtime_codec_agent_tpu.agent.asr import JaxWhisperASR

            asr = JaxWhisperASR.from_hf_checkpoint(
                args.whisper_dir, window_secs=[5, 10, 30]
            )
            text = asr.transcribe(np.zeros(16000, np.float32))
            stage("asr", "OK", f"silence -> {text!r}")
        except Exception as e:  # noqa: BLE001
            stage("asr", "FAIL", f"{type(e).__name__}: {e}")

    # ---- stage 5: live duplex session ----
    if resources is None:
        stage("live-session", "SKIP", "lm-load failed")
    else:
        try:
            if asr is not None:
                resources.whisper_model = asr
            over = {}
            if args.smoke:
                over = dict(
                    agent_opening_text=None,
                    force_trans_after_inactivity_secs=0.0,
                    force_response_after_inactivity_secs=0.0,
                )
            config = RealtimeAgentConfig(use_whisper=asr is not None, seed=42, **over)
            agent = RealtimeAgent(resources=resources, config=config)
            sr = resources.audio_tokenizer.sampling_rate
            if args.audio:
                from realtime_codec_agent_tpu.utils.audio_io import read_audio
                from realtime_codec_agent_tpu.utils.audio_utils import resample

                in_sr, audio = read_audio(args.audio, mono=False)
                if audio.ndim > 1:
                    audio = audio[1] if audio.shape[0] > 1 else audio[0]
                audio = resample(audio, in_sr, sr)
            else:
                from cli_benchmark import synthetic_speech

                audio = synthetic_speech(args.secs, sr, seed=7)
            audio = audio[: int(args.secs * sr)]
            chunk = agent.chunk_size_samples
            n = len(audio) // chunk
            t0 = time.time()
            for i in range(n):
                agent.process_audio(audio[i * chunk : (i + 1) * chunk])
            agent.drain_pipeline()
            agent.join_detours()
            rtf = (time.time() - t0) / max(1e-9, n * config.chunk_size_secs)
            out = agent.get_audio_history()
            if not np.all(np.isfinite(out)):
                raise ValueError("non-finite output audio")
            transcript = agent.format_transcript()
            stage(
                "live-session", "OK",
                f"{n * config.chunk_size_secs:.1f}s at RTF={rtf:.3f}, "
                f"{len(agent.transcript)} transcript events",
            )
            print("---- transcript ----")
            print(transcript or "(no speech events)")
        except Exception as e:  # noqa: BLE001
            stage("live-session", "FAIL", f"{type(e).__name__}: {e}")

    failed = [k for k, v in MANIFEST.items() if v["status"] == "FAIL"]
    print(json.dumps({"run_real": "failed" if failed else "passed", "stages": MANIFEST}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
