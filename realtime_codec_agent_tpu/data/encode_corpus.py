"""Batched corpus -> codec codes encode job.

TPU-native replacement for the reference's 4-GPU shell-script sharding of
``codec_bpe.audio_to_codes`` (encode_audio_gpu_{1..4}.sh, encode_audio_stereo.sh:
chunk 0.1 s, context 2.0 s, batch 256, mono + stereo outputs, .npy +
codec_info.json). One job batches sliding context windows onto the device —
sharded across all local devices via ``jax.sharding`` when a mesh is given —
instead of splitting the corpus by filename across processes.

Streaming equivalence: each 0.1 s chunk is encoded with its trailing 2 s
context window (zero/silence left-padding at file start), matching the fixed-
context streaming AudioTokenizer, so offline codes and live codes agree.
``context_mode="full"`` instead encodes whole files in one pass (~20x less
compute, but not streaming-equivalent).
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np

from ..models.codec import JaxCodecModel
from ..utils.audio_io import read_audio
from ..utils.audio_utils import resample
from .prep_channel_map import SUPPORTED_EXTENSIONS


def list_audio_files(
    audio_path: str,
    audio_filter: Optional[Sequence[str]] = None,
    extensions: Sequence[str] = SUPPORTED_EXTENSIONS,
) -> List[str]:
    if isinstance(audio_filter, str):
        audio_filter = [audio_filter]
    out = []
    for root, _, files in os.walk(audio_path):
        for fname in sorted(files):
            if not fname.lower().endswith(tuple(extensions)):
                continue
            path = os.path.join(root, fname)
            if audio_filter and not any(f in path for f in audio_filter):
                continue
            out.append(path)
    return sorted(out)


def sliding_windows(audio: np.ndarray, chunk_samples: int, context_samples: int) -> np.ndarray:
    """(T,) -> (num_chunks, context+chunk) with zero left-padding at the start."""
    t = audio.shape[-1]
    num_chunks = -(-t // chunk_samples)
    padded = np.zeros(context_samples + num_chunks * chunk_samples, dtype=np.float32)
    padded[context_samples : context_samples + t] = audio
    window = context_samples + chunk_samples
    idx = np.arange(num_chunks)[:, None] * chunk_samples + np.arange(window)[None, :]
    return padded[idx]


class CorpusEncoder:
    def __init__(
        self,
        codec_model: JaxCodecModel,
        chunk_secs: float = 0.1,
        context_secs: float = 2.0,
        batch_size: int = 256,
        context_mode: str = "sliding",
        use_mesh: bool = True,
    ):
        import jax

        self.codec = codec_model
        self.sr = codec_model.sample_rate
        self.hop = codec_model.config.hop_length
        self.chunk_samples = int(chunk_secs * self.sr)
        self.context_samples = int(context_secs * self.sr)
        self.chunk_frames = self.chunk_samples // self.hop
        self.batch_size = batch_size
        self.context_mode = context_mode
        self.framerate = self.sr / self.hop

        self._sharding = None
        if use_mesh and len(jax.devices()) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            mesh = Mesh(np.array(jax.devices()), ("data",))
            self._sharding = NamedSharding(mesh, P("data"))

    def encode_channel(self, audio: np.ndarray) -> np.ndarray:
        """(T,) float32 -> (1, F) int32 codes (num_codebooks leading dim)."""
        import jax

        if self.context_mode == "full":
            codes = self.codec.encode(audio[None, :])[0]
            return codes[None, :]
        windows = sliding_windows(audio, self.chunk_samples, self.context_samples)
        n = windows.shape[0]
        parts = []
        bs = self.batch_size
        if self._sharding is not None:
            ndev = self._sharding.mesh.devices.size
            bs = max(ndev, bs - bs % ndev)
        for start in range(0, n, bs):
            batch = windows[start : start + bs]
            real = batch.shape[0]
            if real < bs:
                batch = np.pad(batch, ((0, bs - real), (0, 0)))
            arr = batch
            if self._sharding is not None:
                arr = jax.device_put(batch, self._sharding)
            codes = self.codec.encode(arr)  # (bs, window_frames)
            parts.append(np.asarray(codes)[:real, -self.chunk_frames :])
        return np.concatenate(parts, axis=None)[None, :].astype(np.int64)

    def encode_file(
        self,
        audio_file: str,
        audio_root: str,
        output_path: str,
        stereo: bool = False,
        overwrite: bool = False,
    ) -> List[str]:
        """Encode one file -> ``<root>_c<ch>.npy`` per channel. Mono downmix is
        always written as channel 0; with ``stereo=True`` each source channel
        is also encoded separately (encode_audio_stereo.sh behavior)."""
        rel = os.path.relpath(audio_file, audio_root)
        rel_root = os.path.splitext(rel)[0]
        out_root = os.path.join(output_path, rel_root)
        os.makedirs(os.path.dirname(out_root), exist_ok=True)

        sr, audio = read_audio(audio_file)
        if sr != self.sr:
            audio = resample(audio, sr, self.sr)
        channels: List[np.ndarray] = []
        if audio.ndim == 1:
            channels.append(audio)
        else:
            channels.append(audio.mean(axis=0))  # mono mix
            if stereo:
                channels = list(audio) if stereo == "only" else channels + list(audio)

        written = []
        for ch, ch_audio in enumerate(channels):
            out_file = f"{out_root}_c{ch}.npy"
            if os.path.exists(out_file) and not overwrite:
                continue
            np.save(out_file, self.encode_channel(ch_audio.astype(np.float32)))
            written.append(out_file)
        return written

    def write_codec_info(self, output_path: str, codec_name: str = "rtca-tpu-codec") -> str:
        info = {
            "codec_model": codec_name,
            "num_codebooks": 1,
            "codebook_size": self.codec.codebook_size,
            "codec_framerate": self.framerate,
            "sampling_rate": self.sr,
            "chunk_secs": self.chunk_samples / self.sr,
            "context_secs": self.context_samples / self.sr,
        }
        os.makedirs(output_path, exist_ok=True)
        path = os.path.join(output_path, "codec_info.json")
        with open(path, "w") as f:
            json.dump(info, f, indent=2)
        return path


def get_codec_info(codes_path: str) -> Optional[dict]:
    path = os.path.join(codes_path, "codec_info.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main(argv=None):
    import argparse

    from tqdm import tqdm

    from ..models.codec import CodecConfig, tiny_codec_config

    parser = argparse.ArgumentParser(description="Batched corpus encode to codec codes")
    parser.add_argument("--audio_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--codec_checkpoint", default=None)
    parser.add_argument("--chunk_secs", type=float, default=0.1)
    parser.add_argument("--context_secs", type=float, default=2.0)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--context_mode", choices=["sliding", "full"], default="sliding")
    parser.add_argument("--stereo", action="store_true")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--audio_filter", nargs="+", default=None)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    cfg = tiny_codec_config() if args.tiny else CodecConfig()
    if args.codec_checkpoint:
        codec = JaxCodecModel.load(args.codec_checkpoint, config=cfg)
    else:
        codec = JaxCodecModel.random_init(cfg)
    encoder = CorpusEncoder(
        codec,
        chunk_secs=args.chunk_secs,
        context_secs=args.context_secs,
        batch_size=args.batch_size,
        context_mode=args.context_mode,
    )
    files = list_audio_files(args.audio_path, args.audio_filter)
    for audio_file in tqdm(files, desc="Encoding"):
        encoder.encode_file(
            audio_file, args.audio_path, args.output_path, stereo=args.stereo,
            overwrite=args.overwrite,
        )
    encoder.write_codec_info(args.output_path)


if __name__ == "__main__":
    main()
