"""Truncate an audio file to its first N seconds (reference tools/cut_audio.py);
writes <basename>_cut.wav next to the working directory."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_codec_agent_tpu.utils.audio_io import read_audio, write_wav


def main(argv=None):
    parser = argparse.ArgumentParser("Truncate an audio file to a given length")
    parser.add_argument("--filename", required=True)
    parser.add_argument("--keep_secs", type=float, default=10.0)
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)

    sr, audio = read_audio(args.filename)
    audio = audio[..., : int(args.keep_secs * sr)]
    out = args.output or f"{os.path.splitext(os.path.basename(args.filename))[0]}_cut.wav"
    write_wav(out, sr, audio)
    print(f"wrote {out} ({audio.shape[-1] / sr:.2f}s)")
    return out


if __name__ == "__main__":
    main()
