"""Convert NIST SPH corpora (Fisher) to mp3/wav via the external sph2pipe
binary (reference tools/sph_to_mp3.py:37 — sph2pipe stays an external data-prep
tool). Without an mp3 encoder in-image the fallback output is WAV; pass
--format mp3 when soundfile with lame support is installed."""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_codec_agent_tpu.utils.audio_io import read_audio, write_wav


def convert_one(sph2pipe: str, file_path: str, out_format: str) -> str:
    raw_filepath = file_path.replace(".sph", "-raw.sph")
    out_filepath = file_path.replace(".sph", f".{out_format}")
    subprocess.run([sph2pipe, file_path, raw_filepath], check=True)
    try:
        sr, audio = read_audio(raw_filepath)
        if out_format == "wav":
            write_wav(out_filepath, sr, audio)
        else:
            import soundfile as sf

            sf.write(out_filepath, audio.T if audio.ndim > 1 else audio, sr, format=out_format)
    finally:
        if os.path.exists(raw_filepath):
            os.remove(raw_filepath)
    return out_filepath


def main(argv=None):
    parser = argparse.ArgumentParser(description="Convert sph files to mp3/wav")
    parser.add_argument("--sph2pipe", default="./sph2pipe")
    parser.add_argument("--audio-dir", default="data/audio/raw")
    parser.add_argument("--format", choices=["wav", "mp3"], default="wav")
    parser.add_argument("--verify", action="store_true")
    parser.add_argument("--delete", action="store_true")
    args = parser.parse_args(argv)

    num_sph = num_out = num_deleted = 0
    for root, _, files in os.walk(args.audio_dir):
        sph_files = sorted(f for f in files if f.endswith(".sph") and not f.endswith("-raw.sph"))
        if not sph_files:
            continue
        print(f"{'Verifying' if args.verify else 'Converting'} in {root}...")
        for file in sph_files:
            file_path = os.path.join(root, file)
            out_filepath = file_path.replace(".sph", f".{args.format}")
            try:
                num_sph += 1
                if args.verify:
                    if os.path.exists(out_filepath):
                        num_out += 1
                else:
                    convert_one(args.sph2pipe, file_path, args.format)
                    num_out += 1
                if args.delete:
                    os.remove(file_path)
                    num_deleted += 1
            except Exception as e:
                print(f"Error processing {file_path}: {e}")

    print(f"SPH files: {num_sph}; converted/verified: {num_out}; failed: {num_sph - num_out}")
    if args.delete:
        print(f"Deleted {num_deleted} SPH files.")


if __name__ == "__main__":
    main()
