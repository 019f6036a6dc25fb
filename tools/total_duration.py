"""Sum audio durations per corpus folder (reference tools/total_duration.py).

Walks --audio_dir, reports per-folder and total hours. Uses header-based
duration where possible (fast) and full decode as fallback.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_codec_agent_tpu.utils.audio_io import audio_duration_secs, read_audio

AUDIO_EXTS = (".mp3", ".wav", ".opus", ".flac")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Total audio duration per folder")
    parser.add_argument("--audio_dir", default="data/audio/raw")
    parser.add_argument("--slow", action="store_true", help="decode files instead of reading headers")
    args = parser.parse_args(argv)

    totals = {}
    num_files = 0
    for root, _, files in os.walk(args.audio_dir):
        for file in sorted(files):
            if not file.endswith(AUDIO_EXTS):
                continue
            path = os.path.join(root, file)
            duration = None if args.slow else audio_duration_secs(path)
            if duration is None:
                sr, audio = read_audio(path)
                duration = audio.shape[-1] / sr
            totals[root] = totals.get(root, 0.0) + duration
            num_files += 1

    total = 0.0
    for folder, duration in sorted(totals.items()):
        total += duration
        print(f"{folder}: {duration / 3600:.2f} hours")
    print(f"Total: {total / 3600:.2f} hours in {num_files} files")
    return total


if __name__ == "__main__":
    main()
