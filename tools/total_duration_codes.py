"""Sum encoded-corpus durations from codes .npy files
(reference tools/total_duration_codes.py): frames / framerate per file,
reported per folder, framerate from codec_info.json."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_codec_agent_tpu.data.encode_corpus import get_codec_info


def main(argv=None):
    parser = argparse.ArgumentParser(description="Total duration of encoded codes")
    parser.add_argument("--codes_path", required=True)
    parser.add_argument("--framerate", type=float, default=None,
                        help="override (default: codec_info.json)")
    args = parser.parse_args(argv)

    framerate = args.framerate
    if framerate is None:
        info = get_codec_info(args.codes_path)
        if not info:
            raise SystemExit("no codec_info.json found; pass --framerate")
        framerate = info.get("codec_framerate", info.get("framerate"))
    print(f"Framerate: {framerate} Hz")

    totals = {}
    num_files = 0
    for root, _, files in os.walk(args.codes_path):
        for file in sorted(files):
            if not file.endswith(".npy"):
                continue
            codes = np.load(os.path.join(root, file), mmap_mode="r")
            totals[root] = totals.get(root, 0.0) + codes.shape[-1] / framerate
            num_files += 1

    total = 0.0
    for folder, duration in sorted(totals.items()):
        total += duration
        print(f"{folder}: {duration / 3600:.2f} hours")
    print(f"Total: {total / 3600:.2f} hours in {num_files} codes files")
    return total


if __name__ == "__main__":
    main()
