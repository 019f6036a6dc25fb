"""Per-corpus stratified train/dev/test split keyed by file_id.

Behavioral rebuild of reference tools/split_lm_dataset.py:7-111: the split is
decided per distinct recording (file_id) within each corpus, saved to a
reusable CSV so e.g. the stereo dataset reuses the mono dataset's assignment
(reference prep_lm_dataset_magicodec_stereo.sh:9-10). jsonlines dependency
replaced with stdlib json-per-line.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Tuple

import numpy as np


def read_jsonl(path: str) -> Iterator[dict]:
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def compute_file_splits(
    metadata_path: str,
    train_ratio: float = 0.94,
    dev_ratio: float = 0.02,
    test_ratio: float = 0.04,
    seed: int = 42,
) -> Dict[str, str]:
    """file_id -> split, stratified per corpus (first path component)."""
    if min(train_ratio, dev_ratio, test_ratio) <= 0:
        raise ValueError("Ratios must be positive.")
    if abs(train_ratio + dev_ratio + test_ratio - 1.0) > 1e-9:
        raise ValueError("The sum of train, dev, and test ratios must be 1.")

    file_ids = []
    seen = set()
    for meta in read_jsonl(metadata_path):
        fid = meta["file_id"]
        if fid not in seen:
            seen.add(fid)
            file_ids.append(fid)

    by_corpus: Dict[str, list] = {}
    for fid in file_ids:
        by_corpus.setdefault(fid.split(os.sep)[0], []).append(fid)

    splits: Dict[str, str] = {}
    rng = np.random.RandomState(seed)
    for corpus_id in by_corpus:
        fids = list(by_corpus[corpus_id])
        order = rng.permutation(len(fids))
        n = len(fids)
        train_end = max(1, int(n * train_ratio))
        dev_end = train_end + max(1, int(n * dev_ratio))
        for rank, j in enumerate(order):
            if rank < train_end:
                splits[fids[j]] = "train"
            elif rank < dev_end:
                splits[fids[j]] = "dev"
            else:
                splits[fids[j]] = "test"
    return splits


def save_file_splits(splits: Dict[str, str], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("file_id,corpus_id,split\n")
        for fid, split in splits.items():
            f.write(f"{fid},{fid.split(os.sep)[0]},{split}\n")


def load_file_splits(path: str) -> Dict[str, str]:
    splits = {}
    with open(path, "r", encoding="utf-8") as f:
        header = f.readline().strip().split(",")
        fid_col, split_col = header.index("file_id"), header.index("split")
        for line in f:
            parts = line.rstrip("\n").split(",")
            if len(parts) > max(fid_col, split_col):
                splits[parts[fid_col]] = parts[split_col]
    return splits


def split_dataset(dataset_path: str, splits: Dict[str, str]) -> Tuple[str, str, str]:
    """Stream the dataset + metadata into per-split files (line-aligned)."""
    metadata_path = dataset_path.replace(".txt", "_metadata.jsonl")
    outs = {}
    metas = {}
    for split in ("train", "dev", "test"):
        outs[split] = open(dataset_path.replace(".txt", f"_{split}.txt"), "w", encoding="utf-8")
        metas[split] = open(
            dataset_path.replace(".txt", f"_{split}_metadata.jsonl"), "w", encoding="utf-8"
        )
    try:
        with open(dataset_path, "r", encoding="utf-8") as f:
            for line, meta in zip(f, read_jsonl(metadata_path)):
                split = splits[meta["file_id"]]
                outs[split].write(line)
                metas[split].write(json.dumps(meta) + "\n")
    finally:
        for f in list(outs.values()) + list(metas.values()):
            f.close()
    return tuple(dataset_path.replace(".txt", f"_{s}.txt") for s in ("train", "dev", "test"))


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Split a codec agent dataset into train, dev, and test sets."
    )
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--file_splits_csv", type=str, default=None)
    parser.add_argument("--train_ratio", type=float, default=0.94)
    parser.add_argument("--dev_ratio", type=float, default=0.02)
    parser.add_argument("--test_ratio", type=float, default=0.04)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    metadata_path = args.dataset_path.replace(".txt", "_metadata.jsonl")
    if args.file_splits_csv:
        print(f"Using provided file splits from {args.file_splits_csv}")
        splits = load_file_splits(args.file_splits_csv)
    else:
        splits = compute_file_splits(
            metadata_path, args.train_ratio, args.dev_ratio, args.test_ratio, args.seed
        )
        save_file_splits(splits, args.dataset_path.replace(".txt", "_file_splits.csv"))
    split_dataset(args.dataset_path, splits)
    print("Done!")


if __name__ == "__main__":
    main()
