"""Codec-embedding bridge: codec codebook -> LM embedding space.

Rebuild of the reference's bridge utilities:
- ``extract_codec_embeddings`` dumps the codec's projected codebook to a file
  (reference extract_codec_embeddings.py:15-22, shape (num_codebooks, V, 16));
- ``persist_and_verify`` bakes trained projections into the embedding matrix
  and verifies the persisted model reproduces them (reference
  persist_codec_embeddings.py:35-85, codec_llama.py:178-206).
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from ..models.llama import (
    DuplexLMConfig,
    embed_ids,
    persist_codec_embeddings,
)


def extract_codec_embeddings(audio_tokenizer, save_path: str) -> np.ndarray:
    """Dump the codec's projected codebook as float32 (num_codebooks, V, dim)."""
    emb = np.asarray(audio_tokenizer.get_codec_embeddings(), dtype=np.float32)
    emb = emb[None, ...]  # single codebook
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    np.save(save_path if save_path.endswith(".npy") else save_path + ".npy", emb)
    return emb


def load_codec_embeddings(path: str) -> np.ndarray:
    """Load a codec embedding table from .npy (ours) or .pt (torch export)."""
    if path.endswith(".pt"):
        import torch

        emb = torch.load(path, map_location="cpu").float().numpy()
    else:
        emb = np.load(path)
    if emb.ndim != 3:
        raise ValueError(
            "codec embedding file must contain (num_codebooks, codebook_size, codebook_dim)"
        )
    return emb.astype(np.float32)


def persist_and_verify(
    params: Dict,
    cfg: DuplexLMConfig,
    batch_size: int = 8192,
) -> Tuple[Dict, float]:
    """Persist codec projections into embed_tokens and verify the vanilla
    model's embeddings match the dual-route model's (reference
    persist_codec_embeddings.py:59-76). Returns (vanilla_params, max_abs_err)."""
    import jax.numpy as jnp

    vanilla = persist_codec_embeddings(params, cfg, batch_size=batch_size)
    n = cfg.num_codebooks * cfg.codebook_size
    max_err = 0.0
    for start in range(0, n, batch_size):
        ids = jnp.arange(start, min(start + batch_size, n)) + cfg.codec_vocab_start
        want = np.asarray(embed_ids(params, ids, cfg), dtype=np.float32)
        got = np.asarray(embed_ids(vanilla, ids, cfg), dtype=np.float32)
        max_err = max(max_err, float(np.abs(want - got).max()))
    if max_err > 1e-2:
        raise AssertionError(f"persisted embeddings diverge: max_abs_err={max_err}")
    return vanilla, max_err
