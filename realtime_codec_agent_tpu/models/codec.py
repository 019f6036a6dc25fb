"""MagiCodec-style neural audio codec, TPU-native.

Capability rebuild of the external MagiCodec-50Hz-Base engine the reference
drives through ``codec_model.pad_audio -> encoder -> quantizer.inference`` and
``quantizer.codebook_proj -> embedding -> decoder`` (reference
audio_tokenizer.py:189-201). The reference's engine is PyTorch + flash-attn
CUDA kernels (magicodec_build.sh:4-16); here the whole codec is a pair of
jitted JAX programs built from MXU-friendly pieces:

- **Patchify front-end**: audio is right-padded to a multiple of ``hop_length``
  (320 samples = 20 ms at 16 kHz -> 50 Hz frame rate) and reshaped to frames,
  then linearly embedded — one big (T/320, 320) @ (320, H) matmul instead of a
  strided conv stack, which XLA tiles perfectly onto the MXU.
- **Transformer body** (encoder and decoder): pre-RMSNorm blocks with rotary
  attention and GELU MLPs (mirroring the rotary/layer_norm/fused_dense CUDA
  ops MagiCodec builds from flash-attn), full bidirectional attention.
- **Single-codebook quantizer**: a raw codebook (V, raw_dim) with a projection
  to ``codebook_dim`` (=16) — matching ``quantizer.codebook_proj(codebook.weight)``
  semantics — and nearest-neighbor search done by the blocked Pallas kernel in
  ops/quantize.py.

Weights are a plain pytree; ``init_codec_params`` randomly initializes (for
tests/benchmarks), and real MagiCodec checkpoints can be converted into this
layout offline.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.quantize import nearest_code


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    sample_rate: int = 16000
    hop_length: int = 320  # -> 50 Hz frame rate
    codebook_size: int = 131072
    codebook_dim: int = 16       # projected dim seen by the LM embedding bridge
    codebook_raw_dim: int = 16   # raw codebook storage dim (pre codebook_proj)
    hidden_size: int = 768
    num_layers: int = 8
    num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    # audio <-> frame front-end:
    # - "patchify": one (hop, H) matmul per frame — the most MXU-friendly form
    # - "conv": strided Conv1d downsample stack / ConvTranspose1d upsample
    #   mirror (MagiCodec/Encodec-style; conv_ratios must multiply to
    #   hop_length). Use this layout when importing a conv-front-end torch
    #   checkpoint through models/convert.codec_params_from_torch.
    frontend: str = "patchify"
    conv_ratios: Tuple[int, ...] = (8, 5, 4, 2)
    conv_base_channels: int = 48
    # transformer-block flavor knobs for real-checkpoint parity: flash-attn
    # blocks (which MagiCodec builds on, magicodec_build.sh:13-16) default to
    # LayerNorm with bias, biased projections, and support both rotary
    # layouts. Our from-scratch config keeps the leaner RMSNorm/no-bias
    # flavor; the torch converter flips these to match the checkpoint.
    norm_type: str = "rms"  # "rms" | "layer"
    rope_interleaved: bool = False
    compute_dtype: str = "bfloat16"

    @property
    def framerate(self) -> float:
        return self.sample_rate / self.hop_length

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def conv_channels(self) -> Tuple[int, ...]:
        """Channel schedule for the conv front-end: doubles per stage, capped
        at hidden_size, ending exactly at hidden_size."""
        chans = []
        c = self.conv_base_channels
        for _ in self.conv_ratios:
            chans.append(min(c, self.hidden_size))
            c *= 2
        chans[-1] = self.hidden_size
        return tuple(chans)


def tiny_codec_config(**overrides) -> CodecConfig:
    """Small config for tests: same 16 kHz / 50 Hz geometry, tiny body+codebook."""
    defaults = dict(
        codebook_size=1024, hidden_size=64, num_layers=2, num_heads=4,
        codebook_dim=16, codebook_raw_dim=16,
    )
    defaults.update(overrides)
    return CodecConfig(**defaults)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _init_block(key, h: int, mlp: int, dtype) -> Dict:
    ks = jax.random.split(key, 6)
    s = 1.0 / math.sqrt(h)
    sm = 1.0 / math.sqrt(mlp)
    return {
        "attn_norm": jnp.ones((h,), dtype),
        "wq": (jax.random.normal(ks[0], (h, h)) * s).astype(dtype),
        "wk": (jax.random.normal(ks[1], (h, h)) * s).astype(dtype),
        "wv": (jax.random.normal(ks[2], (h, h)) * s).astype(dtype),
        "wo": (jax.random.normal(ks[3], (h, h)) * s).astype(dtype),
        "mlp_norm": jnp.ones((h,), dtype),
        "w1": (jax.random.normal(ks[4], (h, mlp)) * s).astype(dtype),
        "b1": jnp.zeros((mlp,), dtype),
        "w2": (jax.random.normal(ks[5], (mlp, h)) * sm).astype(dtype),
        "b2": jnp.zeros((h,), dtype),
    }


def _init_conv_frontend(key, cfg: CodecConfig, dtype) -> Tuple[Dict, Dict]:
    """Strided Conv1d downsample stack + mirrored ConvTranspose1d upsampler
    (MagiCodec/Encodec-style). Kernel layouts match lax.conv dimension
    numbers ("NWC","WIO","NWC"): (k, in, out)."""
    if math.prod(cfg.conv_ratios) != cfg.hop_length:
        raise ValueError(
            f"conv_ratios {cfg.conv_ratios} must multiply to hop_length {cfg.hop_length}"
        )
    chans = cfg.conv_channels
    ks = jax.random.split(key, 2 * len(chans) + 2)

    def conv_w(k, kern, cin, cout):
        scale = 1.0 / math.sqrt(kern * cin)
        return (jax.random.normal(k, (kern, cin, cout)) * scale).astype(dtype)

    # encoder stage i: channels c_{i-1} -> c_i, downsample by ratio_i
    # decoder stage j: the exact mirror, upsample back to c_{i-1} (c_{-1}=1)
    in_chans = (1,) + chans[:-1]
    enc_stages, dec_stages = [], []
    for i, (r, cin, cout) in enumerate(zip(cfg.conv_ratios, in_chans, chans)):
        enc_stages.append(
            {"w": conv_w(ks[2 * i], 2 * r, cin, cout), "b": jnp.zeros((cout,), dtype)}
        )
        dec_stages.append(
            {"w": conv_w(ks[2 * i + 1], 2 * r, cout, cin), "b": jnp.zeros((cin,), dtype)}
        )
    return {"stages": enc_stages}, {"stages": list(reversed(dec_stages))}


def init_codec_params(key, cfg: CodecConfig) -> Dict:
    """Random-init the full param pytree as ONE jitted device program
    (eager per-leaf init floods the remote-device tunnel with tiny in-flight
    programs; a big program queued behind such a flood can wedge
    indefinitely — see models/whisper.init_whisper_params)."""
    return _init_codec_params_jit(key, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _init_codec_params_jit(key, cfg: CodecConfig) -> Dict:
    dtype = jnp.dtype(cfg.compute_dtype)
    h, hop, d = cfg.hidden_size, cfg.hop_length, cfg.codebook_dim
    keys = jax.random.split(key, 8 + 2 * cfg.num_layers)
    enc_blocks = [
        _init_block(keys[8 + i], h, cfg.mlp_dim, dtype) for i in range(cfg.num_layers)
    ]
    dec_blocks = [
        _init_block(keys[8 + cfg.num_layers + i], h, cfg.mlp_dim, dtype)
        for i in range(cfg.num_layers)
    ]
    params = {
        "encoder": {
            "blocks": enc_blocks,
            "out_norm": jnp.ones((h,), dtype),
            "out_proj": (jax.random.normal(keys[1], (h, d)) / math.sqrt(h)).astype(dtype),
        },
        "quantizer": {
            # raw codebook + projection, mirroring MagiCodec's
            # quantizer.codebook.weight / quantizer.codebook_proj
            "codebook": jax.random.normal(keys[2], (cfg.codebook_size, cfg.codebook_raw_dim)).astype(jnp.float32),
            "proj_w": (jax.random.normal(keys[3], (cfg.codebook_raw_dim, d)) / math.sqrt(cfg.codebook_raw_dim)).astype(jnp.float32),
            "proj_b": jnp.zeros((d,), jnp.float32),
        },
        "decoder": {
            "in_proj": (jax.random.normal(keys[4], (d, h)) / math.sqrt(d)).astype(dtype),
            "in_bias": jnp.zeros((h,), dtype),
            "blocks": dec_blocks,
            "out_norm": jnp.ones((h,), dtype),
        },
    }
    if cfg.frontend == "conv":
        enc_conv, dec_conv = _init_conv_frontend(keys[6], cfg, dtype)
        params["encoder"]["conv"] = enc_conv
        params["decoder"]["conv"] = dec_conv
    else:
        params["encoder"]["patch_embed"] = (
            jax.random.normal(keys[0], (hop, h)) / math.sqrt(hop)
        ).astype(dtype)
        params["encoder"]["patch_bias"] = jnp.zeros((h,), dtype)
        params["decoder"]["patch_unembed"] = (
            jax.random.normal(keys[5], (h, hop)) / math.sqrt(h)
        ).astype(dtype)
    return params


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def pad_audio(audio: np.ndarray, hop_length: int) -> np.ndarray:
    """Right-pad the last axis to a multiple of hop_length (codec_model.pad_audio)."""
    t = audio.shape[-1]
    target = ((t + hop_length - 1) // hop_length) * hop_length
    if target == t:
        return audio
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, target - t)]
    return np.pad(audio, pad, mode="constant")


def _norm(x: jnp.ndarray, w: jnp.ndarray, b, cfg: CodecConfig) -> jnp.ndarray:
    if cfg.norm_type == "layer":
        return nn.layer_norm(x, w, b, cfg.rms_eps)
    return nn.rms_norm(x, w, cfg.rms_eps)


def _proj(y: jnp.ndarray, w: jnp.ndarray, b) -> jnp.ndarray:
    out = jnp.dot(y, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(y.dtype)


def _transformer(x: jnp.ndarray, blocks, cfg: CodecConfig) -> jnp.ndarray:
    b, t, h = x.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    positions = jnp.arange(t)
    cos, sin = nn.rope_cos_sin(
        positions, dh, cfg.rope_theta, interleaved=cfg.rope_interleaved
    )
    for blk in blocks:
        res = x
        y = _norm(x, blk["attn_norm"], blk.get("attn_norm_b"), cfg)
        q = _proj(y, blk["wq"], blk.get("bq")).reshape(b, t, nh, dh)
        k = _proj(y, blk["wk"], blk.get("bk")).reshape(b, t, nh, dh)
        v = _proj(y, blk["wv"], blk.get("bv")).reshape(b, t, nh, dh)
        q, k = nn.apply_rope(q, k, cos, sin, interleaved=cfg.rope_interleaved)
        attn = nn.attention(q, k, v)  # bidirectional
        attn = _proj(attn.reshape(b, t, h), blk["wo"], blk.get("bo"))
        x = res + attn
        res = x
        y = _norm(x, blk["mlp_norm"], blk.get("mlp_norm_b"), cfg)
        y = nn.gelu_mlp(y, blk["w1"], blk["b1"], blk["w2"], blk["b2"])
        x = res + y
    return x


def projected_codebook(params: Dict) -> jnp.ndarray:
    """quantizer.codebook_proj(quantizer.codebook.weight) -> (V, codebook_dim) f32.

    This is exactly the table exported by the LM embedding bridge
    (reference audio_tokenizer.py:151-159, extract_codec_embeddings.py:15-22).
    """
    q = params["quantizer"]
    return jnp.dot(q["codebook"], q["proj_w"], preferred_element_type=jnp.float32) + q["proj_b"]


def quantizer_tables(params: Dict, cfg: CodecConfig) -> Dict:
    """Precompute the quantizer lookup tables once per model: the projected
    codebook (decode embedding) and the padded/transposed codebook +
    half-norms (encode nearest-neighbor kernel). Rebuilding these per encode
    call costs ~75 MB of HBM traffic each — a large share of the streaming
    chunk budget."""
    from ..ops.quantize import prepare_codebook

    cb = projected_codebook(params)
    cbt, halfnorm = prepare_codebook(cb)
    return {"cb_proj": cb, "cbt": cbt, "halfnorm": halfnorm}


def _conv_downsample(stages, x: jnp.ndarray, ratios) -> jnp.ndarray:
    """(B, T, 1) -> (B, T/hop, C) via strided SAME convs + GELU between stages."""
    for i, (stage, r) in enumerate(zip(stages, ratios)):
        x = jax.lax.conv_general_dilated(
            x, stage["w"], window_strides=(r,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + stage["b"]
        if i < len(stages) - 1:
            x = jax.nn.gelu(x)
    return x


def _conv_upsample(stages, x: jnp.ndarray, ratios_rev) -> jnp.ndarray:
    """(B, F, C) -> (B, F*hop, 1) via transposed SAME convs + GELU between."""
    for i, (stage, r) in enumerate(zip(stages, ratios_rev)):
        x = jax.lax.conv_transpose(
            x, stage["w"], strides=(r,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + stage["b"]
        if i < len(stages) - 1:
            x = jax.nn.gelu(x)
    return x


def encode_frames(
    params: Dict, audio: jnp.ndarray, cfg: CodecConfig, tables: Optional[Dict] = None
) -> jnp.ndarray:
    """audio (B, T) with T % hop == 0 -> codes (B, T/hop) int32."""
    dtype = jnp.dtype(cfg.compute_dtype)
    b, t = audio.shape
    enc = params["encoder"]
    if cfg.frontend == "conv":
        x = _conv_downsample(
            enc["conv"]["stages"], audio[..., None].astype(dtype), cfg.conv_ratios
        )
    else:
        frames = audio.reshape(b, t // cfg.hop_length, cfg.hop_length).astype(dtype)
        x = jnp.dot(frames, enc["patch_embed"], preferred_element_type=jnp.float32).astype(dtype) + enc["patch_bias"]
    x = _transformer(x, enc["blocks"], cfg)
    x = _norm(x, enc["out_norm"], enc.get("out_norm_b"), cfg)
    z_e = jnp.dot(x, enc["out_proj"], preferred_element_type=jnp.float32)  # (B, F, d) f32
    if enc.get("out_proj_b") is not None:
        z_e = z_e + enc["out_proj_b"].astype(jnp.float32)
    if tables is not None:
        prepared = (tables["cbt"], tables["halfnorm"], cfg.codebook_size)
        codes = nearest_code(z_e.reshape(-1, z_e.shape[-1]), prepared=prepared)
    else:
        cb = projected_codebook(params)
        codes = nearest_code(z_e.reshape(-1, z_e.shape[-1]), cb)
    return codes.reshape(b, -1)


def decode_frames(
    params: Dict, codes: jnp.ndarray, cfg: CodecConfig, tables: Optional[Dict] = None
) -> jnp.ndarray:
    """codes (B, F) int32 -> audio (B, F*hop) float32."""
    dtype = jnp.dtype(cfg.compute_dtype)
    cb = tables["cb_proj"] if tables is not None else projected_codebook(params)
    z_q = jnp.take(cb, codes, axis=0)  # (B, F, d) f32
    dec = params["decoder"]
    x = jnp.dot(z_q.astype(dtype), dec["in_proj"], preferred_element_type=jnp.float32).astype(dtype) + dec["in_bias"]
    x = _transformer(x, dec["blocks"], cfg)
    x = _norm(x, dec["out_norm"], dec.get("out_norm_b"), cfg)
    if cfg.frontend == "conv":
        audio = _conv_upsample(
            dec["conv"]["stages"], x, tuple(reversed(cfg.conv_ratios))
        ).astype(jnp.float32)
        return audio[..., 0]
    audio = jnp.dot(x, dec["patch_unembed"], preferred_element_type=jnp.float32)  # (B, F, hop) f32
    if dec.get("patch_unembed_b") is not None:
        audio = audio + dec["patch_unembed_b"].astype(jnp.float32)
    b, f, hop = audio.shape
    return audio.reshape(b, f * hop)


class JaxCodecModel:
    """Stateless wrapper bundling params + config with jitted encode/decode.

    Presents the interface surface the streaming AudioTokenizer needs
    (pad_audio / encode / decode / projected codebook / sample_rate /
    codebook_size), i.e. the TPU-native stand-in for the loaded MagiCodec
    torch module (reference audio_tokenizer.py:26-36, 189-201).
    """

    def __init__(self, params: Dict, config: CodecConfig):
        self.params = params
        self.config = config
        self.sample_rate = config.sample_rate
        self.codebook_size = config.codebook_size
        # quantizer lookup tables precomputed once (projected codebook +
        # padded transpose + half-norms) — NOT per encode/decode call
        self.tables = jax.jit(lambda p: quantizer_tables(p, config))(params)
        self._encode = jax.jit(lambda p, t, a: encode_frames(p, a, config, tables=t))
        self._decode = jax.jit(lambda p, t, c: decode_frames(p, c, config, tables=t))

    @classmethod
    def random_init(cls, config: CodecConfig = None, seed: int = 0) -> "JaxCodecModel":
        config = config or CodecConfig()
        params = init_codec_params(jax.random.PRNGKey(seed), config)
        return cls(params, config)

    @classmethod
    def load(cls, path: str, config: CodecConfig = None) -> "JaxCodecModel":
        """Load a codec checkpoint: a framework-native ``.npz`` (written by
        models/convert.save_codec_checkpoint), a directory containing
        ``codec.npz``, or a torch ``.pt``/``.bin`` MagiCodec state_dict
        (converted through models/convert.codec_params_from_torch; requires
        ``config``). Raises FileNotFoundError/KeyError instead of silently
        random-initializing."""
        import os

        from . import convert

        if os.path.isdir(path):
            npz = os.path.join(path, "codec.npz")
            if not os.path.exists(npz):
                raise FileNotFoundError(f"no codec.npz in checkpoint dir {path}")
            path = npz
        if not os.path.exists(path):
            raise FileNotFoundError(f"codec checkpoint not found: {path}")
        if path.endswith(".npz"):
            params, cfg = convert.load_codec_checkpoint(path)
            return cls(params, cfg)
        if path.endswith((".pt", ".bin", ".pth")):
            import torch

            state_dict = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(state_dict, dict) and "state_dict" in state_dict:
                state_dict = state_dict["state_dict"]
            cfg = config or CodecConfig()
            return cls(convert.codec_params_from_torch(state_dict, cfg), cfg)
        raise ValueError(f"unrecognized codec checkpoint format: {path}")

    def pad_audio(self, audio: np.ndarray) -> np.ndarray:
        return pad_audio(audio, self.config.hop_length)

    def encode(self, audio: np.ndarray) -> np.ndarray:
        """(B, T) float32 -> (B, F) int32 codes; pads to hop multiple."""
        audio = self.pad_audio(np.asarray(audio, dtype=np.float32))
        return np.asarray(self._encode(self.params, self.tables, jnp.asarray(audio)))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(B, F) int codes -> (B, F*hop) float32 audio."""
        codes = jnp.asarray(np.asarray(codes), dtype=jnp.int32)
        return np.asarray(self._decode(self.params, self.tables, codes))

    def get_projected_codebook(self) -> np.ndarray:
        return np.asarray(projected_codebook(self.params))
