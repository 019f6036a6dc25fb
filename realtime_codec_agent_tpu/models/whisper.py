"""On-TPU Whisper ASR graph (encoder-decoder) in JAX.

The reference transcribes the user channel with whisper.cpp (C++; reference
realtime_agent_resources.py:36-39, realtime_agent_v2.py:415-430). Here the
whole model runs as jitted JAX programs on the TPU, so external transcription
shares the chip with the duplex LM instead of burning host CPU:

- **log-mel frontend** — framing + rFFT + slaney mel filterbank computed on
  device, numerically matching HF ``WhisperFeatureExtractor`` (itself matching
  openai/whisper's ``log_mel_spectrogram``).
- **encoder** — the two GELU convs (stride 1, then 2) + sinusoidal positions +
  pre-LN transformer, one jitted call over the fixed 30 s / 3000-frame window.
- **decoder** — KV-cached greedy decode as ONE jitted ``lax.while_loop``
  program with a static token buffer: no per-token host round trips. Cross
  K/V are precomputed once per utterance.

Weights convert from any HF ``WhisperForConditionalGeneration`` state_dict
(``whisper_params_from_torch``); geometry comes from the HF config
(``whisper_config_from_hf``). Numerical parity against the torch
implementation is pinned in tests/test_whisper.py.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51864          # *.en models
    d_model: int = 768               # small
    encoder_layers: int = 12
    decoder_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    num_mel_bins: int = 80
    max_source_positions: int = 1500  # 3000 mel frames / conv stride 2
    max_target_positions: int = 448
    sample_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    # greedy-decode control tokens (HF generation_config for *.en models)
    decoder_start_token_id: int = 50257  # <|startoftranscript|>
    eos_token_id: int = 50256            # <|endoftext|>
    no_timestamps_token_id: int = 50362  # <|notimestamps|>
    compute_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def n_audio_samples(self) -> int:
        return self.max_source_positions * 2 * self.hop_length  # 30 s at defaults

    @property
    def n_mel_frames(self) -> int:
        return self.max_source_positions * 2


def whisper_small_en_config(**overrides) -> WhisperConfig:
    return WhisperConfig(**overrides)


def tiny_whisper_config(**overrides) -> WhisperConfig:
    defaults = dict(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        num_heads=2, ffn_dim=128, num_mel_bins=8, max_source_positions=32,
        max_target_positions=24, decoder_start_token_id=250, eos_token_id=251,
        no_timestamps_token_id=252,
    )
    defaults.update(overrides)
    return WhisperConfig(**defaults)


def whisper_config_from_hf(hf_config, **overrides) -> WhisperConfig:
    """Map a transformers.WhisperConfig to this geometry."""
    gen = dict(
        decoder_start_token_id=hf_config.decoder_start_token_id,
        eos_token_id=hf_config.eos_token_id,
    )
    gen.update(overrides)
    return WhisperConfig(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        decoder_layers=hf_config.decoder_layers,
        num_heads=hf_config.encoder_attention_heads,
        ffn_dim=hf_config.encoder_ffn_dim,
        num_mel_bins=hf_config.num_mel_bins,
        max_source_positions=hf_config.max_source_positions,
        max_target_positions=hf_config.max_target_positions,
        **gen,
    )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions (openai/whisper audio.py)."""
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1)


def _init_attn(key, d: int, dtype) -> Dict:
    ks = jax.random.split(key, 4)
    s = 1.0 / math.sqrt(d)
    return {
        # (in, out) layout; k_proj has no bias in Whisper
        "wq": (jax.random.normal(ks[0], (d, d)) * s).astype(dtype),
        "bq": jnp.zeros((d,), dtype),
        "wk": (jax.random.normal(ks[1], (d, d)) * s).astype(dtype),
        "wv": (jax.random.normal(ks[2], (d, d)) * s).astype(dtype),
        "bv": jnp.zeros((d,), dtype),
        "wo": (jax.random.normal(ks[3], (d, d)) * s).astype(dtype),
        "bo": jnp.zeros((d,), dtype),
    }


def _init_ln(d: int, dtype) -> Dict:
    return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _init_mlp(key, d: int, f: int, dtype) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "w1": (jax.random.normal(k1, (d, f)) / math.sqrt(d)).astype(dtype),
        "b1": jnp.zeros((f,), dtype),
        "w2": (jax.random.normal(k2, (f, d)) / math.sqrt(f)).astype(dtype),
        "b2": jnp.zeros((d,), dtype),
    }


def init_whisper_params(key, cfg: WhisperConfig) -> Dict:
    """Random-init the full param pytree as ONE jitted device program.

    Eager per-leaf init dispatches ~480 separate tiny programs; on the
    remote-device tunnel a large big program queued behind that in-flight
    flood can wedge indefinitely (measured: the codec framerate probe after
    an eager whisper init hung >12 min while small independent programs kept
    running — this killed two bench-gate runs). One program = one dispatch.
    """
    return _init_whisper_params_jit(key, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _init_whisper_params_jit(key, cfg: WhisperConfig) -> Dict:
    dtype = jnp.dtype(cfg.compute_dtype)
    d, f = cfg.d_model, cfg.ffn_dim
    keys = jax.random.split(key, 8 + 3 * (cfg.encoder_layers + cfg.decoder_layers))
    ki = iter(range(len(keys)))

    def nk():
        return keys[next(ki)]

    enc_layers = []
    for _ in range(cfg.encoder_layers):
        enc_layers.append(
            {
                "attn_ln": _init_ln(d, dtype),
                "attn": _init_attn(nk(), d, dtype),
                "mlp_ln": _init_ln(d, dtype),
                "mlp": _init_mlp(nk(), d, f, dtype),
            }
        )
    dec_layers = []
    for _ in range(cfg.decoder_layers):
        dec_layers.append(
            {
                "attn_ln": _init_ln(d, dtype),
                "attn": _init_attn(nk(), d, dtype),
                "cross_ln": _init_ln(d, dtype),
                "cross": _init_attn(nk(), d, dtype),
                "mlp_ln": _init_ln(d, dtype),
                "mlp": _init_mlp(nk(), d, f, dtype),
            }
        )
    return {
        "encoder": {
            "conv1_w": (jax.random.normal(nk(), (3, cfg.num_mel_bins, d)) / math.sqrt(3 * cfg.num_mel_bins)).astype(dtype),
            "conv1_b": jnp.zeros((d,), dtype),
            "conv2_w": (jax.random.normal(nk(), (3, d, d)) / math.sqrt(3 * d)).astype(dtype),
            "conv2_b": jnp.zeros((d,), dtype),
            "pos": jnp.asarray(_sinusoids(cfg.max_source_positions, d), dtype),
            "layers": enc_layers,
            "final_ln": _init_ln(d, dtype),
        },
        "decoder": {
            "embed_tokens": (jax.random.normal(nk(), (cfg.vocab_size, d)) * 0.02).astype(dtype),
            "pos": (jax.random.normal(nk(), (cfg.max_target_positions, d)) * 0.02).astype(dtype),
            "layers": dec_layers,
            "final_ln": _init_ln(d, dtype),
        },
    }


def whisper_params_from_torch(state_dict, cfg: WhisperConfig) -> Dict:
    """HF WhisperForConditionalGeneration state_dict -> param pytree.

    torch Linear stores (out, in); this graph uses (in, out) so every weight
    transposes. Conv1d stores (out, in, k) -> (k, in, out) for lax.conv NWC.
    """

    def t(name):
        w = state_dict[name]
        return jnp.asarray(np.asarray(w.float().numpy() if hasattr(w, "float") else w))

    def lin(prefix, bias=True):
        out = {"w": t(f"{prefix}.weight").T}
        if bias:
            out["b"] = t(f"{prefix}.bias")
        return out

    def attn(prefix):
        return {
            "wq": lin(f"{prefix}.q_proj")["w"], "bq": t(f"{prefix}.q_proj.bias"),
            "wk": lin(f"{prefix}.k_proj", bias=False)["w"],
            "wv": lin(f"{prefix}.v_proj")["w"], "bv": t(f"{prefix}.v_proj.bias"),
            "wo": lin(f"{prefix}.out_proj")["w"], "bo": t(f"{prefix}.out_proj.bias"),
        }

    def ln(prefix):
        return {"w": t(f"{prefix}.weight"), "b": t(f"{prefix}.bias")}

    def mlp(prefix):
        return {
            "w1": lin(f"{prefix}.fc1")["w"], "b1": t(f"{prefix}.fc1.bias"),
            "w2": lin(f"{prefix}.fc2")["w"], "b2": t(f"{prefix}.fc2.bias"),
        }

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        enc_layers.append(
            {
                "attn_ln": ln(f"{p}.self_attn_layer_norm"),
                "attn": attn(f"{p}.self_attn"),
                "mlp_ln": ln(f"{p}.final_layer_norm"),
                "mlp": mlp(p),
            }
        )
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        dec_layers.append(
            {
                "attn_ln": ln(f"{p}.self_attn_layer_norm"),
                "attn": attn(f"{p}.self_attn"),
                "cross_ln": ln(f"{p}.encoder_attn_layer_norm"),
                "cross": attn(f"{p}.encoder_attn"),
                "mlp_ln": ln(f"{p}.final_layer_norm"),
                "mlp": mlp(p),
            }
        )
    return {
        "encoder": {
            "conv1_w": jnp.transpose(t("model.encoder.conv1.weight"), (2, 1, 0)),
            "conv1_b": t("model.encoder.conv1.bias"),
            "conv2_w": jnp.transpose(t("model.encoder.conv2.weight"), (2, 1, 0)),
            "conv2_b": t("model.encoder.conv2.bias"),
            "pos": t("model.encoder.embed_positions.weight"),
            "layers": enc_layers,
            "final_ln": ln("model.encoder.layer_norm"),
        },
        "decoder": {
            "embed_tokens": t("model.decoder.embed_tokens.weight"),
            "pos": t("model.decoder.embed_positions.weight"),
            "layers": dec_layers,
            "final_ln": ln("model.decoder.layer_norm"),
        },
    }


# ---------------------------------------------------------------------------
# Log-mel frontend (WhisperFeatureExtractor semantics)
# ---------------------------------------------------------------------------

def slaney_mel_filters(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None
) -> np.ndarray:
    """Slaney-style mel filterbank, (1 + n_fft//2, n_mels), slaney-normalized —
    identical to transformers.audio_utils.mel_filter_bank(norm="slaney",
    mel_scale="slaney") used by WhisperFeatureExtractor."""
    if fmax is None:
        fmax = sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mels = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mels = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) * (27.0 / np.log(6.4)), mels
        )
        return mels

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)
        return f

    n_freqs = 1 + n_fft // 2
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]  # (n_freqs, n_mels+2)
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalization: scale each filter to unit area
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def log_mel_spectrogram(
    audio: jnp.ndarray, mel_filters: jnp.ndarray, cfg: WhisperConfig
) -> jnp.ndarray:
    """audio (n_samples,) f32 (already padded/trimmed to cfg.n_audio_samples)
    -> (n_mels, n_mel_frames) log-mel, matching WhisperFeatureExtractor:
    centered hann STFT, magnitude^2, mel, log10 clamp, max-8 floor, (x+4)/4."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    padded = jnp.pad(audio, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (padded.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = padded[idx] * window  # (n_frames, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    mag = jnp.abs(spec) ** 2  # (n_frames, n_freqs)
    mag = mag[:-1]  # HF drops the final frame
    mel = mag @ mel_filters  # (n_frames-1, n_mels)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # (n_mels, n_mel_frames)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def _layer_norm(x, ln, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * ln["w"].astype(jnp.float32) + ln["b"].astype(jnp.float32)).astype(x.dtype)


def _mha(q, k, v, nh, mask=None):
    """q (B,Tq,D), k/v (B,Tk,D) already projected; returns (B,Tq,D).
    The 1/sqrt(head_dim) scale is applied by the caller on q (HF semantics)."""
    b, tq, d = q.shape
    tk = k.shape[1]
    dh = d // nh
    qh = q.reshape(b, tq, nh, dh)
    kh = k.reshape(b, tk, nh, dh)
    vh = v.reshape(b, tk, nh, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out.reshape(b, tq, d)


def _self_attn(x, p, nh, scale, mask=None):
    q = (jnp.dot(x, p["wq"]) + p["bq"]) * scale
    k = jnp.dot(x, p["wk"])
    v = jnp.dot(x, p["wv"]) + p["bv"]
    out = _mha(q, k, v, nh, mask=mask)
    return jnp.dot(out, p["wo"]) + p["bo"]


def _mlp(x, p):
    h = jax.nn.gelu(jnp.dot(x, p["w1"]) + p["b1"], approximate=False)
    return jnp.dot(h, p["w2"]) + p["b2"]


def encode(params: Dict, mel: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """mel (B, n_mels, n_mel_frames) -> encoder states (B, T_src, D)."""
    enc = params["encoder"]
    scale = cfg.head_dim ** -0.5
    x = mel.transpose(0, 2, 1)  # (B, frames, n_mels) NWC
    x = jax.lax.conv_general_dilated(
        x, enc["conv1_w"], window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + enc["conv1_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2_w"], window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + enc["conv2_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x + enc["pos"][None, : x.shape[1]]
    for blk in enc["layers"]:
        x = x + _self_attn(_layer_norm(x, blk["attn_ln"]), blk["attn"], cfg.num_heads, scale)
        x = x + _mlp(_layer_norm(x, blk["mlp_ln"]), blk["mlp"])
    return _layer_norm(x, enc["final_ln"])


def cross_kv(params: Dict, enc_states: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute per-layer cross-attention K/V once per utterance:
    (L, B, T_src, D) x2."""
    ks, vs = [], []
    for blk in params["decoder"]["layers"]:
        p = blk["cross"]
        ks.append(jnp.dot(enc_states, p["wk"]))
        vs.append(jnp.dot(enc_states, p["wv"]) + p["bv"])
    return jnp.stack(ks), jnp.stack(vs)


def decode_step(
    params: Dict,
    ids: jnp.ndarray,            # (B, T) new tokens
    positions: jnp.ndarray,      # (T,) absolute target positions
    self_k: jnp.ndarray,         # (L, B, S, D) self-attn cache (read/write)
    self_v: jnp.ndarray,
    cache_len: jnp.ndarray,      # scalar: valid cache entries
    ck: jnp.ndarray,             # (L, B, T_src, D) cross K
    cv: jnp.ndarray,
    cfg: WhisperConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced step over T new tokens against the cached prefix.
    Returns (logits (B, T, V), new self_k, new self_v)."""
    dec = params["decoder"]
    scale = cfg.head_dim ** -0.5
    b, t = ids.shape
    s = self_k.shape[2]
    x = jnp.take(dec["embed_tokens"], ids, axis=0) + dec["pos"][positions][None]
    key_pos = jnp.arange(s)[None, :]
    q_pos = positions[:, None]
    # causal over (cache ++ self): cache index i holds position i
    mask = ((key_pos <= q_pos) & (key_pos < cache_len + t))[None, None]
    for li, blk in enumerate(dec["layers"]):
        p = blk["attn"]
        y = _layer_norm(x, blk["attn_ln"])
        q = (jnp.dot(y, p["wq"]) + p["bq"]) * scale
        k = jnp.dot(y, p["wk"])
        v = jnp.dot(y, p["wv"]) + p["bv"]
        k_full = jax.lax.dynamic_update_slice(self_k[li], k, (0, cache_len, 0))
        v_full = jax.lax.dynamic_update_slice(self_v[li], v, (0, cache_len, 0))
        self_k = self_k.at[li].set(k_full)
        self_v = self_v.at[li].set(v_full)
        attn = _mha(q, k_full, v_full, cfg.num_heads, mask=mask)
        x = x + (jnp.dot(attn, p["wo"]) + p["bo"])
        cp = blk["cross"]
        y = _layer_norm(x, blk["cross_ln"])
        cq = (jnp.dot(y, cp["wq"]) + cp["bq"]) * scale
        attn = _mha(cq, ck[li], cv[li], cfg.num_heads)
        x = x + (jnp.dot(attn, cp["wo"]) + cp["bo"])
        x = x + _mlp(_layer_norm(x, blk["mlp_ln"]), blk["mlp"])
    x = _layer_norm(x, dec["final_ln"])
    logits = jnp.dot(x, dec["embed_tokens"].T, preferred_element_type=jnp.float32)
    return logits, self_k, self_v


def greedy_decode(
    params: Dict,
    enc_states: jnp.ndarray,     # (B=1, T_src, D)
    start_ids: jnp.ndarray,      # (n_start,) forced prompt (sot, [notimestamps], ...)
    cfg: WhisperConfig,
    max_new_tokens: int,
    suppress_ids: Optional[jnp.ndarray] = None,  # (n_sup,) never sampled
    begin_suppress_ids: Optional[jnp.ndarray] = None,  # masked at step 0 only
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode as one on-device while_loop. Returns (tokens
    (max_new_tokens,) padded with eos, n_generated). Matches HF greedy
    (do_sample=False) token-for-token given the same start ids and the
    checkpoint generation_config's suppress/begin_suppress token lists."""
    dec_cap = int(start_ids.shape[0]) + max_new_tokens
    if dec_cap > cfg.max_target_positions:
        raise ValueError(
            f"start+max_new={dec_cap} exceeds max_target_positions={cfg.max_target_positions}"
        )
    ck, cv = cross_kv(params, enc_states)
    dtype = jnp.dtype(cfg.compute_dtype)
    l, b = cfg.decoder_layers, enc_states.shape[0]
    self_k = jnp.zeros((l, b, dec_cap, cfg.d_model), dtype)
    self_v = jnp.zeros((l, b, dec_cap, cfg.d_model), dtype)

    n_start = start_ids.shape[0]
    logits, self_k, self_v = decode_step(
        params, start_ids[None], jnp.arange(n_start), self_k, self_v,
        jnp.int32(0), ck, cv, cfg,
    )
    last = logits[0, -1]

    def pick(logits_row, first: bool = False):
        if suppress_ids is not None and suppress_ids.shape[0] > 0:
            logits_row = logits_row.at[suppress_ids].set(-jnp.inf)
        if first and begin_suppress_ids is not None and begin_suppress_ids.shape[0] > 0:
            logits_row = logits_row.at[begin_suppress_ids].set(-jnp.inf)
        return jnp.argmax(logits_row).astype(jnp.int32)

    out0 = jnp.full((max_new_tokens,), cfg.eos_token_id, jnp.int32)
    tok0 = pick(last, first=True)
    out0 = out0.at[0].set(tok0)

    def cond(state):
        i, tok, *_ = state
        return (i < max_new_tokens) & (tok != cfg.eos_token_id)

    def body(state):
        i, tok, out, sk, sv = state
        logits, sk, sv = decode_step(
            params, tok[None, None], jnp.array([n_start]) + i - 1, sk, sv,
            n_start + i - 1, ck, cv, cfg,
        )
        nxt = pick(logits[0, -1])
        out = out.at[i].set(nxt)
        return (i + 1, nxt, out, sk, sv)

    i, tok, out, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), tok0, out0, self_k, self_v)
    )
    n_gen = jnp.where(tok == cfg.eos_token_id, i - 1, i)
    return out, n_gen


class JaxWhisperModel:
    """Bundles params + config with jitted mel/encode/decode programs.

    ``transcribe_ids(audio)`` runs the full pipeline (pad/trim -> log-mel ->
    encoder -> greedy while_loop) in three device calls and returns raw token
    ids; text decoding needs a tokenizer (agent/asr.JaxWhisperASR)."""

    def __init__(
        self,
        params: Dict,
        config: WhisperConfig,
        max_new_tokens: int = 128,
        suppress_ids: Optional[List[int]] = None,
        begin_suppress_ids: Optional[List[int]] = None,
        window_secs: Optional[List[float]] = None,
    ):
        self.params = params
        self.config = config
        self.max_new_tokens = max_new_tokens
        # checkpoint generation_config defaults (HF applies these in generate;
        # without them transcripts can contain non-speech artifacts)
        self.default_suppress_ids = list(suppress_ids or [])
        self.default_begin_suppress_ids = list(begin_suppress_ids or [])
        # Bucketed encoder windows: Whisper's canonical window is a fixed
        # 30 s (audio is zero-padded to it; the encoder attends the padding),
        # which costs the full 1500-position encoder pass even for a 2 s
        # utterance. window_secs=[5, 10, 30] pads to the smallest bucket
        # instead — the encoder's sinusoidal/learned positions slice to the
        # shorter length (same as HF's encoder for short inputs), trading the
        # exact padded-window semantics for a ~6x cheaper encode on short
        # transcriptions. None = always the canonical full window (the
        # reference's whisper.cpp behavior, realtime_agent_v2.py:415-430).
        if window_secs is not None:
            window_secs = sorted(window_secs)
            full = config.n_audio_samples / config.sample_rate
            self.window_samples = [
                min(int(w * config.sample_rate), config.n_audio_samples)
                for w in window_secs
            ]
            if self.window_samples[-1] < config.n_audio_samples:
                self.window_samples.append(config.n_audio_samples)
            del full
        else:
            self.window_samples = [config.n_audio_samples]
        self.mel_filters = jnp.asarray(
            slaney_mel_filters(
                config.sample_rate, config.n_fft, config.num_mel_bins,
                fmax=min(8000.0, config.sample_rate / 2.0),
            )
        )
        cfg = config
        self._mel = jax.jit(lambda a: log_mel_spectrogram(a, self.mel_filters, cfg))
        self._encode = jax.jit(lambda p, m: encode(p, m, cfg))
        self._greedy = jax.jit(
            lambda p, e, s, sup, bsup: greedy_decode(
                p, e, s, cfg, max_new_tokens, suppress_ids=sup,
                begin_suppress_ids=bsup,
            )
        )

    @classmethod
    def from_hf(
        cls, hf_model, max_new_tokens: int = 128,
        window_secs: Optional[List[float]] = None, **config_overrides,
    ) -> "JaxWhisperModel":
        """Convert a transformers WhisperForConditionalGeneration instance,
        carrying over the generation_config's suppress/begin_suppress token
        lists (HF applies them in generate; the reference's whisper.cpp has
        equivalent defaults)."""
        cfg = whisper_config_from_hf(hf_model.config, **config_overrides)
        params = whisper_params_from_torch(hf_model.state_dict(), cfg)
        gen_cfg = getattr(hf_model, "generation_config", None)
        sup = list(getattr(gen_cfg, "suppress_tokens", None) or [])
        bsup = list(getattr(gen_cfg, "begin_suppress_tokens", None) or [])
        return cls(
            params, cfg, max_new_tokens=max_new_tokens,
            suppress_ids=sup, begin_suppress_ids=bsup, window_secs=window_secs,
        )

    def features(self, audio: np.ndarray) -> jnp.ndarray:
        """Pad/trim to the smallest window bucket and compute
        (1, n_mels, frames). With the default single full-size bucket this is
        the canonical 30 s pad."""
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        n = next(
            (w for w in self.window_samples if audio.shape[0] <= w),
            self.window_samples[-1],
        )
        if audio.shape[0] < n:
            audio = np.pad(audio, (0, n - audio.shape[0]))
        else:
            audio = audio[:n]
        return self._mel(jnp.asarray(audio))[None]

    def transcribe_ids(
        self,
        audio: np.ndarray,
        start_ids: Optional[List[int]] = None,
        suppress_ids: Optional[List[int]] = None,
    ) -> List[int]:
        cfg = self.config
        if start_ids is None:
            start_ids = [cfg.decoder_start_token_id, cfg.no_timestamps_token_id]
        if suppress_ids is None:
            suppress_ids = self.default_suppress_ids
        mel = self.features(audio)
        enc_states = self._encode(self.params, mel)
        sup = jnp.asarray(suppress_ids or [], jnp.int32)
        bsup = jnp.asarray(self.default_begin_suppress_ids or [], jnp.int32)
        out, n_gen = self._greedy(
            self.params, enc_states, jnp.asarray(start_ids, jnp.int32), sup, bsup
        )
        n = int(n_gen)
        return [int(t) for t in np.asarray(out)[:n]]
