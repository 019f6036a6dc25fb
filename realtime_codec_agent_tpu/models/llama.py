"""Codec-Llama duplex LM graph in JAX.

Capability rebuild of the reference's two LM stacks:

- the *training* model ``CodecLlamaForCausalLM`` — a Llama with a second,
  frozen codec embedding table plus a trainable LLaVA-style 2-layer GELU
  projector, routing ids ``>= codec_vocab_start`` through the projected codec
  embeddings (reference realtime_codec_agent/codec_llama.py:14-153);
- the *inference* model — the persisted vanilla Llama the reference deploys as
  GGUF F16 through llama.cpp (reference codec_llama.py:178-206,
  prep_test_model.sh:19-34). On TPU no format conversion exists: the same
  param pytree serves training and the jitted decode engine.

Functional style: params are a pytree, ``forward`` is pure, KV cache is an
explicit argument, so the same graph jits for batched training (full causal)
and incremental decode (static-shape cache slices) without divergence.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn


@dataclasses.dataclass(frozen=True)
class DuplexLMConfig:
    vocab_size: int = 259584  # 128256 text + 10 specials (padded) + 131072 codec + pad to /8
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_layers: int = 16
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 64
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    max_context: int = 16384
    tie_embeddings: bool = False
    # codec embedding bridge (CodecLlamaConfig, reference codec_llama.py:14-29)
    codec_vocab_start: int = 0  # 0 => vanilla model, no codec routing
    num_codebooks: int = 1
    codebook_size: int = 131072
    codebook_dim: int = 16
    compute_dtype: str = "bfloat16"

    @property
    def n_rep(self) -> int:
        return self.num_heads // self.num_kv_heads

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


def llama32_1b_config(vocab_size: int, codec_vocab_start: int = 0, **overrides) -> DuplexLMConfig:
    """Llama-3.2-1B geometry (the reference's duplex LM,
    realtime_agent_resources.py:12-25)."""
    return DuplexLMConfig(
        vocab_size=vocab_size,
        hidden_size=2048,
        intermediate_size=8192,
        num_layers=16,
        num_heads=32,
        num_kv_heads=8,
        head_dim=64,
        rope_theta=500000.0,
        codec_vocab_start=codec_vocab_start,
        **overrides,
    )


def tiny_lm_config(vocab_size: int, codec_vocab_start: int = 0, **overrides) -> DuplexLMConfig:
    defaults = dict(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        max_context=512,
        codec_vocab_start=codec_vocab_start,
        codebook_size=1024,
    )
    defaults.update(overrides)
    return DuplexLMConfig(**defaults)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_lm_params(key, cfg: DuplexLMConfig, with_codec_embed: bool = False) -> Dict:
    dtype = jnp.dtype(cfg.compute_dtype)
    h = cfg.hidden_size
    keys = jax.random.split(key, 6 + 4 * cfg.num_layers)
    s = 0.02

    def rnd(k, shape, scale=s):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    layers = []
    for i in range(cfg.num_layers):
        k0, k1, k2, k3 = jax.random.split(keys[6 + i], 4)
        layers.append(
            {
                "attn_norm": jnp.ones((h,), dtype),
                "wq": rnd(k0, (h, cfg.q_dim)),
                "wk": rnd(jax.random.fold_in(k0, 1), (h, cfg.kv_dim)),
                "wv": rnd(jax.random.fold_in(k0, 2), (h, cfg.kv_dim)),
                "wo": rnd(k1, (cfg.q_dim, h)),
                "mlp_norm": jnp.ones((h,), dtype),
                "w_gate": rnd(k2, (h, cfg.intermediate_size)),
                "w_up": rnd(jax.random.fold_in(k2, 1), (h, cfg.intermediate_size)),
                "w_down": rnd(k3, (cfg.intermediate_size, h)),
            }
        )
    params = {
        "embed_tokens": rnd(keys[0], (cfg.vocab_size, h)),
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = rnd(keys[1], (h, cfg.vocab_size))
    if with_codec_embed:
        params["codec_embed"] = init_codec_embed_params(keys[2], cfg)
    return params


def init_codec_embed_params(key, cfg: DuplexLMConfig) -> Dict:
    """Frozen codec table + per-codebook 2-layer GELU projector
    (reference codec_llama.py:32-59)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    h, d = cfg.hidden_size, cfg.codebook_dim
    ks = jax.random.split(key, 1 + 2 * cfg.num_codebooks)
    projectors = []
    for i in range(cfg.num_codebooks):
        projectors.append(
            {
                "w1": (jax.random.normal(ks[1 + 2 * i], (d, h)) / math.sqrt(d)).astype(dtype),
                "b1": jnp.zeros((h,), dtype),
                "w2": (jax.random.normal(ks[2 + 2 * i], (h, h)) / math.sqrt(h)).astype(dtype),
                "b2": jnp.zeros((h,), dtype),
            }
        )
    return {
        "table": jax.random.normal(ks[0], (cfg.num_codebooks * cfg.codebook_size, d)).astype(jnp.float32),
        "projectors": projectors,
    }


# ---------------------------------------------------------------------------
# Embedding (dual-route for CodecLlama training)
# ---------------------------------------------------------------------------

def embed_ids(params: Dict, ids: jnp.ndarray, cfg: DuplexLMConfig) -> jnp.ndarray:
    """Token ids -> hidden states.

    With a codec_embed present, ids >= codec_vocab_start take the frozen codec
    table -> projector path; everything else takes the standard embedding
    (reference codec_llama.py:104-112). Computed branchlessly: both routes are
    gathered/projected and selected, which is how a TPU wants it (no boolean
    scatter; static shapes; the projector matmul batches over all tokens).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    codec = params.get("codec_embed")
    text_ids = ids if codec is None else jnp.minimum(ids, cfg.codec_vocab_start - 1)
    text_emb = jnp.take(params["embed_tokens"], jnp.maximum(text_ids, 0), axis=0)
    if codec is None:
        return text_emb.astype(dtype)

    codec_ids = jnp.clip(ids - cfg.codec_vocab_start, 0, codec["table"].shape[0] - 1)
    z = jnp.take(codec["table"], codec_ids, axis=0).astype(dtype)  # (..., d)
    # per-codebook projector (codebook index = codec_id // codebook_size)
    proj_outs = [
        nn.gelu_mlp(z, p["w1"], p["b1"], p["w2"], p["b2"]) for p in codec["projectors"]
    ]
    if cfg.num_codebooks == 1:
        codec_emb = proj_outs[0]
    else:
        cb_idx = codec_ids // cfg.codebook_size
        stacked = jnp.stack(proj_outs, axis=0)  # (num_cb, ..., h)
        codec_emb = jnp.take_along_axis(
            stacked, cb_idx[None, ..., None], axis=0
        )[0]
    is_codec = (ids >= cfg.codec_vocab_start)[..., None]
    return jnp.where(is_codec, codec_emb, text_emb).astype(dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def forward(
    params: Dict,
    ids: jnp.ndarray,  # (B, T)
    cfg: DuplexLMConfig,
    positions: Optional[jnp.ndarray] = None,  # (B, T) absolute positions
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (L,B,S,KH,Dh) x2
    cache_offset: Optional[jnp.ndarray] = None,  # scalar: write position in cache
    attn_mask: Optional[jnp.ndarray] = None,  # (B, T) validity for training batches
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Returns (hidden_states (B,T,H) after final norm, updated kv_cache).

    Two modes:
    - training / scoring: kv_cache=None, full causal attention within ids.
    - incremental decode: kv_cache given; the T new tokens are written at
      cache_offset and attention runs over cache keys [0, attend_len).
    """
    b, t = ids.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    if positions is None:
        if cache_offset is not None:
            positions = cache_offset + jnp.arange(t)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))

    x = embed_ids(params, ids, cfg)
    cos, sin = nn.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    use_cache = kv_cache is not None
    if use_cache:
        k_cache, v_cache = kv_cache
        s = k_cache.shape[2]
        # query i sits at absolute cache position cache_offset + i and may
        # attend every cache key at position <= its own
        key_pos = jnp.arange(s)[None, :]
        q_pos = cache_offset + jnp.arange(t)[:, None]
        mask = (key_pos <= q_pos)[None, None]  # (1,1,T,S)
    else:
        mask = nn.causal_mask(t, t, 0)
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)

    new_k, new_v = [], []
    for li, blk in enumerate(params["layers"]):
        res = x
        y = nn.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = jnp.dot(y, blk["wq"], preferred_element_type=jnp.float32).astype(dtype)
        k = jnp.dot(y, blk["wk"], preferred_element_type=jnp.float32).astype(dtype)
        v = jnp.dot(y, blk["wv"], preferred_element_type=jnp.float32).astype(dtype)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q, k = nn.apply_rope(q, k, cos, sin)

        if use_cache:
            k_full = jax.lax.dynamic_update_slice(
                k_cache[li], k, (0, cache_offset, 0, 0)
            )
            v_full = jax.lax.dynamic_update_slice(
                v_cache[li], v, (0, cache_offset, 0, 0)
            )
            new_k.append(k_full)
            new_v.append(v_full)
            k_att = nn.repeat_kv(k_full, cfg.n_rep)
            v_att = nn.repeat_kv(v_full, cfg.n_rep)
        else:
            k_att = nn.repeat_kv(k, cfg.n_rep)
            v_att = nn.repeat_kv(v, cfg.n_rep)

        attn = nn.attention(q, k_att, v_att, mask=mask)
        attn = jnp.dot(
            attn.reshape(b, t, cfg.q_dim), blk["wo"], preferred_element_type=jnp.float32
        ).astype(dtype)
        x = res + attn

        res = x
        y = nn.rms_norm(x, blk["mlp_norm"], cfg.rms_eps)
        x = res + nn.swiglu_mlp(y, blk["w_gate"], blk["w_up"], blk["w_down"])

    x = nn.rms_norm(x, params["final_norm"], cfg.rms_eps)
    if use_cache:
        return x, (jnp.stack(new_k), jnp.stack(new_v))
    return x, None


def logits_from_hidden(params: Dict, hidden: jnp.ndarray, cfg: DuplexLMConfig) -> jnp.ndarray:
    head = params["embed_tokens"].T if cfg.tie_embeddings else params["lm_head"]
    return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Embedding bridge (persist path)
# ---------------------------------------------------------------------------

def set_codec_embeddings(params: Dict, codec_table, cfg: DuplexLMConfig) -> Dict:
    """Install the frozen codec table (reference codec_llama.py:166-176)."""
    codec = dict(params["codec_embed"])
    table = jnp.asarray(codec_table, dtype=jnp.float32)
    expected = (cfg.num_codebooks * cfg.codebook_size, cfg.codebook_dim)
    if table.shape != expected:
        raise ValueError(f"codec table must have shape {expected}, got {table.shape}")
    codec["table"] = table
    out = dict(params)
    out["codec_embed"] = codec
    return out


def persist_codec_embeddings(params: Dict, cfg: DuplexLMConfig, batch_size: int = 8192) -> Dict:
    """Bake projected codec vectors into embed_tokens and drop the codec branch,
    yielding a vanilla Llama param pytree (reference codec_llama.py:178-206).

    Unties lm_head first if tied, to avoid lobotomizing the codec region of the
    output head (reference codec_llama.py:179-184).
    """
    out = dict(params)
    if cfg.tie_embeddings and "lm_head" not in out:
        out["lm_head"] = jnp.array(out["embed_tokens"].T)
        cfg = dataclasses.replace(cfg, tie_embeddings=False)

    codec = out["codec_embed"]
    n = cfg.num_codebooks * cfg.codebook_size
    embed = out["embed_tokens"]
    for start in range(0, n, batch_size):
        ids = jnp.arange(start, min(start + batch_size, n)) + cfg.codec_vocab_start
        proj = embed_ids({**out, "codec_embed": codec}, ids, cfg)
        embed = embed.at[ids].set(proj.astype(embed.dtype))
    out["embed_tokens"] = embed
    del out["codec_embed"]
    return out
