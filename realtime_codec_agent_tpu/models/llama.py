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
import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops import nn

# queries shorter than this take the one-shot attention (whole cache in one
# einsum); longer ones take the flash key-block scan bounded by the valid
# range. Tunable for experiments via RTCA_FLASH_MIN_T.
_FLASH_DECODE_MIN_T = int(__import__("os").environ.get("RTCA_FLASH_MIN_T", "9"))


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
    # llama3-style rope scaling (factor 0 = disabled). Real Llama-3.2
    # checkpoints ship rope_scaling{rope_type=llama3, factor=32} — required
    # for numeric parity when importing HF weights (models/convert.py).
    rope_scaling_factor: float = 0.0
    rope_scaling_low_freq: float = 1.0
    rope_scaling_high_freq: float = 4.0
    rope_scaling_original_max_position: int = 8192
    rms_eps: float = 1e-5
    max_context: int = 16384
    tie_embeddings: bool = False
    # Qwen2-family geometry: biases on the q/k/v projections only (o_proj
    # and the MLP stay bias-free). Llama-family checkpoints keep this off.
    attn_bias: bool = False
    # codec embedding bridge (CodecLlamaConfig, reference codec_llama.py:14-29)
    codec_vocab_start: int = 0  # 0 => vanilla model, no codec routing
    num_codebooks: int = 1
    codebook_size: int = 131072
    codebook_dim: int = 16
    compute_dtype: str = "bfloat16"
    # rematerialize per-layer activations on the backward pass (training):
    # trades ~30% more FLOPs for O(layers) less activation memory — the
    # standard TPU recipe for fitting 1B-scale training on few chips
    remat: bool = False
    # "full" recomputes the whole layer body on backward; "dots" saves
    # matmul outputs (jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    # and recomputes only the cheap elementwise work — more activation
    # memory, ~one forward of FLOPs saved per step; "attn" saves only the
    # per-layer attention context — the backward skips re-running the
    # quadratic-in-T flash scan at L x B x T x Hq x 2 bytes of residency
    remat_policy: str = "full"

    @property
    def rope_scaling(self):
        if self.rope_scaling_factor <= 0:
            return None
        return (
            self.rope_scaling_factor,
            self.rope_scaling_low_freq,
            self.rope_scaling_high_freq,
            self.rope_scaling_original_max_position,
        )

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
        # real Llama-3.2-1B ships rope_scaling{rope_type=llama3, factor=32}
        rope_scaling_factor=32.0,
        codec_vocab_start=codec_vocab_start,
        **overrides,
    )


_QWEN25_GEOMETRIES = {
    # hidden, intermediate, layers, heads, kv_heads, tied
    "0.5b": (896, 4864, 24, 14, 2, True),
    "1.5b": (1536, 8960, 28, 12, 2, True),
    "3b": (2048, 11008, 36, 16, 2, True),
    "7b": (3584, 18944, 28, 28, 4, False),
}


def qwen25_config(variant: str, vocab_size: int, codec_vocab_start: int = 0, **overrides) -> DuplexLMConfig:
    """Qwen2.5 geometry (alternative duplex-LM base family). Same graph as
    Llama except q/k/v biases (``attn_bias``), rope theta 1e6, no llama3
    rope scaling; real checkpoints load via convert.load_hf_llama /
    gguf.load_gguf_llama, which detect the family from config.json /
    GGUF arch metadata — this helper pins the published geometries."""
    h, inter, layers, heads, kv, tied = _QWEN25_GEOMETRIES[variant.lower()]
    return DuplexLMConfig(
        vocab_size=vocab_size,
        hidden_size=h,
        intermediate_size=inter,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=h // heads,
        rope_theta=1000000.0,
        rms_eps=1e-6,
        tie_embeddings=tied,
        attn_bias=True,
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
    """Random-init the full param pytree as ONE jitted device program
    (eager per-leaf init floods the remote-device tunnel with ~150 tiny
    in-flight programs; a big program queued behind such a flood can wedge
    indefinitely — see models/whisper.init_whisper_params)."""
    return _init_lm_params_jit(key, cfg, with_codec_embed)


@functools.partial(jax.jit, static_argnames=("cfg", "with_codec_embed"))
def _init_lm_params_jit(key, cfg: DuplexLMConfig, with_codec_embed: bool) -> Dict:
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
        if cfg.attn_bias:
            layers[-1]["bq"] = jnp.zeros((cfg.q_dim,), dtype)
            layers[-1]["bk"] = jnp.zeros((cfg.kv_dim,), dtype)
            layers[-1]["bv"] = jnp.zeros((cfg.kv_dim,), dtype)
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


def stack_layer_params(params: Dict) -> Dict:
    """Per-layer list-of-dicts -> one dict of (L, ...) stacked arrays.

    The scan-over-layers TRAINING layout: ``forward`` then runs the layer
    body once under ``lax.scan`` instead of unrolling L copies, which (a)
    compiles one layer body instead of L, and (b) collapses the param pytree
    from O(9*L) leaves to 9 — on dispatch-overhead-bound backends (the axon
    device tunnel charges per argument leaf) that alone is a ~10x train-step
    wall-time win. Inference keeps the unrolled list layout (the decode
    programs index layers for the read-only-cache attention)."""
    layers = params["layers"]
    if isinstance(layers, dict):
        return params
    keys = layers[0].keys()
    out = dict(params)
    out["layers"] = {k: jnp.stack([blk[k] for blk in layers]) for k in keys}
    return out


def unstack_layer_params(params: Dict) -> Dict:
    """Inverse of stack_layer_params (checkpoint -> inference layout)."""
    layers = params["layers"]
    if isinstance(layers, list):
        return params
    n = next(iter(layers.values())).shape[0]
    out = dict(params)
    out["layers"] = [{k: v[i] for k, v in layers.items()} for i in range(n)]
    return out


def fuse_lm_params_for_decode(params: Dict) -> Dict:
    """Concat per-layer Q/K/V and gate/up projection weights along the output
    axis: each decode layer then runs 4 matmuls (qkv, wo, gate|up, down)
    instead of 7. At decode-time T (1-3 tokens) every matmul is a skinny
    GEMV whose cost is dominated by per-op ramp-up, so fewer/wider ops track
    the HBM roofline better; results are column-identical to the unfused
    layout. Accepts raw arrays or int8 {"q","s"} leaves (concat q on the
    output axis, s end-to-end). The trainer keeps the canonical unfused
    layout; converters emit unfused and inference fuses once at load
    (agent/resources.py)."""

    def cat(ws):
        if isinstance(ws[0], dict) and "q" in ws[0]:
            return {
                "q": jnp.concatenate([w["q"] for w in ws], axis=1),
                "s": jnp.concatenate([w["s"] for w in ws], axis=0),
            }
        if isinstance(ws[0], dict) and "q4" in ws[0]:
            # int4 leaves: q4 (K/2, N), d/m (K/G, N) all concat on the
            # output axis — column-identical to fusing then quantizing.
            return {k: jnp.concatenate([w[k] for w in ws], axis=1) for k in ("q4", "d", "m")}
        return jnp.concatenate(list(ws), axis=1)

    out = dict(params)
    layers = []
    for blk in params["layers"]:
        if "wqkv" in blk:
            layers.append(blk)
            continue
        nblk = {
            k2: v2
            for k2, v2 in blk.items()
            if k2 not in ("wq", "wk", "wv", "w_gate", "w_up", "bq", "bk", "bv")
        }
        nblk["wqkv"] = cat([blk["wq"], blk["wk"], blk["wv"]])
        nblk["w_gu"] = cat([blk["w_gate"], blk["w_up"]])
        if "bq" in blk:
            nblk["bqkv"] = jnp.concatenate([blk["bq"], blk["bk"], blk["bv"]])
        layers.append(nblk)
    out["layers"] = layers
    return out


def _attn_qkv(y, blk, cfg: DuplexLMConfig, dtype):
    """Project y to (q, k, v), transparently handling the fused layout and
    optional Qwen2-style q/k/v biases (``bq``/``bk``/``bv``, fused
    ``bqkv``)."""
    if "wqkv" in blk:
        qkv = nn.qdot(y, blk["wqkv"], out_dtype=dtype)
        if "bqkv" in blk:
            qkv = qkv + blk["bqkv"].astype(dtype)
        q = qkv[..., : cfg.q_dim]
        k = qkv[..., cfg.q_dim : cfg.q_dim + cfg.kv_dim]
        v = qkv[..., cfg.q_dim + cfg.kv_dim :]
        return q, k, v
    q = nn.qdot(y, blk["wq"], out_dtype=dtype)
    k = nn.qdot(y, blk["wk"], out_dtype=dtype)
    v = nn.qdot(y, blk["wv"], out_dtype=dtype)
    if "bq" in blk:
        q = q + blk["bq"].astype(dtype)
        k = k + blk["bk"].astype(dtype)
        v = v + blk["bv"].astype(dtype)
    return q, k, v


def _mlp(y, blk, dtype):
    """SwiGLU MLP, transparently handling the fused gate|up layout."""
    if "w_gu" in blk:
        gu = nn.qdot(y, blk["w_gu"])
        g, u = jnp.split(gu, 2, axis=-1)
        h = (jax.nn.silu(g) * u).astype(dtype)
        return nn.qdot(h, blk["w_down"], out_dtype=dtype)
    return nn.swiglu_mlp(y, blk["w_gate"], blk["w_up"], blk["w_down"])


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

def transformer_layer(
    x: jnp.ndarray,  # (B, T, H)
    blk: Dict,
    cfg: DuplexLMConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # (.., T, T) bool, used at T <= 512
    attn_valid: Optional[jnp.ndarray] = None,  # (B, T) key validity, flash path
) -> jnp.ndarray:
    """One pre-norm decoder layer in training/scoring mode (full causal
    self-attention within the block, no KV cache). Shared by ``forward``'s
    layer loop and the pipeline-parallel stage body (parallel/pipeline.py).
    Long blocks (T > 512) take the flash key-block scan so the (T, T) score
    tensor is never materialized."""
    b, t = x.shape[0], x.shape[1]
    dtype = x.dtype
    res = x
    y = nn.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
    q, k, v = _attn_qkv(y, blk, cfg, dtype)
    q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    q, k = nn.apply_rope(q, k, cos, sin)
    if t > 512:
        # long causal self-attention (teacher-forced scoring, training):
        # Pallas flash kernel on TPU, XLA key-block scan elsewhere — neither
        # materializes the (T,T) scores (ops/nn.train_attention)
        attn = nn.train_attention(
            q,
            nn.repeat_kv(k, cfg.n_rep),
            nn.repeat_kv(v, cfg.n_rep),
            valid=attn_valid,
        )
    else:
        attn = nn.attention(
            q, nn.repeat_kv(k, cfg.n_rep), nn.repeat_kv(v, cfg.n_rep), mask=mask
        )
    # named for the "attn" selective-remat policy: saving the (B,T,Hq)
    # attention context per layer means the backward's MLP-branch recompute
    # never re-runs the flash key-block scan (the quadratic-in-T cost), at
    # L x B x T x Hq x 2 bytes of residency — the middle ground between
    # remat="full" (re-runs attention) and "dots" (saves every weight-matmul
    # output; measured OOM at T=2048)
    attn = checkpoint_name(attn, "attn_ctx")
    attn = nn.qdot(attn.reshape(b, t, cfg.q_dim), blk["wo"], out_dtype=dtype)
    x = res + attn
    res = x
    y = nn.rms_norm(x, blk["mlp_norm"], cfg.rms_eps)
    return res + _mlp(y, blk, dtype)


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
    cos, sin = nn.rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, rope_scaling=cfg.rope_scaling
    )

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

    if use_cache:
        new_k, new_v = [], []
        for li, blk in enumerate(params["layers"]):
            res = x
            y = nn.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
            q, k, v = _attn_qkv(y, blk, cfg, dtype)
            q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
            k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
            q, k = nn.apply_rope(q, k, cos, sin)
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
            attn = nn.attention(q, k_att, v_att, mask=mask)
            attn = nn.qdot(attn.reshape(b, t, cfg.q_dim), blk["wo"], out_dtype=dtype)
            x = res + attn
            res = x
            y = nn.rms_norm(x, blk["mlp_norm"], cfg.rms_eps)
            x = res + _mlp(y, blk, dtype)
        x = nn.rms_norm(x, params["final_norm"], cfg.rms_eps)
        return x, (jnp.stack(new_k), jnp.stack(new_v))

    def layer_body(x, blk):
        return transformer_layer(x, blk, cfg, cos, sin, mask=mask, attn_valid=attn_mask)

    if cfg.remat:
        if cfg.remat_policy == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif cfg.remat_policy == "attn":
            # save only the per-layer attention context (checkpoint_name in
            # transformer_layer): the MLP-branch backward recompute skips the
            # flash attention scan — the quadratic-in-T piece full remat pays
            # twice at T>=2048
            policy = jax.checkpoint_policies.save_only_these_names("attn_ctx")
        elif cfg.remat_policy == "flash":
            # save the Pallas flash kernel's OWN residuals (out + softmax
            # l/m stats, named inside ops/nn._flash_pallas_named_fn): the
            # backward's recompute rebuilds q/k/v (norm + matmuls + rope)
            # but never re-runs the flash forward kernel — the remaining
            # recompute tax the "attn" policy still paid. ~1.1 GB residency
            # at B=4 T=2048 (vs "dots" which saves every matmul and OOMs).
            # The names only exist on the Pallas path: off it (CPU, odd T,
            # RTCA_FLASH_IMPL=xla) fall back to the "attn" policy rather
            # than silently saving nothing and rematting the whole layer.
            if nn.flash_pallas_active(t):
                policy = jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse", "flash_max"
                )
            else:
                policy = jax.checkpoint_policies.save_only_these_names("attn_ctx")
        else:
            policy = None  # "full": recompute everything
        layer_body = jax.checkpoint(layer_body, policy=policy)
    if isinstance(params["layers"], dict):
        # stacked layout (stack_layer_params): scan the single layer body
        # over the leading layer axis
        x, _ = jax.lax.scan(
            lambda h, blk: (layer_body(h, blk), None), x, params["layers"]
        )
    else:
        for blk in params["layers"]:
            x = layer_body(x, blk)
    x = nn.rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x, None


def logits_from_hidden(params: Dict, hidden: jnp.ndarray, cfg: DuplexLMConfig) -> jnp.ndarray:
    head = params["embed_tokens"].T if cfg.tie_embeddings else params["lm_head"]
    return nn.qdot(hidden, head)


# ---------------------------------------------------------------------------
# Decode-path forward: read-only cache + small new-KV, in-place commit
# ---------------------------------------------------------------------------
#
# The KV-cached mode of ``forward`` rebuilds the full stacked cache through
# per-layer dynamic_update_slice + jnp.stack, which XLA cannot alias onto the
# donated input (the unstack->update->restack defeats buffer reuse), so every
# decode step copied the whole ~600 MB cache — and inside a lax.scan carry it
# was copied per frame. ``forward_decode`` never writes the big cache: it
# attends the cache READ-ONLY (two-piece attention: cache scores + new-token
# scores concatenated before one softmax) and returns the new per-layer K/V
# as a small (L,B,T,KH,Dh) tensor. The caller commits once per jit with
# ``commit_kv`` (contiguous) or ``commit_kv_scatter`` (frame-accept masks),
# both of which XLA aliases in place on donated buffers.

def _gqa_two_piece_attention(
    q: jnp.ndarray,        # (B, T, H, Dh) rotated queries
    k_big: jnp.ndarray,    # (B, S, KH, Dh) read-only cache keys
    v_big: jnp.ndarray,    # (B, S, KH, Dh)
    k_new: jnp.ndarray,    # (B, W, KH, Dh) rotated new keys (extra + self)
    v_new: jnp.ndarray,    # (B, W, KH, Dh)
    q_pos: jnp.ndarray,    # (Bq, T) absolute positions of queries, Bq in {1, B}
    new_pos: jnp.ndarray,  # (Bn, W) absolute positions of new keys
    cache_valid: jnp.ndarray,  # (Bc,): cache indices >= this are stale, per row
) -> jnp.ndarray:
    """Joint softmax over cache + new keys without materializing either a
    concatenated key tensor or head-repeated (GQA) copies of the cache.
    Positions/validity are per-row (broadcast from size-1 leading dims), so
    the batched serving engine can decode rows at independent offsets.

    Small T (decode / fused frame steps): one-shot scores over the full cache
    — (T, S) fits comfortably. Large T (bucketed prefill, KV rebuild after a
    trim): flash-style online softmax over key blocks so the (T, S) f32 score
    matrix is never materialized (at T=2048 x S=18k it would be ~19 GB of
    traffic per layer)."""
    b, t, h, dh = q.shape
    kh = k_big.shape[2]
    g = h // kh
    scale = dh ** -0.5
    qg = q.reshape(b, t, kh, g, dh)
    neg = jnp.float32(-1e30)
    cv = cache_valid[:, None, None]  # (Bc,1,1)

    s_new = jnp.einsum(
        "btkgd,bwkd->bkgtw", qg, k_new, preferred_element_type=jnp.float32
    ) * scale  # (B,KH,G,T,W)
    m_new = new_pos[:, None, :] <= q_pos[:, :, None]       # (B?,T,W)
    s_new = jnp.where(m_new[:, None, None], s_new, neg)

    s = k_big.shape[1]
    if t < _FLASH_DECODE_MIN_T:
        s_big = jnp.einsum(
            "btkgd,bskd->bkgts", qg, k_big, preferred_element_type=jnp.float32
        ) * scale  # (B,KH,G,T,S)
        big_pos = jnp.arange(s)[None, None, :]
        # cache key at index s holds position s; indices >= cache_valid are
        # stale (rolled back / not yet committed) and must never be attended
        m_big = (big_pos <= q_pos[:, :, None]) & (big_pos < cv)  # (B?,T,S)
        s_big = jnp.where(m_big[:, None, None], s_big, neg)

        s_all = jnp.concatenate([s_big, s_new], axis=-1)
        probs = jax.nn.softmax(s_all, axis=-1)
        p_big = probs[..., :s].astype(v_big.dtype)
        p_new = probs[..., s:].astype(v_new.dtype)
        out = jnp.einsum(
            "bkgts,bskd->btkgd", p_big, v_big, preferred_element_type=jnp.float32
        ) + jnp.einsum(
            "bkgtw,bwkd->btkgd", p_new, v_new, preferred_element_type=jnp.float32
        )
        return out.reshape(b, t, h, dh).astype(q.dtype)

    # ---- flash path: scan key blocks with running (max, denom, acc) ----
    block = 1024
    n_blocks = -(-s // block)
    s_pad = n_blocks * block
    if s_pad != s:
        pad = [(0, 0), (0, s_pad - s), (0, 0), (0, 0)]
        k_big = jnp.pad(k_big, pad)
        v_big = jnp.pad(v_big, pad)
    kb = k_big.reshape(b, n_blocks, block, kh, dh).transpose(1, 0, 2, 3, 4)
    vb = v_big.reshape(b, n_blocks, block, kh, dh).transpose(1, 0, 2, 3, 4)

    def blk(i, carry):
        m, l, acc = carry
        k_blk = jax.lax.dynamic_index_in_dim(kb, i, axis=0, keepdims=False)
        v_blk = jax.lax.dynamic_index_in_dim(vb, i, axis=0, keepdims=False)
        pos = (i * block + jnp.arange(block))[None, None, :]
        sb = jnp.einsum(
            "btkgd,bskd->bkgts", qg, k_blk, preferred_element_type=jnp.float32
        ) * scale  # (B,KH,G,T,block)
        mask = (pos <= q_pos[:, :, None]) & (pos < cv)  # (B?,T,block)
        sb = jnp.where(mask[:, None, None], sb, neg)
        m_new_ = jnp.maximum(m, sb.max(axis=-1, keepdims=True))
        p = jnp.exp(sb - m_new_)
        corr = jnp.exp(m - m_new_)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bkgts,bskd->bkgtd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr + pv
        return (m_new_, l, acc)

    m0 = jnp.full((b, kh, g, t, 1), neg, jnp.float32)
    l0 = jnp.zeros((b, kh, g, t, 1), jnp.float32)
    acc0 = jnp.zeros((b, kh, g, t, dh), jnp.float32)
    # only key blocks a query can actually see: the valid cache never extends
    # past max(q_pos), so blocks beyond that are skipped entirely (dynamic
    # fori_loop bound — a post-trim KV rebuild attends ~1/3 of the cache)
    max_key = jnp.minimum(jnp.max(q_pos), jnp.max(cache_valid) + t)
    n_needed = jnp.minimum(n_blocks, max_key // block + 1).astype(jnp.int32)
    m, l, acc = jax.lax.fori_loop(0, n_needed, blk, (m0, l0, acc0))

    # final block: the new/self keys
    m_fin = jnp.maximum(m, s_new.max(axis=-1, keepdims=True))
    p_new = jnp.exp(s_new - m_fin)
    corr = jnp.exp(m - m_fin)
    l = l * corr + p_new.sum(axis=-1, keepdims=True)
    acc = acc * corr + jnp.einsum(
        "bkgtw,bwkd->bkgtd", p_new.astype(v_new.dtype), v_new,
        preferred_element_type=jnp.float32,
    )
    out = acc / jnp.maximum(l, 1e-30)
    # (B,KH,G,T,Dh) -> (B,T,H,Dh)
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, dh)
    return out.astype(q.dtype)


def forward_decode(
    params: Dict,
    ids: jnp.ndarray,        # (B, T)
    cfg: DuplexLMConfig,
    k_cache: jnp.ndarray,    # (L, B, S, KH, Dh) read-only
    v_cache: jnp.ndarray,
    positions: jnp.ndarray,  # (T,) or per-row (B,T) absolute positions
    cache_valid: Optional[jnp.ndarray] = None,  # scalar or (B,): valid cache length
    extra_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (L,B,We,KH,Dh) x2
    extra_pos: Optional[jnp.ndarray] = None,  # (We,) or (B,We)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Incremental forward over a READ-ONLY cache.

    Attention per layer = cache keys at indices < ``cache_valid`` (defaults to
    the first new-token position: everything before it) + ``extra_kv``
    (uncommitted keys from earlier steps of the same fused program, masked by
    ``extra_pos``) + the T new tokens themselves (causal among ``positions``).
    Positions/validity may be per-row (batched serving: rows decode at
    independent offsets). Returns (hidden (B,T,H), new_k (L,B,T,KH,Dh),
    new_v) — new K/V are NOT written into the cache; commit with
    commit_kv / commit_kv_scatter / commit_kv_rows.
    """
    b, t = ids.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    positions = jnp.asarray(positions)
    if positions.ndim == 1:
        positions = positions[None, :]  # (1, T) broadcasts over rows
    if cache_valid is None:
        cache_valid = positions[:, 0]
    cache_valid = jnp.atleast_1d(jnp.asarray(cache_valid))
    if extra_pos is not None:
        extra_pos = jnp.asarray(extra_pos)
        if extra_pos.ndim == 1:
            extra_pos = extra_pos[None, :]
    x = embed_ids(params, ids, cfg)
    cos, sin = nn.rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, rope_scaling=cfg.rope_scaling
    )

    new_ks, new_vs = [], []
    for li, blk in enumerate(params["layers"]):
        res = x
        y = nn.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _attn_qkv(y, blk, cfg, dtype)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q, k = nn.apply_rope(q, k, cos, sin)
        new_ks.append(k)
        new_vs.append(v)

        if extra_kv is not None:
            k_small = jnp.concatenate([extra_kv[0][li], k], axis=1)
            v_small = jnp.concatenate([extra_kv[1][li], v], axis=1)
            rows = max(extra_pos.shape[0], positions.shape[0])
            small_pos = jnp.concatenate(
                [jnp.broadcast_to(extra_pos, (rows, extra_pos.shape[1])),
                 jnp.broadcast_to(positions, (rows, positions.shape[1]))],
                axis=1,
            )
        else:
            k_small, v_small, small_pos = k, v, positions

        attn = _gqa_two_piece_attention(
            q, k_cache[li], v_cache[li], k_small, v_small, positions, small_pos,
            cache_valid,
        )
        attn = nn.qdot(attn.reshape(b, t, cfg.q_dim), blk["wo"], out_dtype=dtype)
        x = res + attn

        res = x
        y = nn.rms_norm(x, blk["mlp_norm"], cfg.rms_eps)
        x = res + _mlp(y, blk, dtype)

    x = nn.rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x, jnp.stack(new_ks), jnp.stack(new_vs)


def forward_decode_pair(
    params: Dict,
    ids: jnp.ndarray,        # (R, T) one row per independent session
    cfg: DuplexLMConfig,
    k_caches,                # sequence of R read-only caches, each (L, 1, S, KH, Dh)
    v_caches,
    positions: jnp.ndarray,  # (R, T) per-row absolute positions
    cache_valid: jnp.ndarray,  # (R,) per-row valid cache length
    extra_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (L,R,We,KH,Dh) x2
    extra_pos: Optional[jnp.ndarray] = None,  # (R, We)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Incremental forward for R sessions with SEPARATE caches in ONE program.

    AR decode at R=1 is weight-read-bound: every chunk re-reads the full
    model for 3 tokens. Two concurrent sessions (dual-agent self-play,
    lm/pair_session.py) issued as independent programs pay that read twice.
    Here the weight matmuls (qkv/wo/gate|up/down, lm_head by the caller) run
    batched over the R rows — one weight read total — while attention runs
    per row against that row's own cache, so each engine keeps exclusive
    ownership of its cache buffers (commits, rollbacks, trims, and the
    incremental-rebuild machinery are untouched). Per-row outputs are
    bit-identical to R separate forward_decode calls (same contractions per
    row; pinned by tests/test_pair_session.py).

    No reference counterpart: the reference runs self-play as two llama.cpp
    processes on separate GPUs (inference_client_self_play.py:148-159).
    """
    r, t = ids.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    positions = jnp.asarray(positions)
    cache_valid = jnp.asarray(cache_valid)
    x = embed_ids(params, ids, cfg)
    cos, sin = nn.rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, rope_scaling=cfg.rope_scaling
    )

    new_ks, new_vs = [], []
    for li, blk in enumerate(params["layers"]):
        res = x
        y = nn.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q, k, v = _attn_qkv(y, blk, cfg, dtype)  # batched over rows: ONE weight read
        q = q.reshape(r, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(r, t, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(r, t, cfg.num_kv_heads, cfg.head_dim)
        q, k = nn.apply_rope(q, k, cos, sin)
        new_ks.append(k)
        new_vs.append(v)

        attn_rows = []
        for ri in range(r):
            qr = q[ri : ri + 1]
            kr = k[ri : ri + 1]
            vr = v[ri : ri + 1]
            pos_r = positions[ri : ri + 1]
            if extra_kv is not None:
                k_small = jnp.concatenate([extra_kv[0][li, ri : ri + 1], kr], axis=1)
                v_small = jnp.concatenate([extra_kv[1][li, ri : ri + 1], vr], axis=1)
                small_pos = jnp.concatenate([extra_pos[ri : ri + 1], pos_r], axis=1)
            else:
                k_small, v_small, small_pos = kr, vr, pos_r
            attn_rows.append(
                _gqa_two_piece_attention(
                    qr, k_caches[ri][li], v_caches[ri][li], k_small, v_small,
                    pos_r, small_pos, cache_valid[ri : ri + 1],
                )
            )
        attn = jnp.concatenate(attn_rows, axis=0)
        attn = nn.qdot(attn.reshape(r, t, cfg.q_dim), blk["wo"], out_dtype=dtype)
        x = res + attn

        res = x
        y = nn.rms_norm(x, blk["mlp_norm"], cfg.rms_eps)
        x = res + _mlp(y, blk, dtype)

    x = nn.rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x, jnp.stack(new_ks), jnp.stack(new_vs)


def commit_kv(k_cache, v_cache, new_k, new_v, offset):
    """Write (L,B,T,KH,Dh) new K/V at contiguous cache positions
    [offset, offset+T). In-place when k_cache/v_cache are donated."""
    k_cache = jax.lax.dynamic_update_slice(k_cache, new_k, (0, 0, offset, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, new_v, (0, 0, offset, 0, 0))
    return k_cache, v_cache


def commit_kv_scatter(k_cache, v_cache, new_k, new_v, target_idx):
    """Scatter (L,B,W,KH,Dh) new K/V to per-entry cache indices ``target_idx``
    (W,). Rejected entries should point at a trash index past max_context."""
    k_cache = k_cache.at[:, :, target_idx].set(new_k)
    v_cache = v_cache.at[:, :, target_idx].set(new_v)
    return k_cache, v_cache


def commit_kv_rows(k_cache, v_cache, new_k, new_v, offsets):
    """Per-row contiguous commit for batched serving: row b's T new entries
    land at [offsets[b], offsets[b]+T). In-place on donated buffers."""
    b = k_cache.shape[1]
    t = new_k.shape[2]
    rows = jnp.arange(b)[:, None]
    idx = offsets[:, None] + jnp.arange(t)[None, :]  # (B, T)
    k_cache = k_cache.at[:, rows, idx].set(new_k)
    v_cache = v_cache.at[:, rows, idx].set(new_v)
    return k_cache, v_cache


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


# ---------------------------------------------------------------------------
# int8 inference quantization (reference deploys q8_0 GGUF, prep_test_model.sh)
# ---------------------------------------------------------------------------

# decode-path layer matmul leaves eligible for weight quantization
_DECODE_QUANT_NAMES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "wqkv", "w_gu")


def _quant8_leaf(w):
    """Per-output-channel symmetric int8: {"q": int8 (in,out), "s": f32 (out,)}
    consumed transparently by ops/nn.qdot. Already-quantized dict leaves
    (e.g. native GGUF imports) pass through untouched. ONE definition — the
    int8 and int4 deployment paths must quantize the lm_head identically."""
    if isinstance(w, dict):
        return w
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def quantize_params_int8(params: Dict) -> Dict:
    """Per-output-channel symmetric int8 quantization of the decode-path
    matmul weights (attention projections, MLP, lm_head). Embeddings and
    norms stay in the original dtype (gathers read only the needed rows) —
    halving the per-token HBM weight traffic that dominates batch-1 decode."""
    out = dict(params)
    out["layers"] = [
        {
            **blk,
            **{n: _quant8_leaf(blk[n]) for n in _DECODE_QUANT_NAMES if n in blk},
        }
        for blk in params["layers"]
    ]
    if "lm_head" in params:
        out["lm_head"] = _quant8_leaf(params["lm_head"])
    return out


def quantize_params_int4(params: Dict, group: int = 32) -> Dict:
    """Affine int4 quantization of the decode-path layer matmuls — the TPU
    counterpart of the reference's Q4_K_M deployment artifact
    (prep_test_model.sh:33-34). Per-``group``-of-K affine (scale + min)
    quantization, matching Q4_K's 32-element sub-block structure, packed in
    the {"q4", "d", "m"} layout consumed by ops/nn.qdot /
    ops/int4_matmul.int4_matmul (~0.75 B/weight at group=32).

    The lm_head stays int8: Q4_K_M itself keeps output-adjacent tensors at
    higher precision (Q6_K), and the 131k-codec-vocab logits are the
    quality-critical matmul. Embeddings and norms stay dense (gathers read
    only the needed rows). Leaves that are already quantized dicts (native
    GGUF imports) pass through untouched.
    """

    def quant4(w):
        if isinstance(w, dict):
            return w
        wf = jnp.asarray(w, jnp.float32)
        k, n = wf.shape
        if k % group or group % 2:
            raise ValueError(f"int4 group {group} must divide K={k}")
        kg = k // group
        g3 = wf.reshape(kg, group, n)
        wmax = g3.max(axis=1)
        wmin = g3.min(axis=1)
        d = jnp.maximum((wmax - wmin) / 15.0, 1e-12)
        m = -wmin
        q = jnp.clip(jnp.round((g3 + m[:, None, :]) / d[:, None, :]), 0, 15).astype(
            jnp.uint8
        )
        gh = group // 2
        packed = (q[:, :gh, :] | (q[:, gh:, :] << 4)).reshape(k // 2, n)
        return {"q4": packed, "d": d, "m": m}

    out = dict(params)
    out["layers"] = [
        {
            **blk,
            **{n: quant4(blk[n]) for n in _DECODE_QUANT_NAMES if n in blk},
        }
        for blk in params["layers"]
    ]
    if "lm_head" in params:
        out["lm_head"] = _quant8_leaf(params["lm_head"])
    return out
