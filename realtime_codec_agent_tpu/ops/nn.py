"""Core functional NN ops shared by the codec and the duplex LM.

Everything here is shape-static, jit-friendly, and keeps the heavy matmuls in
bfloat16 on the MXU with float32 accumulation (``preferred_element_type``).
Normalization and softmax statistics are computed in float32.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _use_pallas_int8(x: jnp.ndarray) -> bool:
    """Route decode-shaped int8 matmuls (rows <= 8: frame scan, gen_until,
    eval_and_sample, B<=8 serving micro-steps) to the Pallas fused-dequant
    kernel. These sit inside lax.scan/while_loop bodies where XLA HOISTS a
    plain ``astype(bf16)`` dequant out of the loop — the loop then re-reads
    a full bf16 weight copy per iteration and int8's bandwidth saving
    vanishes. The opaque kernel keeps the int8 read inside the loop.
    Wide-row calls (score/prefill run once, nothing to hoist across)
    measured faster on XLA's dequant+dot. Note the rows<=8 rule also routes
    the 8-row prefill bucket (a non-loop shape) through the kernel; measured
    on-chip the difference is noise, and one rule keeps the program count
    down. RTCA_INT8_PALLAS=0 forces XLA everywhere.

    Measured negative (round 2): widening the rule to rows<=64 so the B=32
    serving micro-step takes the kernel LOST to XLA's route (3946 vs 4107
    tok/s, same window) — at tens of rows the MXU amortizes the dequant and
    XLA's fusion beats the kernel's grid overhead; the hoisting concern only
    bites at single-digit rows. int8 B=32 serving = 4107 tok/s vs 3279 bf16
    on the XLA route this rule already picks."""
    if os.environ.get("RTCA_INT8_PALLAS", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return rows <= 8


def qdot(x: jnp.ndarray, w, out_dtype=None) -> jnp.ndarray:
    """Matmul that transparently handles int8-quantized weights.

    ``w`` is either a raw (in, out) array or a dict ``{"q": int8 (in, out),
    "s": f32 (out,)}`` (per-output-channel symmetric scales, the layout
    produced by models/llama.quantize_params_int8 — the TPU counterpart of
    the reference's q8_0 GGUF deployment artifact, prep_test_model.sh:27-31).
    Wide-output decode matmuls dispatch to the Pallas fused-dequant kernel;
    everything else uses XLA's dequant+dot. Accumulates in f32. NOTE: the
    Pallas kernel casts activations to bf16 while the XLA route keeps them
    in their input dtype, so logits can differ at bf16-epsilon scale between
    the two routes (both are valid quantized-inference numerics)."""
    if isinstance(w, dict) and "q" in w:
        if _use_pallas_int8(x):
            from .int8_matmul import int8_matmul

            y = int8_matmul(x, w["q"], w["s"])
        else:
            y = jnp.dot(
                x, w["q"].astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            y = y * w["s"]
    elif isinstance(w, dict) and "q4" in w:
        # affine int4 groups {"q4","d","m"} (models/llama.quantize_params_int4,
        # exact GGUF Q4_K import) — same routing rule as int8: the opaque
        # kernel for loop-resident decode shapes, XLA dequant+dot elsewhere.
        if _use_pallas_int8(x):
            from .int4_matmul import int4_matmul

            y = int4_matmul(x, w["q4"], w["d"], w["m"])
        else:
            from .int4_matmul import dequant_int4

            y = jnp.dot(
                x,
                dequant_int4(w["q4"], w["d"], w["m"]).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y if out_dtype is None else y.astype(out_dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm (Llama-style: normalize in f32, scale in input dtype)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm in f32 (torch.nn.LayerNorm semantics — the norm flavor of
    flash-attn transformer blocks, which MagiCodec builds on,
    reference magicodec_build.sh:13-16)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def llama3_scaled_inv_freq(
    inv_freq: jnp.ndarray,
    factor: float,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> jnp.ndarray:
    """Llama-3.x rope scaling (HF ``rope_type="llama3"``): long-wavelength
    frequencies divided by ``factor``, short ones untouched, smooth ramp
    between. Required for numeric parity with real Llama-3.2 checkpoints."""
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    wavelen = 2.0 * jnp.pi / inv_freq
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    interp = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = jnp.where(wavelen > low_freq_wavelen, inv_freq / factor, interp)
    return jnp.where(wavelen < high_freq_wavelen, inv_freq, out)


def rope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float = 10000.0,
    rope_scaling: Optional[Tuple[float, float, float, int]] = None,
    interleaved: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotary embedding tables for integer positions ``(...,)`` ->
    cos/sin of shape ``(..., head_dim)``. ``interleaved=False`` duplicates
    each frequency across the two halves (HF Llama layout);
    ``interleaved=True`` duplicates adjacently (GPT-J / flash-attn layout).
    ``rope_scaling`` = (factor, low_freq_factor, high_freq_factor,
    original_max_position) enables llama3-style frequency scaling."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if rope_scaling is not None and rope_scaling[0] > 0:
        inv_freq = llama3_scaled_inv_freq(inv_freq, *rope_scaling)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., head_dim/2)
    if interleaved:
        emb = jnp.repeat(freqs, 2, axis=-1)
    else:
        emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def _rotate_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """(x0,x1,x2,x3,...) -> (-x1,x0,-x3,x2,...): GPT-J / flash-attn
    ``interleaved=True`` rotation pairing adjacent dims."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    interleaved: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding. q/k: (..., T, H, Dh); cos/sin: (..., T, Dh).

    ``interleaved=False`` is the half-split GPT-NeoX/Llama layout (cos/sin
    from rope_cos_sin, each frequency duplicated across the two halves);
    ``interleaved=True`` pairs adjacent dims (GPT-J / flash-attn
    ``RotaryEmbedding(interleaved=True)``) and expects cos/sin with each
    frequency duplicated adjacently (rope_cos_sin(..., interleaved=True))."""
    rot = _rotate_interleaved if interleaved else _rotate_half
    cos = cos[..., :, None, :].astype(jnp.float32)
    sin = sin[..., :, None, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rot(qf) * sin
    k_out = kf * cos + rot(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, S, KH, Dh) -> (B, S, KH*n_rep, Dh) for grouped-query attention."""
    if n_rep == 1:
        return x
    b, s, kh, dh = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, kh, n_rep, dh))
    return x.reshape(b, s, kh * n_rep, dh)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: (B, Tq, H, Dh); k/v: (B, Tk, H, Dh); mask: broadcastable to (B, H, Tq, Tk)
    with True = attend. Softmax in f32. XLA fuses this well on TPU; a Pallas
    flash kernel can be slotted in for long prefill without changing callers.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def flash_causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,  # (B, T) key validity (padding mask)
    block: int = 1024,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal self-attention with online softmax over key blocks — never
    materializes the (T, T) score matrix (at T=8k that is ~8 GB in f32 per
    head group). q/k/v: (B, T, H, Dh); softmax statistics in f32."""
    b, t, h, dh = q.shape
    if scale is None:
        scale = dh ** -0.5
    neg = jnp.float32(-1e30)
    n_blocks = -(-t // block)
    t_pad = n_blocks * block
    pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
    kp = jnp.pad(k, pad) if t_pad != t else k
    vp = jnp.pad(v, pad) if t_pad != t else v
    validp = None
    if valid is not None:
        validp = jnp.pad(valid, [(0, 0), (0, t_pad - t)]) if t_pad != t else valid
    kb = kp.reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    vb = vp.reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    q_pos = jnp.arange(t)

    def blk(carry, inputs):
        m, l, acc = carry
        if validp is not None:
            k_blk, v_blk, blk_idx, val_blk = inputs
        else:
            k_blk, v_blk, blk_idx = inputs
            val_blk = None
        key_pos = blk_idx * block + jnp.arange(block)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale  # (B,H,T,block)
        mask = key_pos[None, :] <= q_pos[:, None]
        if val_blk is not None:
            mask = mask & val_blk[:, None, None, :].astype(bool)
        else:
            mask = mask[None, None]
        s = jnp.where(mask if mask.ndim == 4 else mask[None, None], s, neg)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhqk,bkhd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr + pv
        return (m_new, l, acc), None

    m0 = jnp.full((b, h, t, 1), neg, jnp.float32)
    l0 = jnp.zeros((b, h, t, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, t, dh), jnp.float32)
    xs = (kb, vb, jnp.arange(n_blocks))
    if validp is not None:
        xs = xs + (validp.reshape(b, n_blocks, block).transpose(1, 0, 2),)
    (m, l, acc), _ = jax.lax.scan(blk, (m0, l0, acc0), xs)
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (B,T,H,Dh)


def causal_mask(tq: int, tk: int, q_offset) -> jnp.ndarray:
    """(1, 1, tq, tk) boolean mask: query at absolute pos q_offset+i attends keys <= that pos."""
    q_pos = q_offset + jnp.arange(tq)[:, None]
    k_pos = jnp.arange(tk)[None, :]
    return (k_pos <= q_pos)[None, None]


def swiglu_mlp(x: jnp.ndarray, w_gate, w_up, w_down) -> jnp.ndarray:
    """Llama SwiGLU MLP: down( silu(x@gate) * (x@up) ). Accepts raw or
    int8-quantized weights (qdot)."""
    g = qdot(x, w_gate)
    u = qdot(x, w_up)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    return qdot(h, w_down, out_dtype=x.dtype)


def gelu_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Plain 2-layer GELU MLP (codec transformer blocks, LLaVA-style projector)."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    return (jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(jnp.float32)).astype(x.dtype)
