"""Core functional NN ops shared by the codec and the duplex LM.

Everything here is shape-static, jit-friendly, and keeps the heavy matmuls in
bfloat16 on the MXU with float32 accumulation (``preferred_element_type``).
Normalization and softmax statistics are computed in float32.
"""
from __future__ import annotations

import functools
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
    head group). q/k/v: (B, T, H, Dh); softmax statistics in f32.

    Differentiation goes through a CUSTOM VJP (FlashAttention-2-style): the
    forward saves only (q, k, v, out, logsumexp) and the backward recomputes
    the block probabilities on the fly. Letting autodiff trace the forward
    scan instead makes lax.scan stack each iteration's f32 (B, H, T, block)
    score/prob residuals — ~1 GB per key block at the 1B recipe (B=4,
    T=2048, H=32) — and that residual traffic, not FLOPs, is what halved
    T=2048 training MFU vs T=1024 (same tokens/step). RTCA_FLASH_VJP=0
    restores the autodiff path for A/B."""
    b, t, h, dh = q.shape
    if scale is None:
        scale = float(dh ** -0.5)
    n_blocks = -(-t // block)
    t_pad = n_blocks * block
    pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
    kp = jnp.pad(k, pad) if t_pad != t else k
    vp = jnp.pad(v, pad) if t_pad != t else v
    # key-side liveness: 1.0 attend / 0.0 masked, applied MULTIPLICATIVELY to
    # the probabilities (never only additively to the scores: for a row whose
    # every key is masked, the running max equals the masked fill value and
    # exp(s - m) would softmax the masked scores' residuals — garbage rows
    # instead of zeros). Padded tail keys sit at positions >= t, which the
    # causal mask already excludes for every query.
    if valid is not None:
        key_live = valid.astype(jnp.float32)
        if t_pad != t:
            key_live = jnp.pad(key_live, [(0, 0), (0, t_pad - t)])
    else:
        key_live = jnp.ones((b, t_pad), jnp.float32)
    if os.environ.get("RTCA_FLASH_VJP", "1") == "0":
        out, _ = _flash_fwd_impl(q, kp, vp, key_live, block, scale, t)
        return out
    return _flash(q, kp, vp, key_live, block, scale, t)


def flash_attention_pallas(
    q: jnp.ndarray,  # (B, T, H, Dh), KV already head-repeated
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,  # (B, T) token validity
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Causal self-attention through jax's stock Pallas TPU FlashAttention
    kernels (fwd + dq/dkv backwards, fused in VMEM).

    Why this exists next to ``flash_causal_attention``: the XLA key-block
    scan materializes its (B, H, T, block) f32 score/prob tensors in HBM on
    every block step — at the 80 s-window training recipe (B=4, T=2048,
    H=32, block=1024) that is ~1 GB written+read per block per direction,
    and the step is HBM-bound well before the MXU saturates (27.5% MFU vs
    38.9% at T=1024, VERDICT r3 item 5). The Pallas kernel keeps
    scores/probs in VMEM, and its ``causal`` grid skips fully-masked key
    blocks (the XLA scan computes every block for every query). Blocks
    default LARGE per the measured per-grid-step overhead on the tunnel
    backend (CLAUDE.md).

    Padding enters as segment ids (pad tokens form their own segment; their
    outputs are garbage but the loss masks them — same contract as the XLA
    path's multiplicative key mask). Token-identical is NOT guaranteed vs
    the XLA path at bf16 epsilon; training metrics are equivalent.
    """
    b, t, h, dh = q.shape
    if scale is None:
        scale = float(dh ** -0.5)
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    seg = None
    if valid is not None:
        s = valid.astype(jnp.int32)
        seg = SegmentIds(q=s, kv=s)
    fn = _flash_pallas_named_fn(float(scale), min(block_q, t), min(block_k, t))
    out = fn(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        seg,
    )
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _flash_pallas_named_fn(sm_scale: float, bq: int, bk: int):
    """The stock Pallas flash kernels behind a custom VJP whose residuals
    (out, softmax l/m stats) carry checkpoint_name tags.

    Why: under layer-level ``jax.checkpoint``, the stock kernel's residuals
    are anonymous intermediates, so even the "attn" selective policy (which
    saves the attention CONTEXT) must re-run the flash FORWARD kernel inside
    the backward to regenerate l/m before the dq/dkv kernels can run. Naming
    them lets the "flash" remat policy (models/llama.py) save exactly these
    cheap residuals — per layer: out (B,T,Hq bf16) + l,m ((B,H,T) f32) —
    and jaxpr DCE then drops the flash forward from the recompute entirely,
    while q/k/v are still rematerialized (norm + matmuls + rope, cheap).
    The bwd replicates jax's stock ``_flash_attention_bwd`` exactly (same
    kernels, same di/ds handling, ab=None); parity vs the stock path is
    checked by scripts/flash_pallas_parity.py."""
    import jax.experimental.pallas.ops.tpu.flash_attention as _fa
    from jax.ad_checkpoint import checkpoint_name as _name

    sizes = _fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )

    def _run(q, k, v, seg, save_residuals):
        return _fa._flash_attention(
            q, k, v, None, seg, save_residuals, True, sm_scale, sizes, False
        )

    @jax.custom_vjp
    def fn(q, k, v, seg):
        return _run(q, k, v, seg, False)

    def fwd(q, k, v, seg):
        o, l, m = _run(q, k, v, seg, True)
        o = _name(o, "flash_out")
        l = _name(l, "flash_lse")
        m = _name(m, "flash_max")
        return o, (q, k, v, seg, o, l, m)

    def bwd(res, do):
        q, k, v, seg, o, l, m = res
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
        dk, dv = _fa._flash_attention_bwd_dkv(
            q, k, v, None, seg, l, m, do, di,
            block_q_major=sizes.block_q_major_dkv,
            block_k_major=sizes.block_k_major_dkv,
            block_k=sizes.block_k_dkv,
            block_q=sizes.block_q_dkv,
            sm_scale=sm_scale, causal=True,
            mask_value=_fa.DEFAULT_MASK_VALUE, debug=False,
        )
        dq, _ds = _fa._flash_attention_bwd_dq(
            q, k, v, None, seg, l, m, do, di,
            block_q_major=sizes.block_q_dq,
            block_k_major=sizes.block_k_major_dq,
            block_k=sizes.block_k_dq,
            sm_scale=sm_scale, causal=True,
            mask_value=_fa.DEFAULT_MASK_VALUE, debug=False,
        )
        return dq, dk, dv, None

    fn.defvjp(fwd, bwd)
    return fn


def flash_pallas_active(t: int) -> bool:
    """True iff a training/scoring block of length ``t`` will take the
    Pallas flash kernel path (transformer_layer routes t > 512 to
    train_attention, which routes to Pallas on TPU at t % 512 == 0 unless
    RTCA_FLASH_IMPL=xla). The 'flash' remat policy keys on this: its saved
    names only exist inside the Pallas wrapper."""
    impl = os.environ.get("RTCA_FLASH_IMPL", "pallas")
    return (
        t > 512
        and t % 512 == 0
        and impl == "pallas"
        and jax.default_backend() == "tpu"
    )


def train_attention(
    q: jnp.ndarray,  # (B, T, H, Dh), KV already head-repeated
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Long-block training/scoring attention: the Pallas flash kernel on TPU
    (RTCA_FLASH_IMPL=xla restores the XLA key-block scan for A/B), the XLA
    scan elsewhere (CPU tests, platforms without Mosaic)."""
    if flash_pallas_active(q.shape[1]):
        return flash_attention_pallas(q, k, v, valid=valid, scale=scale)
    return flash_causal_attention(q, k, v, valid=valid, scale=scale)


def _flash_fwd_impl(q, kp, vp, key_live, block: int, scale: float, t: int):
    """Online-softmax forward over key blocks.

    Returns (out (B,T,H,Dh) in q.dtype, lse (B,H,T,1) f32) where
    ``lse = max + log(sum exp)`` per query row. Fully-masked rows yield
    out = 0 and lse = 0 (their l never leaves 0), so the backward's
    ``exp(s - lse)`` recompute stays finite there."""
    b, t_pad, h, dh = kp.shape
    n_blocks = t_pad // block
    neg = jnp.float32(-1e30)
    kb = kp.reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    vb = vp.reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    live_b = key_live.reshape(b, n_blocks, block).transpose(1, 0, 2)
    q_pos = jnp.arange(t)

    def blk(carry, inputs):
        m, l, acc = carry
        k_blk, v_blk, blk_idx, live_blk = inputs
        key_pos = blk_idx * block + jnp.arange(block)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale  # (B,H,T,block)
        causal = (key_pos[None, :] <= q_pos[:, None])[None, None]
        live = causal & (live_blk > 0)[:, None, None, :]
        s = jnp.where(live, s, neg)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        # multiplicative mask on p: when a row is fully masked, m_new == neg
        # and exp(s - m_new) == 1 at every masked entry — the where keeps
        # l/acc at exactly 0 there instead of averaging garbage
        p = jnp.where(live, jnp.exp(s - m_new), 0.0)
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
    (m, l, acc), _ = jax.lax.scan(
        blk, (m0, l0, acc0), (kb, vb, jnp.arange(n_blocks), live_b)
    )
    l_safe = jnp.maximum(l, 1e-30)
    out = (acc / l_safe).transpose(0, 2, 1, 3).astype(q.dtype)  # (B,T,H,Dh)
    lse = jnp.where(l > 0, m + jnp.log(l_safe), 0.0)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, kp, vp, key_live, block: int, scale: float, t: int):
    return _flash_fwd_impl(q, kp, vp, key_live, block, scale, t)[0]


def _flash_fwd(q, kp, vp, key_live, block: int, scale: float, t: int):
    out, lse = _flash_fwd_impl(q, kp, vp, key_live, block, scale, t)
    return out, (q, kp, vp, key_live, out, lse)


def _flash_bwd(block: int, scale: float, t: int, res, dout):
    """FlashAttention-2 backward: per key block, recompute the normalized
    probabilities from (q, k, lse) and form dV = pᵀ·do, dS = p∘(do·Vᵀ − Δ),
    dQ += dS·K, dK = dSᵀ·Q — everything f32-accumulated, nothing stacked
    across blocks except the (block,…) dK/dV outputs themselves."""
    q, kp, vp, key_live, out, lse = res
    b, t_pad, h, dh = kp.shape
    n_blocks = t_pad // block
    do = dout.astype(jnp.float32)  # (B,T,H,Dh)
    o32 = out.astype(jnp.float32)
    # Δ = rowsum(do ∘ o): (B,T,H) -> (B,H,T,1)
    delta = jnp.sum(do * o32, axis=-1).transpose(0, 2, 1)[..., None]
    kb = kp.reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    vb = vp.reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    live_b = key_live.reshape(b, n_blocks, block).transpose(1, 0, 2)
    q_pos = jnp.arange(t)

    def blk(dq, inputs):
        k_blk, v_blk, blk_idx, live_blk = inputs
        key_pos = blk_idx * block + jnp.arange(block)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale
        causal = (key_pos[None, :] <= q_pos[:, None])[None, None]
        live = causal & (live_blk > 0)[:, None, None, :]
        # normalized probs, (B,H,T,block) f32; multiplicative mask matches the
        # forward exactly (fully-masked rows have lse pinned to 0, where
        # exp(s - lse) alone would not vanish)
        p = jnp.where(live, jnp.exp(s - lse), 0.0)
        dv_blk = jnp.einsum(
            "bhqk,bqhd->bkhd", p, do, preferred_element_type=jnp.float32
        )
        dp = jnp.einsum(
            "bqhd,bkhd->bhqk", do, v_blk, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dq = dq + jnp.einsum(
            "bhqk,bkhd->bqhd", ds, k_blk, preferred_element_type=jnp.float32
        )
        dk_blk = jnp.einsum(
            "bhqk,bqhd->bkhd", ds, q, preferred_element_type=jnp.float32
        )
        return dq, (dk_blk, dv_blk)

    dq0 = jnp.zeros((b, t, h, dh), jnp.float32)
    dq, (dkb, dvb) = jax.lax.scan(
        blk, dq0, (kb, vb, jnp.arange(n_blocks), live_b)
    )
    dkp = dkb.transpose(1, 0, 2, 3, 4).reshape(b, t_pad, h, dh)
    dvp = dvb.transpose(1, 0, 2, 3, 4).reshape(b, t_pad, h, dh)
    return (
        dq.astype(q.dtype),
        dkp.astype(kp.dtype),
        dvp.astype(vp.dtype),
        jnp.zeros_like(key_live),  # validity mask: no gradient by construction
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


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
