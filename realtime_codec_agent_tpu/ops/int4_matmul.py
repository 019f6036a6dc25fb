"""Pallas TPU kernel: matmul with affine int4 weights dequantized in VMEM.

Why int4: batch-1 AR decode of the 1B duplex LM is weight-read-bound, and
int8 (ops/int8_matmul.py) already beats bf16 everywhere on the tunnel
(docs/PERFORMANCE.md). The reference's actual smallest deployment artifact
is **Q4_K_M** (reference prep_test_model.sh:33-34: `llama-quantize ...
Q4_K_M`) — 4-bit weights with per-32 affine (scale+min) groups. This kernel
serves that artifact natively: nibbles + per-group f32 scale/min read from
HBM (~0.75 B/weight vs int8's ~1.03), dequantized in VMEM, fed to the MXU.

Quantized-leaf layout (produced by models/llama.quantize_params_int4 and by
the exact GGUF Q4_K importer, models/gguf.py):

  {"q4": uint8 (K//2, N), "d": f32 (K//G, N), "m": f32 (K//G, N)}

with dequant ``w[k, n] = q[k, n] * d[k//G, n] - m[k//G, n]``, q in [0, 15].
Nibble packing is *group-contiguous halves*: within group g, byte row
``g*(G//2) + j`` holds ``w[g*G + j]`` in its low nibble and
``w[g*G + G//2 + j]`` in its high nibble. Group-contiguity keeps any
K-axis shard boundary (tensor-parallel row splits) aligned to whole groups,
so TP slicing of the packed tensor needs no repacking.

Like the int8 kernel, this one's second job is to be OPAQUE inside
lax.scan/while_loop bodies: XLA hoists a plain dequant out of the loop and
round-trips a full bf16 weight copy through HBM, erasing the bandwidth win;
a pallas_call cannot be hoisted. Dequantization arithmetic happens in f32
and rounds ONCE to bf16 for the MXU — the same ``bf16(q*d - m)`` values the
XLA route (ops/int4_matmul.dequant_int4) feeds its dot, so the two routes
differ only in activation dtype (the kernel casts x to bf16, the XLA route
keeps f32 — the same documented route-dependence as int8, ops/nn.qdot).

Only the T and N axes are gridded; K stays whole in VMEM. Edge blocks rely
on Pallas out-of-bounds semantics as in int8_matmul.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block budget for the packed nibbles; the f32 dequant temp is 8x this
# and its bf16 cast 4x, so 512 KB of nibbles -> ~6 MB of temps +
# double-buffered inputs stays well inside the 16 MB scoped-VMEM limit.
_Q4_BLOCK_BYTES = 512 * 1024
_X_BLOCK_BYTES = 2 * 1024 * 1024
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, q4_ref, d_ref, m_ref, o_ref, *, group: int):
    kg = d_ref.shape[0]
    gh = group // 2
    bn = q4_ref.shape[-1]
    qi = q4_ref[:].astype(jnp.int32)
    lo = (qi & 15).reshape(kg, gh, bn)
    hi = (qi >> 4).reshape(kg, gh, bn)
    q = jnp.concatenate([lo, hi], axis=1)  # (kg, group, bn) int32
    d = d_ref[:].astype(jnp.float32)[:, None, :]
    m = m_ref[:].astype(jnp.float32)[:, None, :]
    w = (q.astype(jnp.float32) * d - m).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        x_ref[:], w.reshape(kg * group, bn), preferred_element_type=jnp.float32
    )


def _kernel_split(xlo_ref, xhi_ref, q4_ref, d_ref, m_ref, o_ref, *, group: int):
    """Split-dot formulation: never materializes the full (K, bn) dequant.
    Byte row ``g*gh + j`` packs elements ``g*G+j`` (low nibble) and
    ``g*G+gh+j`` (high), so ``y = x_lo @ w_lo + x_hi @ w_hi`` — two half-K
    MXU dots instead of a concat + full-size bf16 temp. The caller slices
    x into the matching half orders OUTSIDE the kernel (a lane-dim reshape
    Mosaic can't do in-kernel; it's an activation op, so XLA cannot hoist
    it out of a decode loop the way it would a weight dequant)."""
    kg = d_ref.shape[0]
    gh = group // 2
    bn = q4_ref.shape[-1]
    qi = q4_ref[:].astype(jnp.int32).reshape(kg, gh, bn)
    d = d_ref[:].astype(jnp.float32)[:, None, :]
    m = m_ref[:].astype(jnp.float32)[:, None, :]
    w_lo = ((qi & 15).astype(jnp.float32) * d - m).astype(jnp.bfloat16)
    w_hi = ((qi >> 4).astype(jnp.float32) * d - m).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        xlo_ref[:], w_lo.reshape(kg * gh, bn), preferred_element_type=jnp.float32
    ) + jnp.dot(
        xhi_ref[:], w_hi.reshape(kg * gh, bn), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(
    x: jnp.ndarray,
    q4: jnp.ndarray,
    d: jnp.ndarray,
    m: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., K) @ dequant(q4, d, m) (K, N) -> (..., N) f32.

    HBM reads the packed nibbles + per-group scales exactly once per call;
    dequantization never touches HBM. Accumulates in f32 on the MXU.
    """
    kh, n = q4.shape
    k = 2 * kh
    kg = d.shape[0]
    assert k % kg == 0, (k, kg)
    group = k // kg
    assert group % 2 == 0 and kh % (group // 2) == 0
    lead = x.shape[:-1]
    assert x.shape[-1] == k, (x.shape, k)
    x2 = x.reshape(-1, k)
    t = x2.shape[0]

    max_t = max(16, (_X_BLOCK_BYTES // (2 * k)) // 16 * 16)
    block_t = min(_round_up(t, 16), max_t, 256)
    block_n = max(_LANE, (_Q4_BLOCK_BYTES // kh) // _LANE * _LANE)
    block_n = min(block_n, _round_up(n, _LANE))
    grid = (pl.cdiv(t, block_t), pl.cdiv(n, block_n))

    split = os.environ.get("RTCA_INT4_SPLIT", "1") != "0"
    if split:
        gh = group // 2
        x3 = x2.astype(jnp.bfloat16).reshape(t, kg, group)
        x_halves = [
            x3[:, :, :gh].reshape(t, kh),
            x3[:, :, gh:].reshape(t, kh),
        ]
        x_specs = [
            pl.BlockSpec((block_t, kh), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ] * 2
    else:
        x_halves = [x2.astype(jnp.bfloat16)]
        x_specs = [
            pl.BlockSpec((block_t, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ]
    body = _kernel_split if split else _kernel
    # RTCA_INT4_DM_BF16=1: ship the per-group scale/min to VMEM in bf16
    # (halves their HBM read — d+m are 0.25 B/weight at group=32, a quarter
    # of the int4 byte stream) and widen to f32 in-register. A/B knob for
    # the decode-bandwidth study; numerics shift at bf16-epsilon scale.
    dm_dtype = (
        jnp.bfloat16 if os.environ.get("RTCA_INT4_DM_BF16", "0") == "1"
        else jnp.float32
    )
    out = pl.pallas_call(
        functools.partial(body, group=group),
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((kh, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((kg, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((kg, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
        interpret=interpret,
    )(*x_halves, q4, d.astype(dm_dtype), m.astype(dm_dtype))
    return out.reshape(*lead, n)


def dequant_int4(q4: jnp.ndarray, d: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Dequantize an int4 leaf to f32 (K, N) — the XLA-route / reference
    formulation (f32 arithmetic; the kernel's bf16 dequant differs at
    bf16-epsilon scale)."""
    kh, n = q4.shape
    kg = d.shape[0]
    group = 2 * kh // kg
    gh = group // 2
    qi = q4.astype(jnp.int32)
    lo = (qi & 15).reshape(kg, gh, n)
    hi = (qi >> 4).reshape(kg, gh, n)
    q = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
    w = q * d.astype(jnp.float32)[:, None, :] - m.astype(jnp.float32)[:, None, :]
    return w.reshape(kg * group, n)
