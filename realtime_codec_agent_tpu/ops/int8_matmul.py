"""Pallas TPU kernel: matmul with int8 weights dequantized in VMEM.

Why a kernel: batch-1 AR decode of the 1B duplex LM is weight-read-bound
(~3 GB of bf16 weights per frame step). Per-channel int8 halves the bytes,
but plain XLA (`x @ wq.astype(bf16) * s`) materializes the dequantized bf16
copy through HBM on this backend — 1 byte read + 4 bytes of round-trip —
so it measured *no* win (docs/PERFORMANCE.md round 2). Here the int8 block
is DMA'd HBM->VMEM once, upcast in VMEM, and fed straight to the MXU: HBM
traffic is the int8 bytes plus activations, nothing else.

The quantization layout is models/llama.quantize_params_int8's
{"q": int8 (K, N), "s": f32 (N,)} — the TPU counterpart of the reference's
q8_0 GGUF deployment artifact (reference prep_test_model.sh:27-31).

Only the T and N axes are gridded; K stays whole in VMEM (K <= 8192 for the
1B geometry), so there is no cross-block accumulation. Edge blocks rely on
Pallas's out-of-bounds semantics: garbage input rows/cols only ever produce
garbage output rows/cols that the edge write drops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block VMEM budgets. Pallas double-buffers every gridded operand, so the
# worst case (K=8192: x 2x2MB + w 2x2MB + out) must stay well under the 16MB
# scoped-VMEM limit. RTCA_INT8_WBLOCK_MB widens the weight block for A/B
# (fewer grid steps, longer DMA bursts — bounded by the VMEM budget).
import os as _os

_W_BLOCK_BYTES = int(
    float(_os.environ.get("RTCA_INT8_WBLOCK_MB", "2")) * 1024 * 1024
)
_X_BLOCK_BYTES = 2 * 1024 * 1024
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    y = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = y * s_ref[:]


# weights up to this many int8 bytes skip the grid entirely (whole tensor in
# VMEM, one program): fewer grid-step boundaries measured faster at the 1B
# model's fused layer shapes (wqkv 6MB, wo 4MB, w_down 16MB->gridded)
_SINGLE_BLOCK_BYTES = 6 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (..., K) bf16/f32 @ wq (K, N) int8 * scale (N,) f32 -> (..., N) f32.

    Dequantization happens in VMEM inside the kernel; HBM reads the int8
    weights exactly once. Accumulates in f32 on the MXU.

    This kernel's other job is to be OPAQUE: inside a lax.scan/while_loop
    (the fused frame scan, gen_until), XLA hoists a plain
    ``wq.astype(bf16)`` out of the loop and round-trips a full bf16 weight
    copy through HBM once — after which every iteration reads bf16 again and
    the int8 bandwidth saving is gone. A pallas_call cannot be hoisted, so
    the loop body genuinely reads int8 bytes every iteration.
    """
    k, n = wq.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    t = x2.shape[0]
    scale2 = scale.reshape(1, n).astype(jnp.float32)

    import os

    # Single-block (whole weight resident in VMEM) measured FASTER in an
    # isolated chained microbench (0.758 vs 0.848 ms / 4 layers) but ~3 ms
    # per chunk SLOWER inside the real fused frame scan: parking 4-6 MB of
    # weights in VMEM starves the surrounding attention/codec ops of
    # buffering. Default off; RTCA_INT8_SINGLE=1 re-enables for experiments.
    single_ok = os.environ.get("RTCA_INT8_SINGLE", "0") == "1"
    if single_ok and k * n <= _SINGLE_BLOCK_BYTES and t <= 256:
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x2.astype(jnp.bfloat16), wq, scale2)
        return out.reshape(*lead, n)

    # bf16 min sublane tile is 16; tiny decode T pads up to it
    max_t = max(16, (_X_BLOCK_BYTES // (2 * k)) // 16 * 16)
    block_t = min(_round_up(t, 16), max_t, 256)
    block_n = max(_LANE, (_W_BLOCK_BYTES // k) // _LANE * _LANE)
    block_n = min(block_n, _round_up(n, _LANE))
    grid = (pl.cdiv(t, block_t), pl.cdiv(n, block_n))

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
        interpret=interpret,
    )(x2.astype(jnp.bfloat16), wq, scale2)
    return out.reshape(*lead, n)
