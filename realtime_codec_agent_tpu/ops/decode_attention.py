"""Pallas decode-path GQA attention over the big KV cache — EXPERIMENTAL,
NOT wired into the hot path.

Measured on the v5e (chained x16 layers at the real decode shapes,
S=18432, KH=8, Dh=64, T=3): the existing XLA grouped-einsum two-piece
attention (models/llama._gqa_two_piece_attention) runs 1.63 ms; this
kernel's manual-DMA variant 4.4 ms, the grid-pipelined variant 4.4 ms, and
an XLA block-diagonal reformulation 2.9 ms. Per-grid-step/loop-iteration
overhead (~27 us) dominates at these block counts, so no Pallas
formulation beats the fused einsum on this backend. Kept (with parity
tests) as the working ground for a future backend where kernel-step
overhead is lower, and as the documented negative result
(docs/PERFORMANCE.md round 3).

The duplex decode path attends a (S=18432, KH=8, Dh=64) cache with 1-3
query tokens per step. The XLA einsum formulation reads the whole static
cache at ~370 GB/s effective (layout + small-T underutilization) — ~1.6 ms
per frame across 16 layers, ~25% of the 100 ms chunk budget. This kernel:

- streams the cache HBM->VMEM in double-buffered 2048-entry blocks at
  near-roofline bandwidth (the (S, KH*Dh) layout is contiguous);
- reads ONLY ceil(cache_valid / block) blocks — a DYNAMIC bound, so early
  in a session attention reads a fraction of the cache with one compiled
  program (the XLA one-shot reads all of it; a static sliced "view" forced
  XLA to defensively copy the donated cache, docs/PERFORMANCE.md round 3);
- returns flash partials (running max, denominator, accumulator) that the
  caller merges with the in-program small-window keys (uncommitted frame
  pairs + self tokens) — the two-piece softmax stays exact.

GQA trick: the padded queries are laid out BLOCK-DIAGONALLY over heads —
row block h only has nonzero columns in head h's Dh range — so per-head
scores come out of ONE dense (128, 512) @ (512, S_blk) matmul (cross-head
terms are exactly zero), and the PV product's cross-head garbage is simply
not extracted. The MXU overshoot is free; what matters is that the cache
streams once at full bandwidth with zero strided/dynamic slicing.

Caller invariant (all decode paths satisfy it): every query position is
>= cache_valid, so the causal mask over cache keys reduces to
``index < cache_valid``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_S = 2048
ROWS_PER_HEAD = 16  # padded G*T query rows per kv head


def _kernel(nv_ref, q_ref, k_hbm, v_hbm, m_out, l_out, acc_out):
    """Manual-DMA variant. q_ref: (KH*16, KH*Dh) block-diagonal queries in
    VMEM; k_hbm/v_hbm: (S, KH*Dh) cache in HBM, streamed in double-buffered
    BLOCK_S slabs bounded by nv_ref[0]. Outputs: flash partials m/l
    (KH*16, 1) and acc (KH*16, KH*Dh), all f32."""
    rows, width = q_ref.shape
    n_valid = nv_ref[0]
    n_blocks = pl.cdiv(jnp.maximum(n_valid, 0), BLOCK_S)
    neg = jnp.float32(-1e30)

    def body(k_buf, v_buf, sems):
        def dmas(slot, blk):
            return (
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(blk * BLOCK_S, BLOCK_S), :],
                    k_buf.at[slot],
                    sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(blk * BLOCK_S, BLOCK_S), :],
                    v_buf.at[slot],
                    sems.at[slot, 1],
                ),
            )

        @pl.when(n_blocks > 0)
        def _():
            dk, dv = dmas(0, 0)
            dk.start()
            dv.start()

        q = q_ref[:].astype(k_hbm.dtype)

        def loop(blk, carry):
            m, l, acc = carry
            slot = blk % 2

            @pl.when(blk + 1 < n_blocks)
            def _():
                dk, dv = dmas((blk + 1) % 2, blk + 1)
                dk.start()
                dv.start()

            dk, dv = dmas(slot, blk)
            dk.wait()
            dv.wait()

            k_blk = k_buf[slot]  # (BLOCK_S, width) bf16
            v_blk = v_buf[slot]
            s = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, BLOCK_S)
            col = blk * BLOCK_S + jax.lax.broadcasted_iota(
                jnp.int32, (1, BLOCK_S), 1
            )
            s = jnp.where(col < n_valid, s, neg)
            m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + p.sum(axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (m_new, l, acc)

        m0 = jnp.full((rows, 1), neg, jnp.float32)
        l0 = jnp.zeros((rows, 1), jnp.float32)
        acc0 = jnp.zeros((rows, width), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, loop, (m0, l0, acc0))
        m_out[:] = m
        l_out[:] = l
        acc_out[:] = acc

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, BLOCK_S, width), k_hbm.dtype),
        v_buf=pltpu.VMEM((2, BLOCK_S, width), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _grid_kernel(nv_ref, q_ref, k_ref, v_ref, m_out, l_out, acc_out, m_s, l_s, acc_s):
    """Auto-pipelined variant: grid over key blocks, running stats in
    scratch, outputs written on the last block (the Mosaic pipeline
    double-buffers the k/v block DMAs itself)."""
    j = pl.program_id(0)
    n_valid = nv_ref[0]
    neg = jnp.float32(-1e30)
    q = q_ref[:]
    s = jax.lax.dot_general(
        q, k_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = j * BLOCK_S + jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_S), 1)
    s = jnp.where(col < n_valid, s, neg)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s[:], neg)
        l_s[:] = jnp.zeros_like(l_s[:])
        acc_s[:] = jnp.zeros_like(acc_s[:])

    m_new = jnp.maximum(m_s[:], s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_s[:] - m_new)
    l_s[:] = l_s[:] * corr + p.sum(axis=-1, keepdims=True)
    acc_s[:] = acc_s[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[:] = m_new

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        m_out[:] = m_s[:]
        l_out[:] = l_s[:]
        acc_out[:] = acc_s[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_partials_grid(
    qg: jnp.ndarray,
    k_big: jnp.ndarray,
    v_big: jnp.ndarray,
    cache_valid: jnp.ndarray,
    scale: float,
    interpret: bool = False,
):
    """Grid-pipelined decode attention partials (reads the whole cache but
    at Mosaic's pipelined bandwidth; no dynamic bound). Same contract as
    decode_attention_partials."""
    kh, gt, dh = qg.shape
    s, _, _ = k_big.shape
    if s % BLOCK_S:
        raise ValueError(f"cache length {s} must be a multiple of {BLOCK_S}")
    width = kh * dh
    rows = kh * ROWS_PER_HEAD
    qf = qg.astype(jnp.float32) * jnp.float32(scale)
    q_full = jnp.zeros((kh, ROWS_PER_HEAD, kh, dh), jnp.float32)
    q_full = q_full.at[jnp.arange(kh), :gt, jnp.arange(kh)].set(qf)
    q_full = q_full.reshape(rows, width).astype(k_big.dtype)
    nv = jnp.asarray(cache_valid, jnp.int32).reshape(1)
    m, l, acc = pl.pallas_call(
        _grid_kernel,
        grid=(s // BLOCK_S,),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, width), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, width), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_S, width), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_S, width), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, width), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, width), jnp.float32),
        ],
        interpret=interpret,
    )(nv, q_full, k_big.reshape(s, width), v_big.reshape(s, width))
    m = m.reshape(kh, ROWS_PER_HEAD, 1)[:, :gt]
    l = l.reshape(kh, ROWS_PER_HEAD, 1)[:, :gt]
    acc = acc.reshape(kh, ROWS_PER_HEAD, kh, dh)[
        jnp.arange(kh), :, jnp.arange(kh)
    ][:, :gt]
    return m, l, acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_partials(
    qg: jnp.ndarray,          # (KH, G*T, Dh) rotated queries (NOT pre-scaled)
    k_big: jnp.ndarray,       # (S, KH, Dh) cache keys
    v_big: jnp.ndarray,       # (S, KH, Dh)
    cache_valid: jnp.ndarray, # scalar i32: keys at index < this are attended
    scale: float,
    interpret: bool = False,
):
    """Flash partials of the queries against the valid cache prefix:
    (m, l, acc) with m/l (KH, G*T, 1) f32 and acc (KH, G*T, Dh) f32.
    Merge with the small-window piece via the online-softmax combine."""
    kh, gt, dh = qg.shape
    s, _, _ = k_big.shape
    if s % BLOCK_S:
        raise ValueError(f"cache length {s} must be a multiple of {BLOCK_S}")
    if gt > ROWS_PER_HEAD:
        raise ValueError(f"too many query rows per head: {gt} > {ROWS_PER_HEAD}")
    width = kh * dh
    rows = kh * ROWS_PER_HEAD
    # block-diagonal layout: head h's queries at rows [h*16,(h+1)*16),
    # columns [h*Dh,(h+1)*Dh)
    qf = (qg.astype(jnp.float32) * jnp.float32(scale))
    q_full = jnp.zeros((kh, ROWS_PER_HEAD, kh, dh), jnp.float32)
    q_full = q_full.at[jnp.arange(kh), :gt, jnp.arange(kh)].set(qf)
    q_full = q_full.reshape(rows, width)
    k2 = k_big.reshape(s, width)
    v2 = v_big.reshape(s, width)
    nv = jnp.asarray(cache_valid, jnp.int32).reshape(1)
    m, l, acc = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, width), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(nv, q_full, k2, v2)
    # extract the block-diagonal: head h's outputs at rows [h*16, h*16+gt),
    # acc columns [h*Dh, (h+1)*Dh)
    m = m.reshape(kh, ROWS_PER_HEAD, 1)[:, :gt]
    l = l.reshape(kh, ROWS_PER_HEAD, 1)[:, :gt]
    acc = acc.reshape(kh, ROWS_PER_HEAD, kh, dh)[
        jnp.arange(kh), :, jnp.arange(kh)
    ][:, :gt]
    return m, l, acc
