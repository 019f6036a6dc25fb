"""Fused on-TPU token sampler with llama.cpp sampler-chain semantics.

Rebuilds the native sampler the reference configures through
``init_sampler_for_generate`` (reference utils/llamacpp_utils.py:39-77):
additive logit bias -> repeat/frequency/presence penalties over a trailing
window -> (temp==0: greedy) else top-k -> top-p -> min-p -> temperature ->
seeded categorical draw. Everything runs inside the decode jit: only the
sampled token id crosses back to the host.

All knobs except ``top_k`` (which shapes the lax.top_k) are dynamic scalars,
so flipping temperature / bias between generate modes (reference
realtime_agent_v2.py:172-185, 353-357) never recompiles.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)

# max simultaneous logit-bias entries (the agent uses one: end_audio suppression)
MAX_BIAS = 4
# llama.cpp penalty_last_n default
PENALTY_WINDOW = 64


@dataclasses.dataclass
class SamplerSettings:
    """Host-side sampler configuration (mirrors init_sampler_for_generate args)."""

    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    temp: float = 0.80
    repeat_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    logit_bias: Tuple[Tuple[int, float], ...] = ()
    seed: Optional[int] = None
    # restrict sampling to ids >= this value (0 = no restriction); used to pin
    # generation to the codec region (benchmarks, serving guardrails)
    min_token_id: int = 0

    def scalars(self) -> jnp.ndarray:
        """Pack dynamic knobs as an f32 vector (keeps the jit signature fixed)."""
        return jnp.array(
            [
                self.top_p,
                self.min_p,
                self.temp,
                self.repeat_penalty,
                self.frequency_penalty,
                self.presence_penalty,
                float(self.min_token_id),
            ],
            dtype=jnp.float32,
        )

    def bias_arrays(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ids = jnp.zeros((MAX_BIAS,), jnp.int32)
        vals = jnp.zeros((MAX_BIAS,), jnp.float32)
        for i, (tid, b) in enumerate(self.logit_bias[:MAX_BIAS]):
            ids = ids.at[i].set(tid)
            vals = vals.at[i].set(b)
        return ids, vals


def apply_penalties(
    logits: jnp.ndarray,  # (V,) f32
    window_ids: jnp.ndarray,  # (PENALTY_WINDOW,) i32
    window_mask: jnp.ndarray,  # (PENALTY_WINDOW,) f32 (1 = valid)
    repeat_penalty: jnp.ndarray,
    frequency_penalty: jnp.ndarray,
    presence_penalty: jnp.ndarray,
) -> jnp.ndarray:
    """llama.cpp-style penalties over a trailing token window."""
    v = logits.shape[0]
    counts = jnp.zeros((v,), jnp.float32).at[window_ids].add(window_mask)
    present = counts > 0
    repeated = jnp.where(
        logits > 0, logits / repeat_penalty, logits * repeat_penalty
    )
    out = jnp.where(present, repeated, logits)
    out = out - counts * frequency_penalty - jnp.where(present, presence_penalty, 0.0)
    return out


_TOPK_BLOCK = 256


def top_k_exact(x: jnp.ndarray, k: int):
    """Two-stage exact top-k over a large vocab.

    ``lax.top_k`` over the 260k-logit vector costs ~0.35 ms on the v5e
    (sort-bound, 300x off the 1 MB read's roofline); selecting the k best
    512..256-wide blocks by their maxima and re-running top-k over just
    those blocks is 2.4x faster and provably exact: if an element x of the
    true top-k lived in an unselected block, the k selected blocks' maxima
    would all exceed x, exhibiting k elements > x. (Boundary TIES may
    resolve to different indices than lax.top_k's lowest-index rule; every
    sampling path shares this function, so seeded determinism across
    fused/stepwise/pipelined execution is unaffected.)"""
    v = x.shape[0]
    g = v // _TOPK_BLOCK
    if v % _TOPK_BLOCK or k > g or v < 16 * 1024:
        return jax.lax.top_k(x, k)
    xb = x.reshape(g, _TOPK_BLOCK)
    bmax = jnp.max(xb, axis=1)
    _, bidx = jax.lax.top_k(bmax, k)
    cand = xb[bidx].reshape(-1)
    vals, ci = jax.lax.top_k(cand, k)
    idx = bidx[ci // _TOPK_BLOCK] * _TOPK_BLOCK + (ci % _TOPK_BLOCK)
    return vals, idx


def sample_token(
    logits: jnp.ndarray,  # (V,) f32
    key: jax.Array,
    scalars: jnp.ndarray,  # packed SamplerSettings.scalars()
    bias_ids: jnp.ndarray,
    bias_vals: jnp.ndarray,
    window_ids: jnp.ndarray,
    window_mask: jnp.ndarray,
    top_k: int = 100,
) -> jnp.ndarray:
    """One sampled token id, full llama.cpp chain. jit-safe; ``top_k`` is the
    STATIC upper bound shaping lax.top_k; scalars[7] (when present) is a
    dynamic per-call/per-row top-k cutoff <= the static bound (0 = use the
    full static k) — batched serving samples rows with different top_k
    through one compiled program."""
    top_p, min_p, temp, rep, freq, pres, min_id = (scalars[i] for i in range(7))
    dyn_k = scalars[7] if scalars.shape[0] > 7 else jnp.float32(0.0)

    logits = logits.astype(jnp.float32)
    # additive logit bias (get_logits_bias_processor, llamacpp_utils.py:8-24)
    logits = logits.at[bias_ids].add(bias_vals)
    logits = apply_penalties(logits, window_ids, window_mask, rep, freq, pres)
    token_pos = jax.lax.broadcasted_iota(jnp.int32, (logits.shape[0], 1), 0)[:, 0]
    logits = jnp.where(token_pos.astype(jnp.float32) >= min_id, logits, NEG_INF)

    k = max(1, min(top_k if top_k > 0 else 1024, logits.shape[0]))
    top_vals, top_idx = top_k_exact(logits, k)
    rank = jnp.arange(k).astype(jnp.float32)
    top_vals = jnp.where((dyn_k <= 0) | (rank < dyn_k), top_vals, NEG_INF)

    def greedy(_):
        return top_idx[0]

    def sampled(k2):
        probs = jax.nn.softmax(top_vals)
        cum = jnp.cumsum(probs)
        # top-p: keep the smallest prefix with cumulative mass >= top_p
        keep = (cum - probs) < top_p
        # min-p: drop tokens below min_p * max_prob
        keep &= probs >= min_p * probs[0]
        keep = keep.at[0].set(True)
        scaled = jnp.where(keep, top_vals / jnp.maximum(temp, 1e-6), NEG_INF)
        choice = jax.random.categorical(k2, scaled)
        return top_idx[choice]

    return jax.lax.cond(temp <= 0.0, greedy, sampled, key)


def make_window(input_ids, n: int = PENALTY_WINDOW) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the trailing penalty window arrays from a host-side id list."""
    tail = list(input_ids[-n:])
    pad = n - len(tail)
    ids = jnp.array(tail + [0] * pad, dtype=jnp.int32)
    mask = jnp.array([1.0] * len(tail) + [0.0] * pad, dtype=jnp.float32)
    return ids, mask
