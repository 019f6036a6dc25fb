"""Gradient parity for the custom flash-attention VJP (ops/nn.py).

``flash_causal_attention`` differentiates through a FlashAttention-2-style
custom VJP that recomputes block probabilities from (q, k, lse) instead of
letting autodiff stack per-block f32 score residuals (which is what halved
T=2048 training MFU — see the function's docstring and docs/PERFORMANCE.md).

Tolerance rationale (measured during bring-up, f64 ground-truth probes):
the forward itself runs its softmax statistics in f32, so BOTH the plain
attention path and the flash path sit ~3e-3 (abs, unit-scale inputs) from the
f64 answer. The custom backward recomputes p = exp(s - lse) with an
f32 lse (~7e-5 abs error), which amplifies into gradient differences of
~2e-3 RELATIVE to the gradient scale — the same order as the forward's own
f32 noise, and far below bf16 training precision (~4e-3). Autodiff-vs-autodiff
comparisons look "exact" (1e-6) only because both paths make bit-identical f32
roundings; that is not the right yardstick for a recompute-based backward. A
formula bug (wrong delta, missing scale, mis-ordered mask) produces O(1)
relative errors, which these tolerances still catch with 50x margin.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtime_codec_agent_tpu.ops import nn


def _make_inputs(seed=0, B=2, T=40, H=2, Dh=8):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, Dh)), jnp.float32)
    co = jnp.asarray(rng.normal(size=(B, T, H, Dh)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, size=(B, T)).astype(np.int32))
    valid = valid.at[:, :4].set(1)  # every query has at least one live key
    return q, k, v, co, valid


def _grads(fn, q, k, v):
    return [np.asarray(jax.grad(fn, argnums=a)(q, k, v)) for a in (0, 1, 2)]


def test_flash_vjp_matches_plain_attention_grads(monkeypatch):
    """Custom-VJP grads vs autodiff-through-plain-attention, with a validity
    mask and T=40 (not a multiple of block=16, so the key pad path runs)."""
    q, k, v, co, valid = _make_inputs()
    T = q.shape[1]

    def plain_loss(q, k, v):
        mask = nn.causal_mask(T, T, 0) & valid[:, None, None, :].astype(bool)
        return jnp.sum(nn.attention(q, k, v, mask=mask) * co)

    def flash_loss(q, k, v):
        return jnp.sum(
            nn.flash_causal_attention(q, k, v, valid=valid, block=16) * co
        )

    ref = _grads(plain_loss, q, k, v)
    got = _grads(flash_loss, q, k, v)
    for name, r, g in zip(("dq", "dk", "dv"), ref, got):
        scale = np.abs(r).max()
        np.testing.assert_allclose(
            g, r, atol=2e-2 * scale, rtol=0,
            err_msg=f"{name}: custom flash VJP vs plain-attention autodiff",
        )

    # the autodiff fallback (RTCA_FLASH_VJP=0) must agree too — it shares the
    # forward scan with the custom path, so this pins the env-var plumbing
    monkeypatch.setenv("RTCA_FLASH_VJP", "0")
    fb = _grads(flash_loss, q, k, v)
    for name, r, g in zip(("dq", "dk", "dv"), ref, fb):
        scale = np.abs(r).max()
        np.testing.assert_allclose(
            g, r, atol=2e-2 * scale, rtol=0,
            err_msg=f"{name}: autodiff-fallback flash vs plain attention",
        )


def test_flash_vjp_fully_masked_rows_finite():
    """Rows whose every key is masked out (leading queries with valid=0
    everywhere they can attend) must yield zero output rows and FINITE
    gradients — lse is pinned to 0 on empty rows so exp(s - lse) stays 0."""
    q, k, v, co, _ = _make_inputs(seed=1, T=24)
    valid = jnp.zeros((q.shape[0], 24), jnp.int32).at[:, 8:].set(1)

    def flash_loss(q, k, v):
        return jnp.sum(
            nn.flash_causal_attention(q, k, v, valid=valid, block=8) * co
        )

    out = nn.flash_causal_attention(q, k, v, valid=valid, block=8)
    assert np.all(np.isfinite(np.asarray(out)))
    # queries 0..7 attend only to keys 0..7, all invalid -> zero rows
    np.testing.assert_array_equal(np.asarray(out)[:, :8], 0.0)
    for g in _grads(flash_loss, q, k, v):
        assert np.all(np.isfinite(g))
    # masked-out keys receive zero dk/dv
    dk, dv = _grads(flash_loss, q, k, v)[1:]
    np.testing.assert_array_equal(dk[:, :8], 0.0)
    np.testing.assert_array_equal(dv[:, :8], 0.0)


@pytest.mark.parametrize("T", [16, 33])
def test_flash_vjp_no_mask_and_odd_lengths(T):
    """No validity mask + a length straddling a block boundary."""
    q, k, v, co, _ = _make_inputs(seed=2, T=T)

    def plain_loss(q, k, v):
        return jnp.sum(nn.attention(q, k, v, mask=nn.causal_mask(T, T, 0)) * co)

    def flash_loss(q, k, v):
        return jnp.sum(nn.flash_causal_attention(q, k, v, block=16) * co)

    ref = _grads(plain_loss, q, k, v)
    got = _grads(flash_loss, q, k, v)
    for name, r, g in zip(("dq", "dk", "dv"), ref, got):
        scale = np.abs(r).max()
        np.testing.assert_allclose(
            g, r, atol=2e-2 * scale, rtol=0, err_msg=name
        )
