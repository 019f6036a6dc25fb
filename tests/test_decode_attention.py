"""Decode-attention Pallas kernel: partials match the XLA reference."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from realtime_codec_agent_tpu.ops.decode_attention import (
    BLOCK_S,
    decode_attention_partials,
)


def _ref_partials(qg, k_big, v_big, n_valid, scale):
    """Dense reference: masked scores over the cache, flash-style stats."""
    kh, gt, dh = qg.shape
    s = k_big.shape[0]
    scores = np.einsum(
        "hgd,shd->hgs", qg.astype(np.float64) * scale, k_big.astype(np.float64)
    )
    mask = np.arange(s)[None, None, :] < n_valid
    scores = np.where(mask, scores, -1e30)
    m = scores.max(axis=-1, keepdims=True)
    p = np.exp(scores - m)
    l = p.sum(axis=-1, keepdims=True)
    acc = np.einsum("hgs,shd->hgd", p, v_big.astype(np.float64))
    return m, l, acc


@pytest.mark.parametrize("n_valid", [0, 1, 5, BLOCK_S, BLOCK_S + 7, 2 * BLOCK_S])
def test_partials_match_reference(n_valid):
    kh, gt, dh = 4, 3, 64
    s = 2 * BLOCK_S
    rng = np.random.default_rng(n_valid)
    qg = rng.normal(size=(kh, gt, dh)).astype(np.float32)
    k = rng.normal(size=(s, kh, dh)).astype(np.float32)
    v = rng.normal(size=(s, kh, dh)).astype(np.float32)
    scale = dh ** -0.5
    m, l, acc = decode_attention_partials(
        jnp.asarray(qg), jnp.asarray(k), jnp.asarray(v),
        jnp.int32(n_valid), scale, interpret=True,
    )
    m_ref, l_ref, acc_ref = _ref_partials(qg, k, v, n_valid, scale)
    if n_valid == 0:
        assert float(jnp.max(l)) == 0.0
        return
    # normalized outputs must agree (m/l are defined up to the running split)
    out = np.asarray(acc) / np.maximum(np.asarray(l), 1e-30)
    out_ref = acc_ref / np.maximum(l_ref, 1e-30)
    np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3)
    # the log-normalizer must agree too (needed for the two-piece merge)
    logz = np.asarray(m)[..., 0] + np.log(np.maximum(np.asarray(l)[..., 0], 1e-30))
    logz_ref = m_ref[..., 0] + np.log(np.maximum(l_ref[..., 0], 1e-30))
    np.testing.assert_allclose(logz, logz_ref, rtol=1e-4, atol=1e-3)


def test_bad_shapes_raise():
    qg = jnp.zeros((2, 3, 64), jnp.float32)
    k = jnp.zeros((100, 2, 64), jnp.float32)  # not a BLOCK_S multiple
    with pytest.raises(ValueError):
        decode_attention_partials(qg, k, k, jnp.int32(10), 0.125, interpret=True)


@pytest.mark.parametrize("n_valid", [1, BLOCK_S + 7, 2 * BLOCK_S])
def test_grid_variant_matches_reference(n_valid):
    from realtime_codec_agent_tpu.ops.decode_attention import (
        decode_attention_partials_grid,
    )

    kh, gt, dh = 4, 3, 64
    s = 2 * BLOCK_S
    rng = np.random.default_rng(n_valid)
    qg = rng.normal(size=(kh, gt, dh)).astype(np.float32)
    k = rng.normal(size=(s, kh, dh)).astype(np.float32)
    v = rng.normal(size=(s, kh, dh)).astype(np.float32)
    scale = dh ** -0.5
    m, l, acc = decode_attention_partials_grid(
        jnp.asarray(qg), jnp.asarray(k), jnp.asarray(v),
        jnp.int32(n_valid), scale, interpret=True,
    )
    m_ref, l_ref, acc_ref = _ref_partials(qg, k, v, n_valid, scale)
    out = np.asarray(acc) / np.maximum(np.asarray(l), 1e-30)
    out_ref = acc_ref / np.maximum(l_ref, 1e-30)
    np.testing.assert_allclose(out, out_ref, rtol=2e-2, atol=2e-2)
