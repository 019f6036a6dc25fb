"""Pallas int8 fused-dequant matmul: correctness vs the XLA formulation.

Runs in interpreter mode on CPU (the compiled kernel is TPU-only); the
numbers must match the plain dequant matmul bit-for-bit up to bf16 rounding.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from realtime_codec_agent_tpu.ops.int8_matmul import int8_matmul


def _ref(x, wq, s):
    y = jnp.dot(
        x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return y * s


@pytest.mark.parametrize(
    "t,k,n",
    [
        (2, 256, 384),     # decode-shaped: tiny T
        (3, 128, 128),     # probe-folded frame step T
        (16, 256, 256),
        (33, 384, 260),    # non-multiples of the block sizes on both axes
    ],
)
def test_int8_matmul_matches_xla(t, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(t, k)).astype(np.float32))
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)).astype(np.int8))
    s = jnp.asarray((rng.uniform(0.5, 2.0, size=(n,)) / 127.0).astype(np.float32))
    got = np.asarray(int8_matmul(x, wq, s, interpret=True))
    want = np.asarray(_ref(x, wq, s))
    assert got.shape == (t, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_matmul_3d_lead():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 128)).astype(np.float32))
    wq = jnp.asarray(rng.integers(-127, 128, size=(128, 256)).astype(np.int8))
    s = jnp.asarray(np.full((256,), 0.01, np.float32))
    got = np.asarray(int8_matmul(x, wq, s, interpret=True))
    want = np.asarray(_ref(x.reshape(3, 128), wq, s)).reshape(1, 3, 256)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_qdot_cpu_fallback_matches():
    """Off-TPU, qdot's quantized path takes the XLA formulation."""
    from realtime_codec_agent_tpu.ops.nn import qdot

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    wq = jnp.asarray(rng.integers(-127, 128, size=(64, 96)).astype(np.int8))
    s = jnp.asarray(np.full((96,), 0.02, np.float32))
    got = np.asarray(qdot(x, {"q": wq, "s": s}))
    # the XLA fallback keeps x in f32 (only the weight upcasts to bf16)
    want = np.asarray(
        jnp.dot(x, wq.astype(jnp.bfloat16), preferred_element_type=jnp.float32) * s
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
