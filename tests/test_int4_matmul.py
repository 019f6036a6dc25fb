"""int4 decode-weight path: Pallas kernel correctness, affine-group
quantization, qdot routing, fusion/TP composition, and the bit-exact native
GGUF Q4_K import (the reference's Q4_K_M deployment artifact,
reference prep_test_model.sh:33-34).

The kernel runs in interpreter mode on CPU (the compiled kernel is
TPU-only); numbers must match the plain f32-dequant matmul up to bf16
rounding of the dequantized weight (FMA contraction can flip the final bf16
rounding of an occasional element between the two routes — tolerances cover
a couple of bf16 ulps).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from realtime_codec_agent_tpu.ops.int4_matmul import dequant_int4, int4_matmul


def _rand_leaf(rng, k, n, group=32):
    kg = k // group
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    d = rng.uniform(0.005, 0.02, size=(kg, n)).astype(np.float32)
    m = rng.uniform(-0.1, 0.1, size=(kg, n)).astype(np.float32)
    gh = group // 2
    q3 = q.reshape(kg, group, n)
    packed = q3[:, :gh, :] | (q3[:, gh:, :] << 4)
    return {
        "q4": jnp.asarray(packed.reshape(k // 2, n)),
        "d": jnp.asarray(d),
        "m": jnp.asarray(m),
    }


def _ref(x, leaf):
    w = dequant_int4(leaf["q4"], leaf["d"], leaf["m"]).astype(jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)


@pytest.mark.parametrize(
    "t,k,n",
    [
        (2, 256, 384),   # decode-shaped: tiny T
        (3, 128, 128),   # probe-folded frame step T
        (16, 256, 256),
        (33, 384, 260),  # non-multiples of the block sizes on both axes
    ],
)
def test_int4_matmul_matches_xla(t, k, n):
    rng = np.random.default_rng(0)
    leaf = _rand_leaf(rng, k, n)
    x = jnp.asarray(rng.normal(size=(t, k)).astype(np.float32))
    got = np.asarray(int4_matmul(x, leaf["q4"], leaf["d"], leaf["m"], interpret=True))
    want = np.asarray(_ref(x, leaf))
    assert got.shape == (t, n)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-4)


def test_int4_matmul_3d_lead():
    rng = np.random.default_rng(1)
    leaf = _rand_leaf(rng, 128, 256)
    x = jnp.asarray(rng.normal(size=(1, 3, 128)).astype(np.float32))
    got = np.asarray(int4_matmul(x, leaf["q4"], leaf["d"], leaf["m"], interpret=True))
    want = np.asarray(_ref(x.reshape(3, 128), leaf)).reshape(1, 3, 256)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-4)


def test_quantize_params_int4_roundtrip():
    """Affine int4 groups reconstruct the weight within the grid step, and
    already-quantized dict leaves pass through untouched."""
    from realtime_codec_agent_tpu.models.llama import (
        init_lm_params, quantize_params_int4, tiny_lm_config,
    )

    cfg = tiny_lm_config(vocab_size=96, compute_dtype="float32", max_context=64)
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    qp = jax.jit(quantize_params_int4)(params)

    blk, qblk = params["layers"][0], qp["layers"][0]
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        leaf = qblk[name]
        assert leaf["q4"].dtype == jnp.uint8
        w = np.asarray(blk[name], np.float32)
        deq = np.asarray(dequant_int4(leaf["q4"], leaf["d"], leaf["m"]))
        # max error bounded by half a grid step per 32-element group
        step = np.asarray(leaf["d"]).repeat(32, axis=0)
        assert np.all(np.abs(deq - w) <= 0.5 * step + 1e-7)
    assert qblk["attn_norm"].dtype == jnp.float32  # untouched
    assert "q" in qp["lm_head"]  # head stays int8 (Q4_K_M keeps it higher-precision)

    # idempotent: re-quantizing passes dict leaves through
    qp2 = quantize_params_int4(qp)
    np.testing.assert_array_equal(
        np.asarray(qp2["layers"][0]["wq"]["q4"]), np.asarray(qblk["wq"]["q4"])
    )


def test_qdot_int4_cpu_fallback_matches():
    """Off-TPU, qdot's int4 path takes the XLA dequant+dot formulation."""
    from realtime_codec_agent_tpu.ops.nn import qdot

    rng = np.random.default_rng(2)
    leaf = _rand_leaf(rng, 64, 96)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    got = np.asarray(qdot(x, leaf))
    want = np.asarray(
        jnp.dot(
            x,
            dequant_int4(leaf["q4"], leaf["d"], leaf["m"]).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fuse_composes_with_int4():
    """quantize-then-fuse equals fuse-then-quantize bitwise (per-column
    groups are independent, so concatenation on the output axis commutes
    with quantization)."""
    from realtime_codec_agent_tpu.models.llama import (
        fuse_lm_params_for_decode, init_lm_params, quantize_params_int4,
        tiny_lm_config,
    )

    cfg = tiny_lm_config(vocab_size=96, compute_dtype="float32", max_context=64)
    params = init_lm_params(jax.random.PRNGKey(1), cfg)
    a = fuse_lm_params_for_decode(quantize_params_int4(params))
    b = quantize_params_int4(fuse_lm_params_for_decode(params))
    for name in ("wqkv", "w_gu", "wo", "w_down"):
        for part in ("q4", "d", "m"):
            np.testing.assert_array_equal(
                np.asarray(a["layers"][0][name][part]),
                np.asarray(b["layers"][0][name][part]),
                err_msg=f"{name}.{part}",
            )


def test_int4_quantized_decode_close():
    """int4 decode weights keep logits close to full precision and run the
    whole engine surface (eval / sample / logprobs)."""
    import dataclasses

    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import (
        fuse_lm_params_for_decode, init_lm_params, quantize_params_int4,
        tiny_lm_config,
    )

    cfg = tiny_lm_config(vocab_size=128, compute_dtype="float32", max_context=128)
    params = init_lm_params(jax.random.PRNGKey(3), cfg)
    qparams = jax.jit(quantize_params_int4)(params)

    full = DuplexLMEngine(params, cfg, seed=1)
    quant = DuplexLMEngine(qparams, cfg, seed=1)
    ctx = list(range(10, 40))
    full.eval(ctx)
    quant.eval(ctx)
    lf = np.asarray(full.get_last_logits())
    lq = np.asarray(quant.get_last_logits())
    assert np.all(np.isfinite(lq))
    # int4 is lossy; logits stay in the same regime (tiny random weights)
    assert np.mean(np.abs(lf - lq)) < 0.25 * (np.std(lf) + 1e-6) + 0.25

    quant.init_sampler_for_generate(temp=0.0, seed=7)
    assert isinstance(quant.eval_and_sample([41]), int)
    lp = quant.get_logprobs([1, 2, 3], [4, 5])
    assert lp.shape == (2,) and np.all(np.isfinite(np.asarray(lp)))

    # composes with the fused decode layout
    fused = fuse_lm_params_for_decode(qparams)
    assert "q4" in fused["layers"][0]["wqkv"]
    fq = DuplexLMEngine(fused, cfg, seed=1)
    fq.eval(ctx)
    np.testing.assert_allclose(
        np.asarray(fq.get_last_logits()), lq, rtol=2e-4, atol=2e-4
    )


def test_tensor_parallel_inference_with_int4():
    """int4 params ({'q4','d','m'} leaves) shard for TP inference: the
    group-contiguous nibble packing keeps K-axis shard boundaries on whole
    groups, so TP tokens match the unsharded engine exactly."""
    from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
    from realtime_codec_agent_tpu.models.llama import (
        init_lm_params, quantize_params_int4, tiny_lm_config,
    )
    from realtime_codec_agent_tpu.parallel import make_mesh, shard_lm_for_inference

    cfg = tiny_lm_config(vocab_size=128, compute_dtype="float32", max_context=128)
    params = init_lm_params(jax.random.PRNGKey(7), cfg)
    qparams = jax.jit(quantize_params_int4)(params)

    ref = DuplexLMEngine(qparams, cfg, seed=3)
    ref.init_sampler_for_generate(temp=0.0, seed=3)
    ref.eval(list(range(2, 22)))
    ref_toks = [ref.eval_and_sample([int(t)]) for t in (22, 23)]

    mesh = make_mesh(dp=1, fsdp=1, tp=2)
    tp = DuplexLMEngine(qparams, cfg, seed=3)
    tp.init_sampler_for_generate(temp=0.0, seed=3)
    tp.params, tp._k, tp._v = shard_lm_for_inference(qparams, tp._k, tp._v, mesh)
    tp.eval(list(range(2, 22)))
    assert [tp.eval_and_sample([int(t)]) for t in (22, 23)] == ref_toks
