"""Qwen2-family LM support (beyond-parity breadth: the duplex LM is not
hard-wired to Llama-3.2 geometry).

Qwen2/Qwen2.5 differs from Llama only by q/k/v projection biases
(``DuplexLMConfig.attn_bias``), rope theta 1e6 and rms_eps 1e-6 — same
RMSNorm/SwiGLU/GQA graph. Verified here: numeric parity vs the HF torch
Qwen2ForCausalLM, decode == full forward with biases, the load-time QKV
fusion folding the biases, int8 quantization leaving them intact, GGUF
qwen2-arch ingestion, and an SPMD train step over the virtual mesh.
"""
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_codec_agent_tpu.lm.engine import DuplexLMEngine
from realtime_codec_agent_tpu.models import convert
from realtime_codec_agent_tpu.models.llama import (
    commit_kv,
    forward,
    forward_decode,
    fuse_lm_params_for_decode,
    init_lm_params,
    logits_from_hidden,
    quantize_params_int8,
    qwen25_config,
    tiny_lm_config,
)

VOCAB = 304
H, LAYERS, HEADS, KV, DH, FFN = 16, 2, 4, 2, 4, 32


def tiny_qwen_cfg(**overrides):
    return tiny_lm_config(
        vocab_size=VOCAB, attn_bias=True, rope_theta=1000000.0, rms_eps=1e-6,
        **overrides,
    )


@pytest.fixture(scope="module")
def hf_model_and_cfg():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=VOCAB,
        hidden_size=H,
        intermediate_size=FFN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=KV,
        max_position_embeddings=256,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        attention_dropout=0.0,
    )
    import torch

    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    return model, hf_cfg


def test_hf_config_detects_qwen2(hf_model_and_cfg):
    _, hf_cfg = hf_model_and_cfg
    d = hf_cfg.to_dict()
    assert d.get("model_type") == "qwen2"
    cfg = convert.hf_config_to_lm_config(d, max_context=128)
    assert cfg.attn_bias
    assert cfg.tie_embeddings
    assert cfg.rope_theta == 1000000.0
    assert cfg.rope_scaling is None


def test_hf_qwen2_logits_parity(hf_model_and_cfg):
    """Converted params reproduce the torch Qwen2 logits (f32)."""
    import torch

    model, hf_cfg = hf_model_and_cfg
    cfg = convert.hf_config_to_lm_config(
        hf_cfg.to_dict(), max_context=128, compute_dtype="float32"
    )
    params = convert.lm_params_from_hf(model.state_dict(), cfg, dtype=jnp.float32)
    # biases mapped per layer
    assert all("bq" in blk and "bk" in blk and "bv" in blk for blk in params["layers"])

    ids = np.random.default_rng(0).integers(0, VOCAB, size=(1, 17))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()[0]
    hidden, _ = forward(params, jnp.asarray(ids), cfg)
    ours = np.asarray(logits_from_hidden(params, hidden, cfg))[0]
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_qwen2_decode_matches_full_forward():
    """forward_decode (read-only cache) == full forward with biases active."""
    cfg = tiny_qwen_cfg(compute_dtype="float32")
    params = init_lm_params(jax.random.PRNGKey(1), cfg)
    # non-zero biases so the test actually exercises the add
    for blk in params["layers"]:
        for b in ("bq", "bk", "bv"):
            blk[b] = jax.random.normal(jax.random.PRNGKey(hash(b) % 97), blk[b].shape) * 0.1

    ids = np.random.default_rng(1).integers(0, VOCAB, size=(1, 12))
    full_hidden, _ = forward(params, jnp.asarray(ids), cfg)

    kv_shape = (cfg.num_layers, 1, 64, cfg.num_kv_heads, cfg.head_dim)
    k = jnp.zeros(kv_shape, jnp.float32)
    v = jnp.zeros(kv_shape, jnp.float32)
    h1, nk, nv = forward_decode(params, jnp.asarray(ids[:, :7]), cfg, k, v, jnp.arange(7))
    k, v = commit_kv(k, v, nk, nv, 0)
    h2, _, _ = forward_decode(params, jnp.asarray(ids[:, 7:]), cfg, k, v, 7 + jnp.arange(5))
    got = np.concatenate([np.asarray(h1), np.asarray(h2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full_hidden), rtol=1e-4, atol=1e-5)


def test_qwen2_fused_params_identical():
    """fuse_lm_params_for_decode folds bq|bk|bv into bqkv, output-identical."""
    cfg = tiny_qwen_cfg(compute_dtype="float32")
    params = init_lm_params(jax.random.PRNGKey(2), cfg)
    for blk in params["layers"]:
        for b in ("bq", "bk", "bv"):
            blk[b] = jax.random.normal(jax.random.PRNGKey(len(b)), blk[b].shape) * 0.1
    fused = fuse_lm_params_for_decode(params)
    assert all("bqkv" in blk and "bq" not in blk for blk in fused["layers"])

    ids = jnp.asarray(np.random.default_rng(2).integers(0, VOCAB, size=(1, 6)))
    kv_shape = (cfg.num_layers, 1, 32, cfg.num_kv_heads, cfg.head_dim)
    k = jnp.zeros(kv_shape, jnp.float32)
    v = jnp.zeros(kv_shape, jnp.float32)
    h_a, _, _ = forward_decode(params, ids, cfg, k, v, jnp.arange(6))
    h_b, _, _ = forward_decode(fused, ids, cfg, k, v, jnp.arange(6))
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), rtol=1e-6, atol=1e-6)


def test_qwen2_int8_keeps_biases_raw():
    cfg = tiny_qwen_cfg()
    params = fuse_lm_params_for_decode(init_lm_params(jax.random.PRNGKey(3), cfg))
    q = quantize_params_int8(params)
    blk = q["layers"][0]
    assert isinstance(blk["wqkv"], dict) and blk["wqkv"]["q"].dtype == jnp.int8
    assert not isinstance(blk["bqkv"], dict)  # biases stay dense


def test_qwen2_engine_generates():
    """The jitted decode engine runs the Qwen2-geometry config end-to-end
    (sampler chain, KV bookkeeping) — family support is engine-transparent."""
    cfg = tiny_qwen_cfg()
    params = init_lm_params(jax.random.PRNGKey(4), cfg)
    eng = DuplexLMEngine(params, cfg, seed=7)
    eng.init_sampler_for_generate(top_k=20, temp=1.0, seed=7)
    eng.eval([1, 2, 3])
    toks = [eng.eval_and_sample([int(t)]) for t in (4, 5, 6)]
    assert all(0 <= t < VOCAB for t in toks)


def test_qwen25_config_geometries():
    cfg = qwen25_config("0.5b", vocab_size=151936)
    assert (cfg.hidden_size, cfg.num_layers, cfg.num_kv_heads) == (896, 24, 2)
    assert cfg.attn_bias and cfg.tie_embeddings and cfg.rope_theta == 1000000.0
    cfg7 = qwen25_config("7b", vocab_size=152064)
    assert not cfg7.tie_embeddings and cfg7.num_heads == 28


def test_qwen2_train_step(tmp_path):
    """One SPMD train step over the dp2/fsdp2/tp2 virtual mesh with biases in
    the stacked scan-over-layers layout (specs filter to present keys)."""
    from realtime_codec_agent_tpu.parallel import default_mesh_shape, make_mesh
    from realtime_codec_agent_tpu.train import TrainConfig, Trainer, pad_batch

    mesh = make_mesh(**default_mesh_shape(8))
    cfg = tiny_qwen_cfg(codec_vocab_start=200, codebook_size=104)
    params = init_lm_params(jax.random.PRNGKey(5), cfg, with_codec_embed=True)
    tc = TrainConfig(output_dir=str(tmp_path), max_seq_len=64, max_steps=5, warmup_steps=1)
    tr = Trainer(params, cfg, tc, mesh=mesh)
    rng = np.random.default_rng(5)
    seqs = [list(rng.integers(1, VOCAB, size=60)) for _ in range(8)]
    batch, labels = pad_batch(seqs, 64, pad_id=0)
    bias_before = np.asarray(jax.device_get(tr.params["layers"]["bq"]))
    m1 = tr.train_batch(batch, labels)
    tr.train_batch(batch, labels)  # step 1: warmup done, lr > 0
    assert np.isfinite(m1["loss"])
    bias_after = np.asarray(jax.device_get(tr.params["layers"]["bq"]))
    assert not np.array_equal(bias_before, bias_after)  # biases train too


def test_qwen2_tp_inference_token_identity():
    """Tensor-parallel inference sharding accepts the bias leaves and stays
    token-identical to the single-device engine."""
    from realtime_codec_agent_tpu.parallel import make_mesh, shard_lm_for_inference

    cfg = tiny_qwen_cfg(compute_dtype="float32", max_context=128)
    params = init_lm_params(jax.random.PRNGKey(6), cfg)
    for blk in params["layers"]:
        for b in ("bq", "bk", "bv"):
            blk[b] = jax.random.normal(jax.random.PRNGKey(len(b)), blk[b].shape) * 0.1

    ref = DuplexLMEngine(params, cfg, seed=3)
    ref.init_sampler_for_generate(temp=0.0, seed=3)
    ref.eval(list(range(2, 22)))
    ref_toks = [ref.eval_and_sample([int(t)]) for t in (22, 23, 24)]

    mesh = make_mesh(dp=1, fsdp=1, tp=2)
    tp = DuplexLMEngine(params, cfg, seed=3)
    tp.init_sampler_for_generate(temp=0.0, seed=3)
    tp.params, tp._k, tp._v = shard_lm_for_inference(params, tp._k, tp._v, mesh)
    tp.eval(list(range(2, 22)))
    assert [tp.eval_and_sample([int(t)]) for t in (22, 23, 24)] == ref_toks
